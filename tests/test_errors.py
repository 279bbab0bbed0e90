"""Structured error taxonomy (lib/Class.h ERROR parity)."""

import io
import json

import pytest


def test_error_message_shape():
    from tpuflow.core.errors import FileReadError, FunctionFailError

    e = FunctionFailError("OpticalFlow", value="u", detail="failed")
    assert "*** OpticalFlow error" in str(e)
    assert "value (u)" in str(e)
    e2 = FileReadError("read_pnm", file="/no/such.pgm")
    assert "file '/no/such.pgm'" in str(e2)


def test_error_emits_telemetry():
    from tpuflow.core.errors import ValueIncorrectError
    from tpuflow.utils.telemetry import Telemetry, set_telemetry

    buf = io.StringIO()
    set_telemetry(Telemetry(stream=buf, enabled=True))
    try:
        ValueIncorrectError("Pyramider", value="max_level")
    finally:
        set_telemetry(Telemetry(enabled=False))
    rec = json.loads(buf.getvalue())
    assert rec["event"] == "error"
    assert rec["kind"] == "value_incorrect"
    assert rec["function"] == "Pyramider"


def test_demo_cli_entry(tmp_path):
    import numpy as np

    from tpuflow.core.io import write_pnm
    from tpuflow.pipeline.demos import main

    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter as gf

    base = gf(rng.uniform(0, 255, (100, 140)), 2)
    write_pnm(tmp_path / "a.pgm", base[:, :-2].astype(np.uint8))
    write_pnm(tmp_path / "b.pgm", base[:, 2:].astype(np.uint8))
    rc = main(["fb", str(tmp_path / "a.pgm"), str(tmp_path / "b.pgm"),
               str(tmp_path) + "/"])
    assert rc == 0
    assert (tmp_path / "Farneback-64.png").exists()
