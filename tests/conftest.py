"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip
shard_map paths are exercised without TPU hardware (SURVEY.md §4d), and
with x64 enabled so golden-EPE comparisons against the float64 NumPy
oracle are meaningful.
"""

import os

# Must be set before jax is imported anywhere. (JAX_PLATFORMS alone is
# overridden by the TPU platform plugin in this image; the config update
# below is what actually pins the CPU backend.)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Background bucket pre-warm threads would race pytest teardown and
# slow the suite with compiles of neighbor buckets no test requests;
# tests/test_streaming.py exercises the prewarm path synchronously.
os.environ.setdefault("TPUFLOW_NO_PREWARM", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


@pytest.fixture(scope="session")
def kitti_pair():
    """The M0 fixture pair (HornSchunckOF/main.cpp:42-43), grayscale f64."""
    from tpuflow.core.io import read_image

    left = REFERENCE / "HornSchunckOF/img/leftimage"
    prev, _ = read_image(left / "000050_10.png")
    nxt, _ = read_image(left / "000050_11.png")

    def to_gray(a):
        if a.ndim == 3:
            # OpenCV imread->BGR->GRAY BT.601 rounds to uint8.
            g = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
            return np.round(g).astype(np.float64)
        return a.astype(np.float64)

    return to_gray(prev), to_gray(nxt)


@pytest.fixture(scope="session")
def small_pair(kitti_pair):
    """A cropped pair for fast iteration-heavy tests."""
    p, n = kitti_pair
    return p[100:164, 300:380].copy(), n[100:164, 300:380].copy()
