"""Result writers composing flow-file output + compensated-image output.

Parity with the reference's ``MultipleMotion_write`` overloads
(``OpticalFlow/OpticalFlow.cpp:381-490``, gray + RGB): the flow binary in
the reference format next to a ``compensated_<name>`` PGM/PPM built by
motion compensation, and ``MultipleMotion_Affine_write`` (6-coefficient
text, ``Affine_MultipleMotion.cpp:243-270``).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from tpuflow.core.io import write_affine, write_flow, write_pnm
from tpuflow.pipeline.motion_compensation import compensate


def write_flow_with_compensated(
    filename: str | Path,
    next_img,
    u,
    v,
    maxval: int = 255,
    method: str = "nearest",
) -> Path:
    """Write the flow binary and ``compensated_<name>`` PGM/PPM beside it."""
    filename = Path(filename)
    write_flow(filename, np.asarray(u), np.asarray(v))
    comp = compensate(jnp.asarray(next_img), jnp.asarray(u), jnp.asarray(v),
                      method=method)
    comp_path = filename.parent / f"compensated_{filename.name}"
    arr = np.asarray(comp)
    # Float images are assumed already in [0, maxval] intensity units.
    write_pnm(comp_path.with_suffix(".pgm" if arr.ndim == 2 else ".ppm"),
              arr, maxval=maxval)
    return comp_path


def write_affine_params(filename: str | Path, a) -> None:
    write_affine(filename, np.asarray(a))
