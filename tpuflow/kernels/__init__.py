"""Pallas TPU kernels for the hot stencil loops.

The reference's only parallelism is OpenMP ``parallel for`` over pixel
sites inside Jacobi-style sweeps (SURVEY.md §2.6). On TPU those sweeps are
HBM-bandwidth-bound when expressed as one XLA op per iteration: every
iteration re-reads u, v and the gradient fields from HBM. The kernels here
fuse K iterations per HBM round-trip using overlapped tiling: each grid
step DMAs a (tile + K*r halo) block into VMEM, runs K shrinking stencil
sweeps entirely on-chip, and writes back the exact tile — cutting HBM
traffic by ~K while preserving bit-level Jacobi semantics (the halo is
deep enough that no stale value is ever read).
"""

from tpuflow.kernels.hs_stencil import (  # noqa: F401
    horn_schunck_pallas,
    horn_schunck_pallas_resident,
    horn_schunck_pallas_resident2,
    hs_tile_sweeps,
)
from tpuflow.kernels.irls_stencil import (  # noqa: F401
    irls_gated_sweep_pallas,
    irls_sweep_pallas,
    irls_tile_sweeps,
)
from tpuflow.kernels.ms_filter import mean_shift_filter_pallas  # noqa: F401
from tpuflow.kernels.sepconv import sep_conv2d_valid_pallas  # noqa: F401
