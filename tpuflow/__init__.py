"""tpuflow — a TPU-native dense optical-flow framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
liuyang9609/Cpp-Optical-Flow (C++/OpenCV/OpenMP): dense variational flow
(Horn-Schunck, Black-Anandan robust IRLS), pyramidal Lucas-Kanade,
Farneback polynomial-expansion flow, segmentation-based block matching,
HOG features + matching, film-scratch detection via a-contrario meaningful
alignments, and the surrounding pipeline (streaming, warm start, motion
compensation, visualization, CLI).

Design: images are plain (H, W) or (H, W, C) jnp arrays (x = column,
y = row, matching the reference convention), all compute paths are
jit/vmap-able, hot stencil loops are Pallas TPU kernels, and multi-chip
scaling is 2-D image-domain tiling via shard_map + halo exchange
(lax.ppermute) instead of the reference's OpenMP threading.
"""

__version__ = "0.1.0"

from tpuflow.core import borders, color, config, io  # noqa: F401
