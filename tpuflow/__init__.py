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


def _enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a per-user directory.

    Measured on the axon-tunneled v5e: remote kernel compiles cost
    seconds-to-minutes per process and the in-memory jit cache dies with
    the process; with the on-disk cache a second process reuses the
    executable (~0.9 s vs 4.5 s for one HS kernel, and the flagship
    driver's 20-40 s first-frame compiles disappear entirely).
    Opt out with TPUFLOW_NO_COMPILE_CACHE=1; an explicit user setting of
    jax_compilation_cache_dir wins.
    """
    import os

    if os.environ.get("TPUFLOW_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if (jax.config.jax_compilation_cache_dir
                or os.environ.get("JAX_COMPILATION_CACHE_DIR")):
            return  # user already configured one
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "tpuflow_jax")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from tpuflow.core import borders, color, config, io  # noqa: F401
