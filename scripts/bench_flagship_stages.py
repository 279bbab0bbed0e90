"""Flagship BM-flow per-stage profile at KITTI res on the real TPU.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_flagship_stages.py
"""

from __future__ import annotations

import time

import numpy as np

KH, KW = 376, 1240


def main():
    import jax
    import jax.numpy as jnp

    from tpuflow.blockmatching import block_matching_bidirectional
    from tpuflow.core.color import srgb_to_lab
    from tpuflow.segmentation import segment_meanshift
    from tpuflow.segmentation.meanshift import (
        _merge_labels,
        mean_shift_filter,
    )
    from tpuflow.solvers.bm_flow import gradient_method_flow

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.uniform(0, 255, (KH + 8, KW + 8, 3)),
                           (2, 2, 0))
    f0 = base[:KH, :KW]
    f1 = base[4 : 4 + KH, 2 : 2 + KW]
    f2 = np.roll(f1, 2, axis=1)

    labs = []
    for f in (f0, f1, f2):
        labs.append(np.asarray(
            srgb_to_lab(jnp.asarray(f / 255.0, jnp.float32))))

    # warm + time the filter alone
    pos, col = mean_shift_filter(jnp.asarray(labs[1]), 20, 16.0 / 255.0)
    jax.block_until_ready((pos, col))
    t0 = time.perf_counter()
    pos, col = mean_shift_filter(jnp.asarray(labs[1]), 20, 16.0 / 255.0)
    jax.block_until_ready((pos, col))
    pos = np.asarray(pos)
    col = np.asarray(col)
    print(f"mean-shift filter (device): {time.perf_counter() - t0:.2f} s",
          flush=True)
    t0 = time.perf_counter()
    labels, n = _merge_labels(pos, col, 20.0, 16.0 / 255.0, 16)
    print(f"labeling (host): {time.perf_counter() - t0:.2f} s, "
          f"{n} regions", flush=True)

    seg = segment_meanshift(labs[1], 20, 16.0 / 255.0)

    # BM bidirectional (already compiled from warmers inside? compile once)
    r_prev, r_next, t = block_matching_bidirectional(
        labs[1], labs[0], labs[2], seg.labels, seg.n_regions, 61,
        subpixel_scale=2)
    t0 = time.perf_counter()
    r_prev, r_next, t = block_matching_bidirectional(
        labs[1], labs[0], labs[2], seg.labels, seg.n_regions, 61,
        subpixel_scale=2)
    print(f"BM bidirectional (2 searches): {time.perf_counter() - t0:.2f} s",
          flush=True)

    zeros = jnp.zeros((KH, KW), jnp.float32)
    labels_j = jnp.asarray(seg.labels)
    out = gradient_method_flow(jnp.asarray(labs[0]), jnp.asarray(labs[1]),
                               zeros, zeros, labels_j, iter_max=2048,
                               error_min_threshold=1e-6)
    jax.block_until_ready(out[:2] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    out = gradient_method_flow(jnp.asarray(labs[0]), jnp.asarray(labs[1]),
                               zeros, zeros, labels_j, iter_max=2048,
                               error_min_threshold=1e-6)
    jax.block_until_ready(out[:2] if isinstance(out, tuple) else out)
    print(f"gradient-method refine (one direction): "
          f"{time.perf_counter() - t0:.2f} s", flush=True)

    from tpuflow.solvers.bm_flow import _quantize_colors

    t0 = time.perf_counter()
    q = _quantize_colors(np.asarray(f1) / 255.0, seg)
    print(f"quantize (host): {time.perf_counter() - t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
