"""Flagship BM-flow stage timings on the real TPU at KITTI res.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_bm.py [chunks...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

KH, KW = 376, 1240


def main():
    import jax
    import jax.numpy as jnp

    from tpuflow.blockmatching import block_matching_labels
    from tpuflow.core.color import srgb_to_lab
    from tpuflow.segmentation import segment_meanshift
    from tpuflow.solvers.bm_flow import optical_flow_block_matching

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.uniform(0, 255, (KH + 8, KW + 8, 3)),
                           (2, 2, 0))
    f0 = base[:KH, :KW]
    f1 = base[4 : 4 + KH, 2 : 2 + KW]

    lab0 = np.asarray(srgb_to_lab(jnp.asarray(f0 / 255.0, jnp.float32)))
    lab1 = np.asarray(srgb_to_lab(jnp.asarray(f1 / 255.0, jnp.float32)))

    t0 = time.perf_counter()
    seg = segment_meanshift(lab1, 20, 16.0 / 255.0)
    t_seg = time.perf_counter() - t0
    print(f"mean-shift(+labels): {t_seg:.2f} s, {seg.n_regions} regions",
          flush=True)

    chunks = [int(c) for c in sys.argv[1:]] or [16, 32]
    for ch in chunks:
        r = block_matching_labels(lab1, lab0, seg.labels, seg.n_regions,
                                  61, subpixel_scale=2, chunk=ch)
        t0 = time.perf_counter()
        r = block_matching_labels(lab1, lab0, seg.labels, seg.n_regions,
                                  61, subpixel_scale=2, chunk=ch)
        print(f"search 61x61 + subpixel (chunk {ch}): "
              f"{time.perf_counter() - t0:.2f} s", flush=True)

    # Full driver: first pair (compile-heavy), then steady state.
    f2 = np.roll(f1, 2, axis=1)
    t0 = time.perf_counter()
    out, state = optical_flow_block_matching(f0, f1, 255.0, iter_max=2048)
    print(f"flagship first pair: {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    out, state = optical_flow_block_matching(f1, f2, 255.0, iter_max=2048,
                                             state=state)
    out, state = optical_flow_block_matching(f2, f0, 255.0, iter_max=2048,
                                             state=state)
    print(f"flagship steady state: {(time.perf_counter() - t0) / 2:.2f} "
          "s/frame-pair", flush=True)


if __name__ == "__main__":
    main()
