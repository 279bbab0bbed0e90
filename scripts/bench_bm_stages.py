"""Integer-search vs subpixel split of the region BM matcher + mean-shift
filter/labeling timings (real TPU, KITTI res).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_bm_stages.py
"""
from __future__ import annotations

import time

import numpy as np

KH, KW = 376, 1240


def main():
    import jax
    import jax.numpy as jnp

    from tpuflow.blockmatching import block_matching_labels
    from tpuflow.core.color import srgb_to_lab
    from tpuflow.segmentation import segment_meanshift
    from tpuflow.segmentation.meanshift import mean_shift_filter, _merge_labels

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.uniform(0, 255, (KH + 8, KW + 8, 3)),
                           (2, 2, 0))
    f0 = base[:KH, :KW]
    f1 = base[4 : 4 + KH, 2 : 2 + KW]
    lab0 = np.asarray(srgb_to_lab(jnp.asarray(f0 / 255.0, jnp.float32)))
    lab1 = np.asarray(srgb_to_lab(jnp.asarray(f1 / 255.0, jnp.float32)))

    # Mean-shift: filter vs labeling.
    pos, col = mean_shift_filter(jnp.asarray(lab1), 20, 16.0 / 255.0)
    np.asarray(pos)
    t0 = time.perf_counter()
    pos, col = mean_shift_filter(jnp.asarray(lab1), 20, 16.0 / 255.0)
    pos_np, col_np = np.asarray(pos), np.asarray(col)
    print(f"mean-shift filter (device, warm): "
          f"{time.perf_counter() - t0:.2f} s", flush=True)
    t0 = time.perf_counter()
    labels, n = _merge_labels(pos_np, col_np, 20.0, 16.0 / 255.0, 16)
    print(f"labeling (host): {time.perf_counter() - t0:.2f} s, "
          f"{n} regions", flush=True)

    seg = segment_meanshift(lab1, 20, 16.0 / 255.0)
    for sub in (1, 2):
        r = block_matching_labels(lab1, lab0, seg.labels, seg.n_regions,
                                  61, subpixel_scale=sub)
        t0 = time.perf_counter()
        r = block_matching_labels(lab1, lab0, seg.labels, seg.n_regions,
                                  61, subpixel_scale=sub)
        print(f"search 61x61 subpixel={sub}: "
              f"{time.perf_counter() - t0:.2f} s", flush=True)


if __name__ == "__main__":
    main()
