"""A/B the BM integer-search evaluator precision on the real TPU.

The 61x61 search at KITTI res is FIELD-BUILD-bound, not MXU-bound —
which is why ``matmul_bf16`` (bf16 matmul inputs, f32 accumulation)
measures NEUTRAL: 0.240 (f32) vs 0.247 s/direction device rate after
the round-3 rework (zero-pad reads + hoisted cur-side moments shrank
the per-candidate matmul to 4 channels, erasing the brief 10.5% bf16
win the 7-channel rank-3 form had shown). An earlier 2.03x reading was
tunnel variance on end-to-end timings including ~11 MB of host<->device
transfers per call. This measures both evaluators at device rate
(pre-placed inputs, one-element fetch) and reports integer-winner
agreement on a motion-rich synthetic pair.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/r2_bm_bf16_ab.py
"""

from __future__ import annotations

import time

import numpy as np

KH, KW = 376, 1240


def main():
    import jax
    import jax.numpy as jnp

    import tpuflow  # noqa: F401  (persistent compile cache)
    from tpuflow.blockmatching import block_matching_labels
    from tpuflow.core.color import srgb_to_lab
    from tpuflow.segmentation import segment_meanshift

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.uniform(0, 255, (KH + 8, KW + 8, 3)),
                           (2, 2, 0))
    f1 = base[4:4 + KH, 2:2 + KW]
    f0 = base[:KH, :KW]
    lab1 = np.asarray(srgb_to_lab(jnp.asarray(f1 / 255.0, jnp.float32)))
    lab0 = np.asarray(srgb_to_lab(jnp.asarray(f0 / 255.0, jnp.float32)))
    seg = segment_meanshift(lab1, 20, 16.0 / 255.0)
    print(f"{seg.n_regions} regions", flush=True)

    from tpuflow.blockmatching.matcher import _match_device

    # Device rate: pre-place the frames, queue the search, fetch ONE
    # element (end-to-end block_matching_labels pays ~2x 5.6 MB frame
    # uploads + a 5.6 MB per-pixel fetch through the tunnel per call,
    # which swamps the evaluator difference).
    l1 = jax.device_put(jnp.asarray(lab1))
    l0 = jax.device_put(jnp.asarray(lab0))
    res = {}
    for method in ("matmul", "matmul_bf16"):
        uv, cost = _match_device(l1, l0, seg.labels, seg.n_regions, 61,
                                 1.0, 0.5, 2, 16, method)
        np.asarray(cost[0])
        t0 = time.perf_counter()
        uv, cost = _match_device(l1, l0, seg.labels, seg.n_regions, 61,
                                 1.0, 0.5, 2, 16, method)
        np.asarray(cost[0])
        dt = time.perf_counter() - t0
        print(f"{method}: {dt:.3f} s / direction (device rate)",
              flush=True)

        r = block_matching_labels(l1, l0, seg.labels, seg.n_regions, 61,
                                  subpixel_scale=2, method=method)
        res[method] = r

    agree = np.mean(np.all(res["matmul"].region_uv
                           == res["matmul_bf16"].region_uv, axis=-1))
    duv = np.abs(res["matmul"].region_uv - res["matmul_bf16"].region_uv)
    print(f"winner agreement: {agree * 100:.2f}% of regions; "
          f"max |duv| = {duv.max():.3f}, mean = {duv.mean():.4f}",
          flush=True)


if __name__ == "__main__":
    main()
