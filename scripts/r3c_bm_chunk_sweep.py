"""Chunk-size sweep for the fused bidirectional BM search (real TPU).

The matmul evaluator reads the strip one-hot L (P x n_regions f32,
~61 MB at KITTI res / 384-region bucket) once per candidate CHUNK, so a
wider chunk amortizes that traffic — at the cost of a larger
materialized field block F (CH x P x 8 f32) per matmul. This measures
the fused bidi program the flagship dispatches at CH in {64, 128, 256}
at device rate (pre-placed operands, one-element fetch) and checks the
costs are bitwise chunk-invariant (the per-channel dot products don't
depend on the chunking).

Measured (v5e via axon, 346 regions / 384 bucket, 61x61 + x2 subpixel):
CH=64 0.391 s | CH=128 0.488 s | CH=256 0.905 s fused-bidi device rate,
outputs bitwise chunk-invariant. WIDER LOSES: the CH x P x 8 f32 field
block's HBM write+read grows linearly with CH and swamps the one-hot
amortization — the default chunk=64 stands.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/r3c_bm_chunk_sweep.py
"""

from __future__ import annotations

import time

import numpy as np

KH, KW = 376, 1240


def main():
    import jax
    import jax.numpy as jnp

    import tpuflow  # noqa: F401  (persistent compile cache)
    from tpuflow.blockmatching.matcher import (
        _match_two_directions,
        region_bucket,
        region_reduction_plan,
        pad_region_bounds,
    )
    from tpuflow.core.color import srgb_to_lab
    from tpuflow.segmentation import segment_meanshift

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.uniform(0, 255, (KH + 8, KW + 8, 3)),
                           (2, 2, 0))
    f1 = base[4:4 + KH, 2:2 + KW]
    f0 = base[:KH, :KW]
    f2 = base[8:8 + KH, 4:4 + KW]
    lab1 = np.asarray(srgb_to_lab(jnp.asarray(f1 / 255.0, jnp.float32)))
    lab0 = np.asarray(srgb_to_lab(jnp.asarray(f0 / 255.0, jnp.float32)))
    lab2 = np.asarray(srgb_to_lab(jnp.asarray(f2 / 255.0, jnp.float32)))
    seg = segment_meanshift(lab1, 20, 16.0 / 255.0)
    n_bucket = region_bucket(seg.n_regions)
    perm, bounds = region_reduction_plan(seg.labels, seg.n_regions)
    bounds = pad_region_bounds(bounds, n_bucket)
    print(f"{seg.n_regions} regions (bucket {n_bucket})", flush=True)

    l1 = jax.device_put(jnp.asarray(lab1))
    l0 = jax.device_put(jnp.asarray(lab0))
    l2 = jax.device_put(jnp.asarray(lab2))
    perm_d = jax.device_put(jnp.asarray(perm))
    bounds_d = jax.device_put(jnp.asarray(bounds))

    outs = {}
    for ch in (64, 128, 256):
        def run():
            return _match_two_directions(
                l1, l0, l2, jnp.asarray(seg.labels), perm_d, bounds_d,
                n_bucket, 61, 2, 1.0, 0.5, chunk=ch)
        t0 = time.perf_counter()
        (uvp, cp), (uvn, cn) = run()
        np.asarray(cp[0])
        print(f"CH={ch} compile+run: {time.perf_counter()-t0:.1f} s",
              flush=True)
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            (uvp, cp), (uvn, cn) = run()
            np.asarray(cp[0])
            best = min(best, time.perf_counter() - t0)
        outs[ch] = (np.asarray(uvp), np.asarray(cp), np.asarray(uvn),
                    np.asarray(cn))
        print(f"CH={ch}: {best:.3f} s fused bidi (device rate)", flush=True)

    for ch in (128, 256):
        same = all((a == b).all() for a, b in zip(outs[64], outs[ch]))
        print(f"CH={ch} bitwise == CH=64: {same}", flush=True)


if __name__ == "__main__":
    main()
