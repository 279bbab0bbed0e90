"""HS kernel tile-geometry sweep (VERDICT r4 #6 — the timeboxed
Mosaic-level experiment).

The benched config (tile 128x1024, fuse 10, two_stage) computes halo'd
(168, 1152) tiles: 18 tiles/sweep = 3.48 Mpx of VPU work against the
frame's 2.07 Mpx — 68% halo/pad overhead. The per-op probe says the
sweep runs near issue SOL at ~0.31 us/op, so the remaining lever is
WORK, not scheduling: full-width tiles (w = 1920 is already a lane-tile
multiple -> no column pad, one tile column -> one halo ring instead of
two) and exact-divisor tile heights cut the computed area by 15-34%.

Interleaved A/B at device rate (scanned frame loop), plus a value check
vs the jnp solver. Usage:
  env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/r5_hs_geometry_ab.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import _frames_1080p, _stack_pairs, timed_scan
    from tpuflow.kernels import horn_schunck_pallas

    print("devices:", jax.devices(), flush=True)
    prev, nxt = _frames_1080p()
    pairs = jnp.asarray(_stack_pairs(prev, nxt), jnp.float32)

    configs = {
        "base_128x1024_p": dict(tile_h=128, tile_w=1024, fuse=10,
                                pipelined=True, roll="two_stage"),
        "120x1920_p": dict(tile_h=120, tile_w=1920, fuse=10,
                           pipelined=True, roll="two_stage"),
        "360x1920_p": dict(tile_h=360, tile_w=1920, fuse=10,
                           pipelined=True, roll="two_stage"),
        # 544 (not 540): tile_h must be sublane-8-aligned or the HBM
        # tile slice (tile_h + 2*halo) breaks Mosaic's (8,128) tiling.
        "544x1920_p": dict(tile_h=544, tile_w=1920, fuse=10,
                           pipelined=True, roll="two_stage"),
        # A whole-frame (1080, 1920) single-tile config FAILS: after a
        # ~40 min remote Mosaic compile it exceeds VMEM — "Used 161.36M
        # of 128.00M ... Largest allocation 93.04M: register allocator
        # spill" — the same whole-frame-values spill that killed the
        # r1 resident formulations. The halo-overhead hypothesis is
        # carried by the full-width tiles above.
    }

    # Value check: two_stage is float-tolerance vs the solver (pairwise
    # box association) — the BENCH baseline config itself shows
    # ~2e-2 absolute on this ±100-range flow (~2e-4 relative), so the
    # gate is relative to the flow range, matching the existing
    # two_stage equivalence contract.
    from tpuflow.solvers import horn_schunck

    p = jnp.asarray(prev, jnp.float32)
    n = jnp.asarray(nxt, jnp.float32)
    u_ref, v_ref = horn_schunck(p, n, 5, 20, 1.0)
    rng_ref = float(jnp.abs(u_ref).max())
    ok = {}
    for name, cfg in configs.items():
        try:
            u, v = horn_schunck_pallas(p, n, 5, 20, 1.0, **cfg)
            d = max(float(jnp.abs(u - u_ref).max()),
                    float(jnp.abs(v - v_ref).max()))
            ok[name] = d < 5e-3 * rng_ref
            print(f"check {name}: max|d|={d:.2e} rel={d / rng_ref:.2e} "
                  f"ok={ok[name]}", flush=True)
        except Exception as e:
            ok[name] = False
            print(f"check {name}: FAILED {e!r}", flush=True)

    results = {k: [] for k in configs if ok.get(k)}
    for rep in range(3):
        for name in results:
            cfg = configs[name]
            dt = timed_scan(
                lambda a, b, cfg=cfg: horn_schunck_pallas(
                    a, b, 5, 100, 1.0, **cfg), pairs, windows=1)
            results[name].append(dt)
            print(f"rep {rep} {name}: {dt * 1e3:.2f} ms/frame", flush=True)
    for name, vals in results.items():
        print(f"{name}: best {min(vals) * 1e3:.2f} ms/frame "
              f"mean {np.mean(vals) * 1e3:.2f}", flush=True)


if __name__ == "__main__":
    main()
