"""Interleaved A/B: Farneback exact large-motion warp, tiled vs gather.

VERDICT r4 #3 measurement: the multi-level demo3 config at 1080p on a
genuinely large-motion input (16-px pan + counter-moving block, flow
beyond the dense-warp bound at every level) with tiled_warp on/off.
Device-rate timing (frame loop scanned on device, bench.timed_scan).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r5_fb_largemotion_ab.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import H, W, _multioctave_frames, _stack_pairs, timed_scan
    from tpuflow.solvers import calc_optical_flow_farneback

    print("devices:", jax.devices(), flush=True)
    base = _multioctave_frames(16)
    prev = base[:, :W].copy()
    nxt = base[:, 16 : 16 + W].copy()
    nxt[400:700, 300:800] = prev[392:692, 310:810]
    cfg = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
               poly_n=5, poly_sigma=1.2, flags=0)
    pairs = jnp.asarray(_stack_pairs(prev, nxt, b=5), jnp.float32)

    def run(tiled):
        return timed_scan(
            lambda a, b: calc_optical_flow_farneback(
                a, b, None, tiled_warp=tiled, **cfg), pairs)

    # Interleave A/B windows against tunnel variance.
    results = {"tiled": [], "gather": []}
    for rep in range(3):
        for name, tiled in (("tiled", True), ("gather", False)):
            dt = run(tiled)
            results[name].append(dt)
            print(f"rep {rep} {name}: {dt * 1e3:.1f} ms/frame "
                  f"({1 / dt:.2f} fps)", flush=True)
    for name, vals in results.items():
        print(f"{name}: best {min(vals) * 1e3:.1f} ms/frame "
              f"({1 / min(vals):.2f} fps)", flush=True)

    # Flow agreement spot check (in-bounds queries; ulp-level expected).
    ug, vg = calc_optical_flow_farneback(
        jnp.asarray(prev, jnp.float32), jnp.asarray(nxt, jnp.float32),
        None, tiled_warp=False, **cfg)
    ut, vt = calc_optical_flow_farneback(
        jnp.asarray(prev, jnp.float32), jnp.asarray(nxt, jnp.float32),
        None, tiled_warp=True, **cfg)
    print("max |du|:", float(jnp.abs(ug - ut).max()),
          "max |dv|:", float(jnp.abs(vg - vt).max()),
          "median u (true -16):", float(jnp.median(ut)), flush=True)


if __name__ == "__main__":
    main()
