"""Isolate _warp_tiled vs _bilinear_all on realistic large-motion flow.

The large-motion bench measured the tiled warp SLOWER than the plain
gather (3.3 vs 3.7 fps end-to-end) — this probe times the warps alone
at 1080p and dissects where the time goes (all-smooth flow, mixed
flow, all-fallback flow), including whether the per-tile lax.cond
actually branches or executes both sides.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r5_warp_probe.py
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

    from scipy.ndimage import gaussian_filter as gf

    from tpuflow.solvers.farneback import (
        _bilinear_all,
        _pack_bilinear,
        _warp_dense,
        _warp_tiled,
    )

    print("devices:", jax.devices(), flush=True)
    h, w = 1080, 1920
    rng = np.random.default_rng(3)
    fields = [jnp.asarray(gf(rng.normal(0, 1, (h, w)), 2)
                          .astype(np.float32)) for _ in range(5)]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]

    flows = {
        "smooth_pan24": (
            jnp.full((h, w), -24.0, jnp.float32)
            + jnp.asarray(gf(rng.normal(0, 1, (h, w)), 32) * 1.5,
                          jnp.float32),
            jnp.asarray(gf(rng.normal(0, 1, (h, w)), 32) * 1.5,
                        jnp.float32)),
        "mixed_block": (None, None),  # built below
        "all_fallback": (
            jnp.asarray(rng.uniform(-30, 30, (h, w)).astype(np.float32)),
            jnp.asarray(rng.uniform(-30, 30, (h, w)).astype(np.float32))),
    }
    u_m = np.full((h, w), -24.0, np.float32)
    v_m = np.zeros((h, w), np.float32)
    u_m[400:700, 300:800] = 10.0
    v_m[400:700, 300:800] = 8.0
    u_m = gf(u_m, 8)
    v_m = gf(v_m, 8)
    flows["mixed_block"] = (jnp.asarray(u_m), jnp.asarray(v_m))

    @jax.jit
    def run_gather(u, v, F0, *Fs):
        packed = _pack_bilinear((F0,) + Fs)
        out = _bilinear_all((F0,) + Fs, xs + u, ys + v, packed=packed)
        return sum(jnp.sum(o) for o in out)

    @jax.jit
    def run_tiled(u, v, F0, *Fs):
        packed = _pack_bilinear((F0,) + Fs)
        out = _warp_tiled((F0,) + Fs, u, v, packed)
        return sum(jnp.sum(o) for o in out)

    @jax.jit
    def run_dense4(u, v, F0, *Fs):
        out = _warp_dense((F0,) + Fs, jnp.clip(u, -4, 4),
                          jnp.clip(v, -4, 4), 4)
        return sum(jnp.sum(o) for o in out)

    def timeit(f, u, v, reps=10):
        float(f(u, v, *fields))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(u, v, *fields)
            float(out)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    for name, (u, v) in flows.items():
        tg = timeit(run_gather, u, v)
        tt = timeit(run_tiled, u, v)
        print(f"{name}: gather {tg:.1f} ms  tiled {tt:.1f} ms", flush=True)
    td = timeit(run_dense4, *flows["smooth_pan24"])
    print(f"dense D=4 reference: {td:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
