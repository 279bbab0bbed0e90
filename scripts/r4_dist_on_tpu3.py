"""Round-4 real-silicon validation, part 3: the remaining dist programs.

scripts/r4_dist_on_tpu.py proved the sharded flagship (mean-shift +
search + gated refine), the fused IRLS tile body and the sharded BA
pyramid on hardware; the weak-scaling bench row covers fused HS. This
closes the rest of VERDICT r3 weak #1's never-on-silicon list on a
1-device mesh:

- farneback_sharded, 1-level streaming config at 640x480 AND 2-level —
  the Pallas FB tile bodies (poly expansion, separable conv, blur+solve)
  get their first Mosaic compile on hardware;
- gaussian_filter_sharded / epsilon_filter_sharded /
  horizontal_median_sharded (the L1 ops' halo'd tile bodies);
- hog_matching_sharded;
- detect_scratch_sharded.

Each phase prints a JSON line with compile/steady seconds + a finite
check, flushing as it goes.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r4_dist_on_tpu3.py
"""

from __future__ import annotations

import json
import time
import traceback

import numpy as np


def emit(**kw):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def phase(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn() or {}
        emit(phase=name, ok=True, total_s=time.perf_counter() - t0, **out)
    except Exception as e:
        traceback.print_exc()
        emit(phase=name, ok=False, error=f"{type(e).__name__}: {e}",
             total_s=time.perf_counter() - t0)


def timed2(first, again):
    t0 = time.perf_counter()
    out = first()
    np.asarray(out).ravel()[:1]
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = again()
    np.asarray(out).ravel()[:1]
    return {"compile_s": compile_s,
            "steady_s": time.perf_counter() - t0,
            "finite": bool(np.isfinite(np.asarray(out)).all())}


def main():
    import jax
    import jax.numpy as jnp

    from tpuflow.dist.mesh import make_mesh

    emit(phase="probe", devices=[str(d) for d in jax.devices()])
    mesh = make_mesh(1)
    rng = np.random.default_rng(0)

    from scipy.ndimage import gaussian_filter as gf

    base = gf(rng.uniform(0, 255, (488, 648)), 3.0).astype(np.float32)
    prev = base[:480, :640]
    nxt = base[2:482, 1:641]

    def fb1():
        from tpuflow.dist.farneback import farneback_sharded

        def run():
            u, v = farneback_sharded(prev, nxt, mesh, 0.4, 1, 48, 2, 8,
                                     1.2)
            return u[:1, :1]

        return timed2(run, run)

    phase("farneback_sharded_stream_640x480", fb1)

    def fb2():
        from tpuflow.dist.farneback import farneback_sharded

        def run():
            u, v = farneback_sharded(prev, nxt, mesh, 0.5, 2, 15, 3, 5,
                                     1.2)
            return u[:1, :1]

        return timed2(run, run)

    phase("farneback_sharded_2level_640x480", fb2)

    img = jnp.asarray(base[:480, :640])

    def gauss():
        from tpuflow.dist.ops import gaussian_filter_sharded

        def run():
            return gaussian_filter_sharded(img, (21, 21), 5.0,
                                           mesh)[:1, :1]

        return timed2(run, run)

    phase("gaussian_filter_sharded", gauss)

    def eps():
        from tpuflow.dist.ops import epsilon_filter_sharded

        def run():
            return epsilon_filter_sharded(img, (21, 21), 20.0,
                                          mesh)[:1, :1]

        return timed2(run, run)

    phase("epsilon_filter_sharded", eps)

    def hmed():
        from tpuflow.dist.ops import horizontal_median_sharded

        def run():
            return horizontal_median_sharded(img, 3, mesh)[:1, :1]

        return timed2(run, run)

    phase("horizontal_median_sharded", hmed)

    def scratch():
        from tpuflow.dist.ops import detect_scratch_sharded

        def run():
            return detect_scratch_sharded(img, mesh)[0][:1, :1]

        return timed2(run, run)

    phase("detect_scratch_sharded", scratch)

    def hog():
        from tpuflow.dist.ops import hog_matching_sharded

        # (H, W, bins) feature grids, as the single-chip hog_matching
        # consumes them (HOG_match.cpp:9-75 takes HOG cell grids).
        f1 = jnp.asarray(gf(rng.uniform(0, 1, (60, 80, 8)),
                            (1, 1, 0)).astype(np.float32))
        f2 = jnp.roll(f1, (1, 2), axis=(0, 1))

        def run():
            u, v, s = hog_matching_sharded(f1, f2, mesh)
            return np.asarray(u)[:1, :1]

        return timed2(run, run)

    phase("hog_matching_sharded", hog)


if __name__ == "__main__":
    main()
