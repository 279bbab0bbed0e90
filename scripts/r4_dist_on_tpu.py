"""Round-4 real-silicon validation of the distributed programs (VERDICT r3 #1).

Every dist/ program except fused HS had only ever executed on the
virtual CPU mesh. This script runs, on the actual (tunneled) TPU with a
1-device mesh:

1. the UNsharded flagship driver on real corpus frames (reference point),
2. the SHARDED flagship driver (mesh=make_mesh(1)) — sharded-vs-unsharded
   overhead,
3. irls_level_sharded_fused at KITTI res (the fused shard_map+Pallas
   composition, level-0 parameters so the pyramid below reuses the
   compiled program),
4. the full sharded Black-Anandan pyramid (optical_flow_pyramid_sharded,
   fuse=16),
5. one FULL-reference-budget single-device BA solve
   ((level+1)*10*max(W,H) iters/level, OpticalFlow.cpp:131) for
   BASELINE.md (VERDICT r3 #6).

Each phase prints one JSON line (compile seconds + steady seconds) and
flushes, so partial results survive a tunnel drop.
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
        out = fn()
        out = out or {}
        emit(phase=name, ok=True,
             total_s=time.perf_counter() - t0, **out)
    except Exception as e:
        traceback.print_exc()
        emit(phase=name, ok=False, error=f"{type(e).__name__}: {e}",
             total_s=time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from tpuflow.dist.mesh import make_mesh

    emit(phase="probe", devices=[str(d) for d in jax.devices()],
         backend=jax.default_backend())
    mesh = make_mesh(1)

    def flagship_unsharded():
        spf, _ = bench.bench_bm_flagship(with_baseline=False)
        return {"spf": spf}

    def flagship_sharded():
        spf, _ = bench.bench_bm_flagship(mesh=mesh, with_baseline=False)
        return {"spf": spf}

    phase("flagship_unsharded_real_frames", flagship_unsharded)
    phase("flagship_sharded_1dev_real_frames", flagship_sharded)

    # --- irls_level_sharded_fused at KITTI res, level-0 parameters ---
    from tpuflow.core.config import MultipleMotionParam
    from tpuflow.solvers.black_anandan import (
        LAMBDA_D,
        LAMBDA_S,
        SIGMA_D_L0,
        SIGMA_S_L0,
    )
    from tpuflow.dist.solvers import irls_level_sharded_fused

    param = MultipleMotionParam(level=5)
    emt = param.error_min_threshold
    prev, nxt = bench._frames_kitti()
    rng = np.random.default_rng(5)
    gx = jnp.asarray(rng.normal(size=prev.shape), jnp.float32)
    gy = jnp.asarray(rng.normal(size=prev.shape), jnp.float32)
    it = jnp.asarray(0.1 * rng.normal(size=prev.shape), jnp.float32)
    z = jnp.zeros_like(gx)

    def irls_fused():
        t0 = time.perf_counter()
        u, v = irls_level_sharded_fused(
            z, z, gx, gy, it, mesh, LAMBDA_D, LAMBDA_S,
            SIGMA_D_L0, SIGMA_S_L0, 512, emt, True, fuse=16)
        np.asarray(u[:1, :1])
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                u, v = irls_level_sharded_fused(
                    z, z, gx, gy, it, mesh, LAMBDA_D, LAMBDA_S,
                    SIGMA_D_L0, SIGMA_S_L0, 512, emt, True, fuse=16)
            np.asarray(u[:1, :1])
            best = min(best, (time.perf_counter() - t0) / 4)
        return {"compile_s": compile_s, "steady_s_512iter": best,
                "finite": bool(np.isfinite(np.asarray(u)).all())}

    phase("irls_level_sharded_fused_kitti", irls_fused)

    # --- full sharded BA pyramid (4 more fused-program compiles) ---
    from tpuflow.dist.pyramid import optical_flow_pyramid_sharded

    p32 = jnp.asarray(prev, jnp.float32)
    n32 = jnp.asarray(nxt, jnp.float32)

    def pyramid_sharded():
        t0 = time.perf_counter()
        u, v = optical_flow_pyramid_sharded(
            p32, n32, mesh, 255.0, param, iter_max=512, fuse=16)
        np.asarray(u[:1, :1])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        u, v = optical_flow_pyramid_sharded(
            p32, n32, mesh, 255.0, param, iter_max=512, fuse=16)
        np.asarray(u[:1, :1])
        steady = time.perf_counter() - t0
        return {"compile_s": compile_s, "steady_s": steady,
                "finite": bool(np.isfinite(np.asarray(u)).all())}

    phase("ba_pyramid_sharded_kitti", pyramid_sharded)

    # --- single-device comparison + FULL reference budget ---
    from tpuflow.solvers.black_anandan_fast import optical_flow_pyramid_fast

    def ba_single_512():
        t0 = time.perf_counter()
        u, v, *_ = optical_flow_pyramid_fast(
            p32, n32, 255.0, param, iter_max=512, fuse=16)
        np.asarray(u[:1, :1])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        u, v, *_ = optical_flow_pyramid_fast(
            p32, n32, 255.0, param, iter_max=512, fuse=16)
        np.asarray(u[:1, :1])
        return {"compile_s": compile_s,
                "steady_s": time.perf_counter() - t0}

    phase("ba_pyramid_single_device_512", ba_single_512)

    def ba_full_budget():
        t0 = time.perf_counter()
        u, v, *_ = optical_flow_pyramid_fast(
            p32, n32, 255.0, param, iter_max=-1, fuse=16)
        np.asarray(u[:1, :1])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        u, v, *_ = optical_flow_pyramid_fast(
            p32, n32, 255.0, param, iter_max=-1, fuse=16)
        np.asarray(u[:1, :1])
        return {"compile_s": compile_s,
                "steady_s": time.perf_counter() - t0,
                "budget_l0": 10 * max(prev.shape)}

    phase("ba_full_reference_budget_single_device", ba_full_budget)


if __name__ == "__main__":
    main()
