"""Round-4 HS sweep formulation A/B (VERDICT r3 #7, README roadmap).

The round-2 probe (bench_vpu_probe.py) pinned per-op cost on a
(168, 1152) f32 tile at ~20 us REGARDLESS of op kind — lane rolls,
sublane rolls, slices and adds all cost the same, so a "lane-aligned"
layout cannot win by making shifts cheaper; pre-rotated field copies of
the ITERATION-VARYING fields are zero-sum (the copies must be re-rotated
every sweep, costing exactly the rolls they remove), and full
phase-copy propagation multiplies the vertical-box work 5x (algebra in
the r4 notes below). The only lever left is OP COUNT.

This probe measures the one real op-count reduction available for the
5-tap box: the TWO-STAGE DRIFTING box —

    s1 = x + roll(x, 1)          # pairs
    s2 = s1 + roll(s1, 2)        # quads
    bh = s2 + roll(x, 4)         # 5-tap sum, aligned at +2 drift

6 ops instead of the classic 8 (4 rolls + 4 adds) per direction per
field; the constant +2 alignment drift per sweep folds into PRE-ROTATED
copies of the iteration-INVARIANT fields (gX, gY, gT, 1/D and border
masks — hoisted, free), with one final alignment roll per frame.

Measured composites (dependent chains in one Pallas kernel, the real
sweep op mix):
  A. classic full HS sweep  (2 x 16 box ops + ~8 update ops)
  B. two-stage full HS sweep (2 x 12 box ops + ~8 update ops, drift
     emulated with distinct pre-rotated invariant operands)

If B/A ~ op-count ratio (~0.83), the kernel rewrite is worth it; if
flat, the README roadmap item closes as a measured negative result.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r4_hs_formulation_probe.py
"""

from __future__ import annotations

import time

import numpy as np

H, W = 168, 1152
R = 250  # sweeps per kernel call


def run(name, body_fn, n_inv=4):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(u_ref, v_ref, *refs):
        inv = [r[:] for r in refs[:-2]]
        ou, ov = refs[-2], refs[-1]

        def body(_, uv):
            return body_fn(uv[0], uv[1], inv)

        u, v = jax.lax.fori_loop(0, R, body, (u_ref[:], v_ref[:]))
        ou[:] = u
        ov[:] = v

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = jax.jit(pl.pallas_call(
        kern, in_specs=[vspec] * (2 + n_inv), out_specs=(vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.float32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)))
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.uniform(0.2, 1.0, (H, W)), jnp.float32)
            for _ in range(2 + n_inv)]
    np.asarray(f(*args)[0])
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    us = best / R * 1e6
    print(f"{name:44s} {us:8.2f} us/sweep "
          f"({us * 100 / 1000:6.2f} ms/frame @100 iters)", flush=True)
    return best


def main():
    from jax.experimental.pallas import tpu as pltpu

    def box5_classic(x, axis, n):
        out = x
        for d in (1, 2):
            out = out + pltpu.roll(x, d, axis) + pltpu.roll(x, n - d, axis)
        return out

    def box5_two_stage(x, axis, n):
        s1 = x + pltpu.roll(x, 1, axis)
        s2 = s1 + pltpu.roll(s1, 2, axis)
        return s2 + pltpu.roll(x, 4, axis)

    def sweep(box):
        def body(u, v, inv):
            gx, gy, gt, dinv = inv[:4]
            ub = box(box(u, 0, H), 1, W)
            vb = box(box(v, 0, H), 1, W)
            upd = (gx * ub + gy * vb + gt) * dinv
            return ub - gx * upd, vb - gy * upd

        return body

    run("A classic sweep (2x16 box + update)", sweep(box5_classic))
    run("B two-stage drifting (2x12 box + update)", sweep(box5_two_stage))

    # Box composites alone, for the op-count attribution.
    def only_box(box):
        def body(u, v, inv):
            return box(box(u, 0, H), 1, W), box(box(v, 0, H), 1, W)

        return body

    run("A' classic box only (2x16 ops)", only_box(box5_classic))
    run("B' two-stage box only (2x12 ops)", only_box(box5_two_stage))


if __name__ == "__main__":
    main()
