"""Isolate per-op VPU costs inside a Pallas kernel on the real TPU.

The fused HS sweep measures ~15x off the naive VPU-throughput floor
(BASELINE.md round-2 notes). This probe times R-deep dependent chains of
individual ops on a VMEM-resident (168, 1152) f32 tile — the exact
halo'd-tile shape of the default 128x1024/fuse=10 kernel — so we can see
WHICH op the sweep pays for: lane rolls, sublane rolls, misaligned
slices, or plain arithmetic.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_vpu_probe.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

H, W = 168, 1152
R = 2000  # chain depth per kernel call


def probe(name, body_fn, r=R):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, o_ref):
        def body(_, x):
            return body_fn(x)

        o_ref[:] = jax.lax.fori_loop(0, r, body, a_ref[:])

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern, in_specs=[vspec], out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    a = jnp.asarray(np.random.default_rng(0).uniform(0.5, 1.0, (H, W)),
                    jnp.float32)
    f = jax.jit(f)
    np.asarray(f(a))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(a)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    ns_per_op = best / r * 1e9
    eff_top = H * W / (best / r) / 1e12
    print(f"{name:34s} {ns_per_op:9.1f} ns/op  ({eff_top:6.2f} T-elem/s)",
          flush=True)
    return best


def main():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    probe("add x+x", lambda x: x + x)
    probe("fma x*x+x", lambda x: x * x + x)
    probe("roll lane d=1", lambda x: pltpu.roll(x, 1, 1))
    probe("roll lane d=2", lambda x: pltpu.roll(x, 2, 1))
    probe("roll lane d=W-1", lambda x: pltpu.roll(x, W - 1, 1))
    probe("roll sublane d=1", lambda x: pltpu.roll(x, 1, 0))
    probe("roll sublane d=2", lambda x: pltpu.roll(x, 2, 0))
    probe("roll sublane d=H-1", lambda x: pltpu.roll(x, H - 1, 0))

    # Misaligned static slice + pad back to shape (what _box_valid's
    # shrinking slices cost, modulo the shrink).
    def slice_x(x):
        return jnp.pad(x[:, 1:], ((0, 0), (0, 1)))

    def slice_y(x):
        return jnp.pad(x[1:, :], ((0, 1), (0, 0)))

    probe("slice+pad lane d=1", slice_x)
    probe("slice+pad sublane d=1", slice_y)

    # One full 5-tap cyclic box sum (8 rolls + 8 adds) as the composite.
    def box5(x):
        rows = x
        for d in (1, 2):
            rows = rows + pltpu.roll(x, d, 0) + pltpu.roll(x, H - d, 0)
        out = rows
        for d in (1, 2):
            out = out + pltpu.roll(rows, d, 1) + pltpu.roll(rows, W - d, 1)
        return out

    probe("box5 cyclic (8 roll + 8 add)", box5, r=250)

    # Same box on a double-height tile (both fields in one op stream).
    import jax
    from jax.experimental import pallas as pl

    def kern2(a_ref, o_ref):
        def body(_, x):
            rows = x
            for d in (1, 2):
                rows = rows + pltpu.roll(x, d, 0) + pltpu.roll(x, 2 * H - d, 0)
            out = rows
            for d in (1, 2):
                out = out + pltpu.roll(rows, d, 1) + pltpu.roll(rows, W - d, 1)
            return out

        o_ref[:] = jax.lax.fori_loop(0, 250, body, a_ref[:])

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    f2 = jax.jit(pl.pallas_call(
        kern2, in_specs=[vspec], out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((2 * H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)))
    a2 = jnp.asarray(np.random.default_rng(1).uniform(0.5, 1.0, (2 * H, W)),
                     jnp.float32)
    np.asarray(f2(a2))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f2(a2))
        best = min(best, time.perf_counter() - t0)
    print(f"{'box5 cyclic 2H (batched fields)':34s} {best / 250 * 1e9:9.1f} ns/op"
          f"  ({2 * H * W / (best / 250) / 1e12:6.2f} T-elem/s)", flush=True)


if __name__ == "__main__":
    main()
