"""Stage-level Farneback profile on the real TPU (stream config, 1080p).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_farneback.py
"""

from __future__ import annotations

import time

import numpy as np

H, W = 1080, 1920
POLY_N = 8
POLY_SIGMA = 1.2
WINSIZE = 48


def timed(name, fn, repeats=10):
    import jax

    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn()
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / repeats)
    print(f"{name}: {best * 1e3:.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from tpuflow.solvers.farneback import (
        _box_blur,
        _solve_flow,
        calc_optical_flow_farneback,
        poly_expansion,
        update_matrices,
    )

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    prev = rng.uniform(0, 255, (H, W)).astype(np.float32)
    nxt = np.roll(prev, 2, axis=1).astype(np.float32)
    p = jnp.asarray(prev)
    n = jnp.asarray(nxt)

    pe = jax.jit(lambda a: poly_expansion(a, POLY_N, POLY_SIGMA))
    R1 = pe(p)
    R2 = pe(n)
    jax.block_until_ready((R1, R2))
    u = jnp.zeros((H, W), jnp.float32)
    v = jnp.zeros((H, W), jnp.float32)

    um = jax.jit(update_matrices)
    M = um(R1, R2, u, v)
    bl = jax.jit(lambda m: _box_blur(m, WINSIZE))
    sv = jax.jit(_solve_flow)

    timed("poly_expansion (x2/frame)", lambda: pe(p))
    timed("update_matrices (x2/frame)", lambda: um(R1, R2, u, v))
    timed("box_blur w48 (x2/frame)", lambda: bl(M))
    timed("solve (x2/frame)", lambda: sv(bl(M)))

    timed("full stream cfg (0.4,1,48,2,8,1.2)",
          lambda: calc_optical_flow_farneback(
              p, n, None, 0.4, 1, 48, 2, 8, 1.2, 0), repeats=5)


if __name__ == "__main__":
    main()
