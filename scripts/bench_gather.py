"""Microbench: row-gather formulations for the Farneback warp at 1080p.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_gather.py
"""

from __future__ import annotations

import time

import numpy as np

H, W = 1080, 1920
C = 5


def timed(name, fn, repeats=20):
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

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.normal(size=(H * W, C)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(H, W)) * 5, jnp.float32)
    v = jnp.asarray(rng.normal(size=(H, W)) * 5, jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]

    @jax.jit
    def idx_of(u, v):
        x0 = jnp.clip(jnp.floor(xs + u).astype(jnp.int32), 0, W - 1)
        y0 = jnp.clip(jnp.floor(ys + v).astype(jnp.int32), 0, H - 1)
        return y0 * W + x0

    idx = idx_of(u, v)

    @jax.jit
    def take_one(idx):
        return jnp.take(flat, idx, axis=0)

    @jax.jit
    def take_four(idx):
        outs = []
        for d in (0, 1, W, W + 1):
            outs.append(jnp.take(flat, jnp.minimum(idx + d, H * W - 1),
                                 axis=0))
        return outs

    @jax.jit
    def take_concat(idx):
        idxs = jnp.stack([jnp.minimum(idx.reshape(-1) + d, H * W - 1)
                          for d in (0, 1, W, W + 1)], 0).reshape(-1)
        return jnp.take(flat, idxs, axis=0)

    @jax.jit
    def take_single_col(idx):
        return jnp.take(flat[:, 0], idx, axis=0)

    flat1 = jnp.asarray(rng.normal(size=(H * W,)), jnp.float32)

    @jax.jit
    def take_1d(idx):
        return jnp.take(flat1, idx, axis=0)

    @jax.jit
    def take_sorted(idx):
        # contiguous iota indices (best case — measures non-random cost)
        return jnp.take(flat, jnp.arange(H * W).reshape(H, W), axis=0)

    timed("take (N,5) one tap", lambda: take_one(idx))
    timed("take (N,5) four taps", lambda: take_four(idx))
    timed("take (4N,5) concat", lambda: take_concat(idx))
    timed("take (N,) 1-col", lambda: take_single_col(idx))
    timed("take (N,) 1d field", lambda: take_1d(idx))
    timed("take (N,5) iota", lambda: take_sorted(idx))


if __name__ == "__main__":
    main()
