"""Round-4 Farneback demo3 (0.5/3/15/3/5/1.2 @1080p) stage profile.

bench.py's new `farneback_demo3_1080p_fps` row measured 3.76 fps
(266 ms/frame) — above the <=100 ms VERDICT r3 #2 target even after the
packed single-gather warp. This attributes the cost: per-level poly
expansion, packed-table build, warped vs zero-flow update_matrices,
blur+solve, and the pyramid resizes — plus the raw gather rate of the
packed (N, 20) row table vs four (N, 5) gathers (the round-1
bench_gather variants).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r4_fb_demo3_profile.py
"""

from __future__ import annotations

import time

import numpy as np

H, W = 1080, 1920


def timed(name, fn, repeats=10):
    """fn must return a SCALAR checksum: fetching any full output
    through the tunnel costs seconds at these sizes and the first
    version of this profile measured exactly that (np.asarray pulls
    the whole array before any slicing)."""
    out = fn()
    assert np.asarray(out).size == 1
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = fn()
        np.asarray(out)
        best = min(best, (time.perf_counter() - t0) / repeats)
    print(f"{name:46s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from tpuflow.solvers.farneback import (
        _blur_solve,
        _pack_bilinear,
        poly_expansion,
        update_matrices,
    )

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    total_est = 0.0
    for k, (hl, wl) in enumerate([(H, W), (H // 2, W // 2),
                                  (H // 4, W // 4)]):
        img = jnp.asarray(rng.normal(size=(hl, wl)), jnp.float32)
        u = jnp.asarray(rng.normal(size=(hl, wl)) * 2, jnp.float32)
        v = jnp.asarray(rng.normal(size=(hl, wl)) * 2, jnp.float32)

        poly = jax.jit(lambda im: sum(jnp.sum(t)
                                      for t in poly_expansion(im, 5, 1.2)))
        polyf = jax.jit(lambda im: poly_expansion(im, 5, 1.2))
        R = jax.block_until_ready(polyf(img))
        t_poly = timed(f"L{k} poly_expansion {hl}x{wl}", lambda: poly(img))

        pack = jax.jit(lambda R: jnp.sum(_pack_bilinear(R)))
        packf = jax.jit(lambda R: _pack_bilinear(R))
        packed = jax.block_until_ready(packf(R))
        t_pack = timed(f"L{k} pack_bilinear", lambda: pack(R))

        upd_w = jax.jit(lambda R, packed, u, v: jnp.sum(update_matrices(
            R, R, u, v, packed2=packed)))
        upd_wf = jax.jit(lambda R, packed, u, v: update_matrices(
            R, R, u, v, packed2=packed))
        M = jax.block_until_ready(upd_wf(R, packed, u, v))
        t_updw = timed(f"L{k} update_matrices WARPED",
                       lambda: upd_w(R, packed, u, v))

        upd_z = jax.jit(lambda R: jnp.sum(update_matrices(
            R, R, u * 0, v * 0, zero_flow=True)))
        timed(f"L{k} update_matrices zero-flow", lambda: upd_z(R))

        bs = jax.jit(lambda M: jnp.sum(jnp.stack(
            _blur_solve(M, 15, False))))
        t_bs = timed(f"L{k} blur15+solve", lambda: bs(M))

        n_w = 3 if k < 2 else 2  # warped updates per level (init+2, coarsest 1 zero+2)
        total_est += (2 * t_poly + t_pack + n_w * t_updw + 3 * t_bs)

    rs = jax.jit(lambda x: jnp.sum(jax.image.resize(x, (H, W),
                                                    method="linear")))
    xh = jnp.asarray(rng.normal(size=(H // 2, W // 2)), jnp.float32)
    t_rs = timed("resize half->full linear", lambda: rs(xh))
    total_est += 4 * t_rs
    print(f"{'SUM of stages (est.)':46s} {total_est * 1e3:8.2f} ms",
          flush=True)

    # Raw gather-rate attribution at full res.
    flat5 = jnp.asarray(rng.normal(size=(H * W, 5)), jnp.float32)
    flat20 = jnp.asarray(rng.normal(size=(H * W, 20)), jnp.float32)
    idx = jnp.asarray(
        np.clip(np.arange(H * W) + rng.integers(-W * 3, W * 3, H * W),
                0, H * W - 1), jnp.int32)

    g4 = jax.jit(lambda i: sum(
        jnp.sum(jnp.take(flat5, jnp.minimum(i + d, H * W - 1), axis=0))
        for d in (0, 1, W, W + 1)))
    g1 = jax.jit(lambda i: jnp.sum(jnp.take(flat20, i, axis=0)))
    t4 = timed("gather 4x (N,5) rows", lambda: g4(idx))
    t1 = timed("gather 1x (N,20) rows", lambda: g1(idx))
    print(f"packed-gather speedup: {t4 / t1:.2f}x", flush=True)


if __name__ == "__main__":
    main()
