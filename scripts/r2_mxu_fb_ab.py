"""Round-2 TPU run: MXU HS kernel head-to-head + Farneback kernel A/B.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/r2_mxu_fb_ab.py
"""

from __future__ import annotations

import time

import numpy as np

H, W = 1080, 1920


def timed(name, fn, repeats=10, windows=3):
    import jax

    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(windows):
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
    prev = rng.uniform(0, 255, (H, W)).astype(np.float32)
    nxt = np.roll(prev, 2, axis=1).astype(np.float32)
    p = jnp.asarray(prev)
    n = jnp.asarray(nxt)

    # ---- HS: MXU banded-matmul horizontal box vs lane-shift baseline ----
    from tpuflow.kernels.hs_stencil import horn_schunck_pallas

    u_m, v_m = horn_schunck_pallas(p, n, 5, 100, 1.0, mxu=True)
    jax.block_until_ready((u_m, v_m))
    u_s, v_s = horn_schunck_pallas(p, n, 5, 100, 1.0, mxu=False)
    err = max(float(jnp.max(jnp.abs(u_m - u_s))),
              float(jnp.max(jnp.abs(v_m - v_s))))
    print(f"hs mxu-vs-shift max abs err: {err:.3e} "
          f"(|u| max {float(jnp.max(jnp.abs(u_s))):.1f})", flush=True)
    timed("hs tiled shift f10", lambda: horn_schunck_pallas(
        p, n, 5, 100, 1.0, mxu=False))
    timed("hs tiled MXU  f10", lambda: horn_schunck_pallas(
        p, n, 5, 100, 1.0, mxu=True))
    timed("hs tiled MXU  f16", lambda: horn_schunck_pallas(
        p, n, 5, 100, 1.0, fuse=16, mxu=True))
    timed("hs pipelined MXU f10", lambda: horn_schunck_pallas(
        p, n, 5, 100, 1.0, pipelined=True, mxu=True))

    # ---- FB: kernel A/B on the stream config (zero-flow fix active) ----
    from tpuflow.solvers.farneback import calc_optical_flow_farneback as fb

    def cfg(upk, ubk):
        return lambda: fb(p, n, None, 0.4, 1, 48, 2, 8, 1.2, 0,
                          use_poly_kernel=upk, use_blur_kernel=ubk)

    flows = {}
    for upk in (True, False):
        for ubk in (True, False):
            name = f"fb stream poly={'K' if upk else 'x'} blur={'K' if ubk else 'x'}"
            flows[(upk, ubk)] = cfg(upk, ubk)()
            jax.block_until_ready(flows[(upk, ubk)])
            timed(name, cfg(upk, ubk), repeats=5)

    # cross-config flow agreement (the unfused path is the validated one)
    u_ref, v_ref = flows[(False, False)]
    for k, (u2, v2) in flows.items():
        if k == (False, False):
            continue
        du = float(jnp.max(jnp.abs(u2 - u_ref)))
        dv = float(jnp.max(jnp.abs(v2 - v_ref)))
        print(f"fb flow diff vs unfused {k}: du {du:.3e} dv {dv:.3e}",
              flush=True)

    # ---- poly hardware error location (real image, not noise) ----
    from tpuflow.core.io import read_image
    from tpuflow.solvers.farneback import poly_expansion

    img, _ = read_image(
        "/root/reference/HornSchunckOF/img/leftimage/000050_10.png")
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).astype(np.float32)[:368, :1232]
    gi = jnp.asarray(gray)
    got = jax.jit(lambda a: poly_expansion(a, 8, 1.2, True))(gi)
    want = jax.jit(lambda a: poly_expansion(a, 8, 1.2, False))(gi)
    jax.block_until_ready((got, want))
    for name, gch, wch in zip(("b1", "b2", "a11", "a22", "a12"), got, want):
        d = np.abs(np.asarray(gch) - np.asarray(wch))
        ij = np.unravel_index(np.argmax(d), d.shape)
        print(f"poly {name}: max {d.max():.3e} at {ij} "
              f"(interior max {d[16:-16, 16:-16].max():.3e}, "
              f"mean {d.mean():.3e})", flush=True)


if __name__ == "__main__":
    main()
