"""Fused Black-Anandan IRLS relaxation sweep as a Pallas TPU kernel.

One reference sweep (IRLS_OpticalFlow_Pyramid, OpticalFlow.cpp:213-270)
updates every site with

    dEx = lambdaD * gx * psi_GM(gx*u + gy*v + it, sigmaD)
        + lambdaS * sum_{4-nbr} psi_GM(u - u_nbr, sigmaS)
    u  -= dEx / sup_x       (sup = Lipschitz bound, a global scalar)

in Jacobi double-buffered order. The stencil radius is 1 (4-neighbor
smoothness), so ``fuse`` iterations need a ``fuse``-pixel halo; the kernel
DMAs the halo'd tile of u, v, gx, gy, it into VMEM, runs ``fuse`` sweeps
with statically shrinking valid regions, and writes the exact core tile.

Border semantics: neighbor terms are masked by *global* coordinates (a
neighbor outside the frame contributes nothing — the reference's
``get_zeropad``-excluded border, OpticalFlow.cpp:281-303), so tile
decomposition is bitwise-equivalent to the single-array sweep.

Energy checks/early stopping stay outside the kernel (they are global
reductions at a coarser cadence); see
:func:`tpuflow.solvers.black_anandan_fast.optical_flow_pyramid_fast`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _psi_gm(x, sigma):
    """Geman-McClure influence: 2 x sigma / (sigma + x^2)^2 — same sigma
    convention as tpuflow.solvers.mestimators (MEstimator.cpp:12-16)."""
    d = sigma + x * x
    return 2.0 * x * sigma / (d * d)


def _irls_kernel(supx_ref, supy_ref,
                 u_hbm, v_hbm, gx_hbm, gy_hbm, it_hbm,
                 uo_ref, vo_ref,
                 us, vs, gxs, gys, its, sems,
                 *, tile_h: int, tile_w: int, halo_y: int, halo_x: int,
                 need: int, fuse: int,
                 img_h: int, img_w: int, lambda_d: float, lambda_s: float,
                 sigma_d: float, sigma_s: float):
    # halo_y/halo_x are tiling-aligned DMA margins; `need` = fuse is the
    # stencil halo actually consumed (cropped right after load).
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = i * tile_h
    col0 = j * tile_w
    hh = tile_h + 2 * halo_y
    hw = tile_w + 2 * halo_x

    copies = []
    for idx, (src, dst) in enumerate(
            ((u_hbm, us), (v_hbm, vs), (gx_hbm, gxs), (gy_hbm, gys),
             (it_hbm, its))):
        c = pltpu.make_async_copy(
            src.at[pl.ds(row0, hh), pl.ds(col0, hw)], dst, sems.at[idx])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    dt = us.dtype
    sup_x = supx_ref[0, 0]
    sup_y = supy_ref[0, 0]
    sd = sigma_d
    ss = sigma_s

    ch = tile_h + 2 * need
    cw = tile_w + 2 * need
    oy = halo_y - need
    ox = halo_x - need
    crop = (slice(oy, oy + ch), slice(ox, ox + cw))

    # Global image coords of every cropped-local cell (image pixel (y, x)
    # sits at padded (y + halo); cropped l -> image row row0 + l - need).
    # The neighbor-validity masks are materialized as FLOAT arrays here and
    # sliced per iteration below: Mosaic crashes on strided slices of i32
    # iota values (vector_extract_strided_slice internal check), while
    # float slices lower fine.
    ly = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)
    lx = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1)
    gy_img = row0 + ly - need
    gx_img = col0 + lx - need
    nb_masks = {}
    for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nb_ok = ((gy_img + dy >= 0) & (gy_img + dy < img_h)
                 & (gx_img + dx >= 0) & (gx_img + dx < img_w))
        nb_masks[(dx, dy)] = nb_ok.astype(dt)

    u = us[crop]
    v = vs[crop]
    gxa = gxs[crop]
    gya = gys[crop]
    ita = its[crop]
    hh = ch
    hw = cw

    for t in range(fuse):
        s_h = hh - 2 * t
        s_w = hw - 2 * t
        # Center crop (one ring smaller).
        ctr = (slice(1, s_h - 1), slice(1, s_w - 1))
        uc = u[ctr]
        vc = v[ctr]
        o = t + 1
        gxc = gxa[o : o + s_h - 2, o : o + s_w - 2]
        gyc = gya[o : o + s_h - 2, o : o + s_w - 2]
        itc = ita[o : o + s_h - 2, o : o + s_w - 2]

        psi_d = _psi_gm(gxc * uc + gyc * vc + itc, sd)
        nx = jnp.zeros_like(uc)
        ny = jnp.zeros_like(vc)
        for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            un = u[1 + dy : s_h - 1 + dy, 1 + dx : s_w - 1 + dx]
            vn = v[1 + dy : s_h - 1 + dy, 1 + dx : s_w - 1 + dx]
            m = nb_masks[(dx, dy)][o : o + s_h - 2, o : o + s_w - 2]
            nx = nx + m * _psi_gm(uc - un, ss)
            ny = ny + m * _psi_gm(vc - vn, ss)
        u = uc - (lambda_d * gxc * psi_d + lambda_s * nx) / sup_x
        v = vc - (lambda_d * gyc * psi_d + lambda_s * ny) / sup_y

    uo_ref[:] = u
    vo_ref[:] = v


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "lambda_d", "lambda_s", "sigma_d", "sigma_s",
                     "tile_h", "tile_w", "fuse", "interpret"))
def irls_sweep_pallas(
    u: jnp.ndarray,
    v: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    it: jnp.ndarray,
    sup_x: jnp.ndarray,
    sup_y: jnp.ndarray,
    n_iters: int,
    lambda_d: float = 5.0,
    lambda_s: float = 1.0,
    sigma_d: float = 0.1,
    sigma_s: float = 0.1,
    tile_h: int = 256,
    tile_w: int = 512,
    fuse: int = 16,
    interpret: bool = False,
):
    """Run ``n_iters`` fused IRLS sweeps; returns (u, v).

    ``sup_x``/``sup_y`` are the precomputed Lipschitz bounds
    (:func:`tpuflow.solvers.black_anandan.irls_sup`). Bitwise-equivalent
    to ``n_iters`` applications of ``irls_grad`` + step.
    """
    h, w = u.shape
    dt = u.dtype
    tile_h = min(tile_h, _cdiv(h, 8) * 8)
    tile_w = min(tile_w, _cdiv(w, 128) * 128)
    n_i = _cdiv(h, tile_h)
    n_j = _cdiv(w, tile_w)
    hp = n_i * tile_h
    wp = n_j * tile_w

    supx = jnp.asarray(sup_x, dt).reshape(1, 1)
    supy = jnp.asarray(sup_y, dt).reshape(1, 1)

    def run_block(u, v, k):
        need = k
        halo_y = _cdiv(need, 4) * 4
        halo_x = _cdiv(need, 64) * 64

        def pad_h(a):
            return jnp.pad(a, ((halo_y, hp - h + halo_y),
                               (halo_x, wp - w + halo_x)))

        kern = functools.partial(
            _irls_kernel, tile_h=tile_h, tile_w=tile_w, halo_y=halo_y,
            halo_x=halo_x, need=need, fuse=k,
            img_h=h, img_w=w, lambda_d=float(lambda_d),
            lambda_s=float(lambda_s), sigma_d=float(sigma_d),
            sigma_s=float(sigma_s))
        hh = tile_h + 2 * halo_y
        hw = tile_w + 2 * halo_x
        any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        u_new, v_new = pl.pallas_call(
            kern,
            grid=(n_i, n_j),
            in_specs=[smem_spec, smem_spec] + [any_spec] * 5,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((hp, wp), dt),
                       jax.ShapeDtypeStruct((hp, wp), dt)),
            scratch_shapes=[pltpu.VMEM((hh, hw), dt)] * 5
            + [pltpu.SemaphoreType.DMA((5,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(supx, supy, pad_h(u), pad_h(v), pad_h(gx), pad_h(gy), pad_h(it))
        return u_new[:h, :w], v_new[:h, :w]

    n_full, rem = divmod(n_iters, fuse)
    if n_full:
        u, v = jax.lax.fori_loop(
            0, n_full, lambda _, uv: run_block(*uv, fuse), (u, v))
    if rem:
        u, v = run_block(u, v, rem)
    return u, v
