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


def _nb_masks(row0, col0, ch: int, cw: int, img_h: int, img_w: int, dt):
    """Neighbor-validity masks from global coords, materialized as FLOAT
    arrays (Mosaic crashes on strided slices of int32 iota values —
    slice the float masks instead)."""
    ly = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)
    lx = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1)
    gy_img = row0 + ly
    gx_img = col0 + lx
    masks = {}
    for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nb_ok = ((gy_img + dy >= 0) & (gy_img + dy < img_h)
                 & (gx_img + dx >= 0) & (gx_img + dx < img_w))
        masks[(dx, dy)] = nb_ok.astype(dt)
    return masks


def _irls_sweeps(u, v, gxa, gya, ita, nb_masks, sup_x, sup_y, fuse: int,
                 lambda_d: float, lambda_s: float,
                 sigma_d: float, sigma_s: float):
    """``fuse`` IRLS Jacobi sweeps on a halo'd tile with statically
    shrinking valid regions (stencil radius 1). Inputs (hh, hw); returns
    the (hh - 2*fuse, hw - 2*fuse) core."""
    hh, hw = u.shape
    sd = sigma_d
    ss = sigma_s
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
    return u, v


def _irls_sweeps_gated(u, v, gxa, gya, ita, laba, nb_masks, sup_x, sup_y,
                       fuse: int, lambda_d: float, lambda_s: float,
                       sigma_d: float, sigma_s: float):
    """``fuse`` REGION-GATED IRLS sweeps (Error_u_Block,
    OpticalFlow_BlockMatching.cpp:465-514): the neighbor term is gated by
    label equality and weighted by the direction-coherence factor
    0.5 * (1 + cos(u, u_nbr)) — bitwise the math of
    tpuflow.solvers.bm_flow._neighbor_terms, on a halo'd tile with
    statically shrinking valid regions. ``laba`` carries the region
    labels as floats (exact for the int region ids)."""
    hh, hw = u.shape
    sd = sigma_d
    ss = sigma_s
    # Sweep-invariant label gates at full halo resolution, sliced per
    # sweep (the compare against the shifted labels was recomputed every
    # sweep; identical values, computed once).
    gate_full = {}
    for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        ln_f = laba[1 + dy : hh - 1 + dy, 1 + dx : hw - 1 + dx]
        lab_c = laba[1 : hh - 1, 1 : hw - 1]
        inb_f = nb_masks[(dx, dy)][1 : hh - 1, 1 : hw - 1]
        gate_full[(dx, dy)] = inb_f * (ln_f == lab_c).astype(u.dtype)
    for t in range(fuse):
        s_h = hh - 2 * t
        s_w = hw - 2 * t
        ctr = (slice(1, s_h - 1), slice(1, s_w - 1))
        uc = u[ctr]
        vc = v[ctr]
        o = t + 1
        gxc = gxa[o : o + s_h - 2, o : o + s_w - 2]
        gyc = gya[o : o + s_h - 2, o : o + s_w - 2]
        itc = ita[o : o + s_h - 2, o : o + s_w - 2]

        psi_d = _psi_gm(gxc * uc + gyc * vc + itc, sd)
        # Neighbor norms are SLICES of one norm field over the current
        # halo'd u/v (bitwise: sqrt commutes with the shift).
        norm_f = jnp.sqrt(u * u + v * v)
        norm_c = norm_f[ctr]
        nx = jnp.zeros_like(uc)
        ny = jnp.zeros_like(vc)
        for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            un = u[1 + dy : s_h - 1 + dy, 1 + dx : s_w - 1 + dx]
            vn = v[1 + dy : s_h - 1 + dy, 1 + dx : s_w - 1 + dx]
            gate = gate_full[(dx, dy)][t : t + s_h - 2, t : t + s_w - 2]
            nn = norm_f[1 + dy : s_h - 1 + dy, 1 + dx : s_w - 1 + dx]
            prod = norm_c * nn
            cosang = jnp.where(prod > 0,
                               (uc * un + vc * vn)
                               / jnp.maximum(prod, 1e-30), 1.0)
            m = gate * (0.5 * (1.0 + cosang))
            nx = nx + m * _psi_gm(uc - un, ss)
            ny = ny + m * _psi_gm(vc - vn, ss)
        u = uc - (lambda_d * gxc * psi_d + lambda_s * nx) / sup_x
        v = vc - (lambda_d * gyc * psi_d + lambda_s * ny) / sup_y
    return u, v


def _irls_gated_kernel(supx_ref, supy_ref,
                       u_hbm, v_hbm, gx_hbm, gy_hbm, it_hbm, lab_hbm,
                       uo_ref, vo_ref,
                       us, vs, gxs, gys, its, labs, sems,
                       *, tile_h: int, tile_w: int, halo_y: int,
                       halo_x: int, need: int, fuse: int,
                       img_h: int, img_w: int, lambda_d: float,
                       lambda_s: float, sigma_d: float, sigma_s: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = i * tile_h
    col0 = j * tile_w
    hh = tile_h + 2 * halo_y
    hw = tile_w + 2 * halo_x

    copies = []
    for idx, (src, dst) in enumerate(
            ((u_hbm, us), (v_hbm, vs), (gx_hbm, gxs), (gy_hbm, gys),
             (it_hbm, its), (lab_hbm, labs))):
        c = pltpu.make_async_copy(
            src.at[pl.ds(row0, hh), pl.ds(col0, hw)], dst, sems.at[idx])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    dt = us.dtype
    ch = tile_h + 2 * need
    cw = tile_w + 2 * need
    oy = halo_y - need
    ox = halo_x - need
    crop = (slice(oy, oy + ch), slice(ox, ox + cw))
    nb_masks = _nb_masks(row0 - need, col0 - need, ch, cw, img_h, img_w, dt)
    u, v = _irls_sweeps_gated(us[crop], vs[crop], gxs[crop], gys[crop],
                              its[crop], labs[crop], nb_masks,
                              supx_ref[0, 0], supy_ref[0, 0], fuse,
                              lambda_d, lambda_s, sigma_d, sigma_s)
    uo_ref[:] = u
    vo_ref[:] = v


@functools.partial(
    jax.jit,
    static_argnames=("n_iters", "lambda_d", "lambda_s", "sigma_d", "sigma_s",
                     "tile_h", "tile_w", "fuse", "interpret"))
def irls_gated_sweep_pallas(
    u: jnp.ndarray,
    v: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    it: jnp.ndarray,
    labels_f: jnp.ndarray,
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
    """``n_iters`` fused region-gated IRLS sweeps (the flagship BM
    refinement's hot loop, IRLS_OpticalFlow_GradientMethod); returns
    (u, v). ``labels_f`` = region labels cast to the flow dtype. Padded
    halo labels are -1 (never equal to a real label -> gated off, which
    matches the whole-frame formulation where out-of-frame neighbors are
    masked)."""
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

        def pad_h(a, fill=0.0):
            return jnp.pad(a, ((halo_y, hp - h + halo_y),
                               (halo_x, wp - w + halo_x)),
                           constant_values=fill)

        kern = functools.partial(
            _irls_gated_kernel, tile_h=tile_h, tile_w=tile_w,
            halo_y=halo_y, halo_x=halo_x, need=need, fuse=k,
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
            in_specs=[smem_spec, smem_spec] + [any_spec] * 6,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((hp, wp), dt),
                       jax.ShapeDtypeStruct((hp, wp), dt)),
            scratch_shapes=[pltpu.VMEM((hh, hw), dt)] * 6
            + [pltpu.SemaphoreType.DMA((6,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(supx, supy, pad_h(u), pad_h(v), pad_h(gx), pad_h(gy), pad_h(it),
          pad_h(labels_f, -1.0))
        return u_new[:h, :w], v_new[:h, :w]

    n_full, rem = divmod(n_iters, fuse)
    if n_full:
        u, v = jax.lax.fori_loop(
            0, n_full, lambda _, uv: run_block(*uv, fuse), (u, v))
    if rem:
        u, v = run_block(u, v, rem)
    return u, v


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
    nb_masks = _nb_masks(row0 - need, col0 - need, ch, cw, img_h, img_w, dt)

    u, v = _irls_sweeps(us[crop], vs[crop], gxs[crop], gys[crop], its[crop],
                        nb_masks, sup_x, sup_y, fuse,
                        lambda_d, lambda_s, sd, ss)
    uo_ref[:] = u
    vo_ref[:] = v


def _irls_tile_kernel(supx_ref, supy_ref, row0_ref, col0_ref,
                      u_ref, v_ref, gx_ref, gy_ref, it_ref,
                      uo_ref, vo_ref,
                      *, fuse: int, img_h: int, img_w: int,
                      lambda_d: float, lambda_s: float,
                      sigma_d: float, sigma_s: float):
    """Single-tile fused IRLS sweep for the shard_map distributed path
    (halos already exchanged outside; tile origin as SMEM scalars)."""
    row0 = row0_ref[0, 0]
    col0 = col0_ref[0, 0]
    ch, cw = u_ref.shape
    nb_masks = _nb_masks(row0, col0, ch, cw, img_h, img_w, u_ref.dtype)
    u, v = _irls_sweeps(u_ref[:], v_ref[:], gx_ref[:], gy_ref[:], it_ref[:],
                        nb_masks, supx_ref[0, 0], supy_ref[0, 0], fuse,
                        lambda_d, lambda_s, sigma_d, sigma_s)
    uo_ref[:] = u
    vo_ref[:] = v


def irls_tile_sweeps(u_p, v_p, gx_p, gy_p, it_p, sup_x, sup_y, row0, col0,
                     img_h: int, img_w: int, fuse: int,
                     lambda_d: float, lambda_s: float,
                     sigma_d: float, sigma_s: float,
                     interpret: bool = False):
    """Run ``fuse`` fused IRLS sweeps on one halo'd tile (the Pallas body
    of tpuflow.dist.solvers.irls_level_sharded_fused). Inputs are
    (th + 2*fuse, tw + 2*fuse) with halos already exchanged; ``row0``/
    ``col0`` are the global image coords of ``u_p[0, 0]`` (traced scalars
    allowed). Returns the (th, tw) core."""
    hh, hw = u_p.shape
    dt = u_p.dtype
    kern = functools.partial(
        _irls_tile_kernel, fuse=fuse, img_h=img_h, img_w=img_w,
        lambda_d=float(lambda_d), lambda_s=float(lambda_s),
        sigma_d=float(sigma_d), sigma_s=float(sigma_s))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        in_specs=[smem] * 4 + [vspec] * 5,
        out_specs=(vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((hh - 2 * fuse, hw - 2 * fuse), dt),
                   jax.ShapeDtypeStruct((hh - 2 * fuse, hw - 2 * fuse), dt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(sup_x, dt).reshape(1, 1),
      jnp.asarray(sup_y, dt).reshape(1, 1),
      jnp.asarray(row0, jnp.int32).reshape(1, 1),
      jnp.asarray(col0, jnp.int32).reshape(1, 1),
      u_p, v_p, gx_p, gy_p, it_p)


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
