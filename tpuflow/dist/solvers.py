"""Distributed (multi-chip) flow solvers: 2-D image tiling + halo exchange.

The scaling axis of the reference is image-domain size (SURVEY.md §5.7);
here 4K+ frames are tiled over a ("ty", "tx") device mesh. Two mechanisms:

- *auto*: ``jit`` with NamedSharding-annotated inputs — XLA GSPMD
  partitions the convolutions/stencils and inserts halo exchanges itself.
  Used for one-shot ops (gradients, pyramid levels).
- *explicit*: ``shard_map`` bodies with :func:`tpuflow.dist.halo.halo_pad_2d`
  ppermute exchanges — used for the relaxation loops so the whole
  iterate-exchange cycle stays in one compiled program, and as the basis
  for k-sweeps-per-exchange fusion.

Equivalence: Jacobi sweeps are tile-invariant given fresh 1-px halos each
iteration, and zero-filled global-border halos match the reference's
BORDER_CONSTANT/zeropad convention, so the distributed solve matches the
single-device solve to float associativity (verified in
tests/test_dist.py; SURVEY.md §2.6).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

from tpuflow.dist.halo import halo_pad_2d
from tpuflow.solvers.horn_schunck import hs_gradients
from tpuflow.solvers.mestimators import geman_mcclure_psi, geman_mcclure_rho


def _box_valid(padded: jnp.ndarray, size: int) -> jnp.ndarray:
    k = jnp.full((size, size), 1.0 / (size * size), dtype=padded.dtype)
    out = lax.conv_general_dilated(
        padded[None, None], k[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=padded.dtype)
    return out[0, 0]


def horn_schunck_sharded(
    prev: jnp.ndarray,
    next: jnp.ndarray,
    mesh: Mesh,
    window_size: int = 5,
    max_iterations: int = 100,
    alpha: float = 1.0,
):
    """Distributed box-Jacobi Horn-Schunck over a ("ty", "tx") mesh.

    H and W must be divisible by the mesh extents. Returns (u, v) sharded
    over the mesh.
    """
    h, w = prev.shape
    ty, tx = mesh.devices.shape
    if h % ty or w % tx:
        raise ValueError(f"image {h}x{w} not divisible by mesh {ty}x{tx}")
    spec = P("ty", "tx")
    sharding = NamedSharding(mesh, spec)
    prev = jax.device_put(prev, sharding)
    next = jax.device_put(next, sharding)
    r = window_size // 2

    # Gradients: auto-sharded (XLA handles the reflect101 halo).
    gx, gy, gt = jax.jit(hs_gradients)(prev, next)

    def tile_body(gx_t, gy_t, gt_t):
        denom = alpha * alpha + gx_t * gx_t + gy_t * gy_t
        u0 = jnp.zeros_like(gt_t)
        v0 = jnp.zeros_like(gt_t)

        def body(_, uv):
            u, v = uv
            up = halo_pad_2d(u, r)
            vp = halo_pad_2d(v, r)
            ubar = _box_valid(up, window_size)
            vbar = _box_valid(vp, window_size)
            upd = (gx_t * ubar + gy_t * vbar + gt_t) / denom
            return ubar - gx_t * upd, vbar - gy_t * upd

        return lax.fori_loop(0, max_iterations, body, (u0, v0))

    f = jax.jit(shard_map(tile_body, mesh, in_specs=(spec, spec, spec),
                          out_specs=(spec, spec)))
    return f(gx, gy, gt)


def horn_schunck_sharded_fused(
    prev: jnp.ndarray,
    next: jnp.ndarray,
    mesh: Mesh,
    window_size: int = 5,
    max_iterations: int = 100,
    alpha: float = 1.0,
    fuse: int = 5,
):
    """Horn-Schunck with k sweeps per halo exchange.

    Exchanges a (fuse * r)-wide halo once per block of ``fuse``
    iterations and runs the sweeps on statically shrinking regions (the
    same overlapped-tiling scheme as the Pallas kernel,
    tpuflow/kernels/hs_stencil.py) — cutting ppermute latency count by
    ``fuse`` while staying bitwise-equivalent Jacobi: an inside-image
    mask from global tile coordinates re-zeroes u, v outside the frame
    after every sweep, preserving BORDER_CONSTANT semantics through the
    halo zone.
    """
    h, w = prev.shape
    ty, tx = mesh.devices.shape
    if h % ty or w % tx:
        raise ValueError(f"image {h}x{w} not divisible by mesh {ty}x{tx}")
    spec = P("ty", "tx")
    sharding = NamedSharding(mesh, spec)
    prev = jax.device_put(prev, sharding)
    next = jax.device_put(next, sharding)
    r = window_size // 2
    halo = fuse * r
    if h // ty <= halo or w // tx <= halo:
        raise ValueError("tile smaller than the fused halo; lower fuse")

    gx, gy, gt = jax.jit(hs_gradients)(prev, next)
    n_blocks, rem = divmod(max_iterations, fuse)

    def tile_body(gx_t, gy_t, gt_t):
        th, tw = gx_t.shape
        inv_denom = 1.0 / (alpha * alpha + gx_t * gx_t + gy_t * gy_t)
        iy = lax.axis_index("ty")
        ix = lax.axis_index("tx")

        def run_block(u, v, k):
            hk = k * r
            u_p = halo_pad_2d(u, hk)
            v_p = halo_pad_2d(v, hk)
            gx_p = halo_pad_2d(gx_t, hk)
            gy_p = halo_pad_2d(gy_t, hk)
            gt_p = halo_pad_2d(gt_t, hk)
            inv_p = halo_pad_2d(inv_denom, hk)
            hh = th + 2 * hk
            hw = tw + 2 * hk
            # Global image coords of each halo'd-local cell.
            xg = ix * tw + jnp.arange(hw)[None, :] - hk
            yg = iy * th + jnp.arange(hh)[:, None] - hk
            mask = ((xg >= 0) & (xg < w) & (yg >= 0)
                    & (yg < h)).astype(u.dtype)
            uu = u_p * mask
            vv = v_p * mask
            for t in range(k):
                o = r * (t + 1)
                sh = hh - 2 * o
                sw = hw - 2 * o
                ub = _box_shrink(uu, window_size)
                vb = _box_shrink(vv, window_size)
                c = (slice(o, o + sh), slice(o, o + sw))
                upd = (gx_p[c] * ub + gy_p[c] * vb + gt_p[c]) * inv_p[c]
                uu = (ub - gx_p[c] * upd) * mask[c]
                vv = (vb - gy_p[c] * upd) * mask[c]
            return uu, vv

        u = jnp.zeros_like(gt_t)
        v = jnp.zeros_like(gt_t)
        if n_blocks:
            u, v = lax.fori_loop(
                0, n_blocks, lambda _, uv: run_block(*uv, fuse), (u, v))
        if rem:
            u, v = run_block(u, v, rem)
        return u, v

    f = jax.jit(shard_map(tile_body, mesh, in_specs=(spec, spec, spec),
                          out_specs=(spec, spec)))
    return f(gx, gy, gt)


def _box_shrink(a: jnp.ndarray, taps: int) -> jnp.ndarray:
    """Separable box *mean* over taps x taps; output shrinks by taps-1."""
    h, w = a.shape
    rows = a[0 : h - taps + 1, :]
    for d in range(1, taps):
        rows = rows + a[d : h - taps + 1 + d, :]
    out = rows[:, 0 : w - taps + 1]
    for d in range(1, taps):
        out = out + rows[:, d : w - taps + 1 + d]
    return out / (taps * taps)


# ---------------------------------------------------------------------------
# Distributed Black-Anandan IRLS level


def _neighbor_terms(u_p, v_p, u, v, sigma_s, mask_l, mask_r, mask_t, mask_b,
                    fn):
    """Sum fn(u - u_nbr) over the 4 neighbors of each interior site.

    u_p/v_p are 1-px halo-padded tiles; masks kill contributions at the
    *global* image border (Error_u skips missing neighbors,
    OpticalFlow.cpp:288-304).
    """
    h, w = u.shape
    sl = lambda a, dy, dx: lax.dynamic_slice(a, (1 + dy, 1 + dx), (h, w))
    nx = (jnp.where(mask_l, fn(u - sl(u_p, 0, -1), sigma_s), 0.0)
          + jnp.where(mask_r, fn(u - sl(u_p, 0, 1), sigma_s), 0.0)
          + jnp.where(mask_t, fn(u - sl(u_p, -1, 0), sigma_s), 0.0)
          + jnp.where(mask_b, fn(u - sl(u_p, 1, 0), sigma_s), 0.0))
    ny = (jnp.where(mask_l, fn(v - sl(v_p, 0, -1), sigma_s), 0.0)
          + jnp.where(mask_r, fn(v - sl(v_p, 0, 1), sigma_s), 0.0)
          + jnp.where(mask_t, fn(v - sl(v_p, -1, 0), sigma_s), 0.0)
          + jnp.where(mask_b, fn(v - sl(v_p, 1, 0), sigma_s), 0.0))
    return nx, ny


def irls_level_sharded(
    u0, v0, gx, gy, it, mesh: Mesh,
    lambda_d: float, lambda_s: float, sigma_d: float, sigma_s: float,
    iter_max: int, error_min_threshold: float, is_level0: bool,
    energy_every: int = 64,
):
    """Distributed IRLS relaxation level, semantics of
    IRLS_OpticalFlow_Pyramid (OpticalFlow.cpp:213-270) over the mesh.

    sup uses pmax, the energy uses psum; all devices follow the same
    stopping decision.
    """
    h, w = gx.shape
    ty, tx = mesh.devices.shape
    if h % ty or w % tx:
        raise ValueError(f"image {h}x{w} not divisible by mesh {ty}x{tx}")
    spec = P("ty", "tx")
    sharding = NamedSharding(mesh, spec)
    args = [jax.device_put(a, sharding) for a in (u0, v0, gx, gy, it)]

    def tile_body(u0_t, v0_t, gx_t, gy_t, it_t):
        th, tw = gx_t.shape
        iy = lax.axis_index("ty")
        ix = lax.axis_index("tx")
        xg = ix * tw + jnp.arange(tw)[None, :]
        yg = iy * th + jnp.arange(th)[:, None]
        mask_l = jnp.broadcast_to(xg > 0, (th, tw))
        mask_r = jnp.broadcast_to(xg < w - 1, (th, tw))
        mask_t = jnp.broadcast_to(yg > 0, (th, tw))
        mask_b = jnp.broadcast_to(yg < h - 1, (th, tw))

        sup_x = (lambda_d * lax.pmax(lax.pmax(jnp.max(gx_t * gx_t), "tx"), "ty")
                 / sigma_d**2 + 4.0 * lambda_s / sigma_s**2)
        sup_y = (lambda_d * lax.pmax(lax.pmax(jnp.max(gy_t * gy_t), "tx"), "ty")
                 / sigma_d**2 + 4.0 * lambda_s / sigma_s**2)

        def energy(u, v):
            u_p = halo_pad_2d(u, 1)
            v_p = halo_pad_2d(v, 1)
            nx, ny = _neighbor_terms(u_p, v_p, u, v, sigma_s,
                                     mask_l, mask_r, mask_t, mask_b,
                                     geman_mcclure_rho)
            center = geman_mcclure_rho(gx_t * u + gy_t * v + it_t, sigma_d)
            local = jnp.sum(lambda_d * center + lambda_s * (nx + ny))
            return lax.psum(lax.psum(local, "tx"), "ty")

        def cond(carry):
            u, v, E, inc, n, stop = carry
            return jnp.logical_and(n < iter_max, jnp.logical_not(stop))

        def body(carry):
            u, v, E, inc, n, _ = carry
            u_p = halo_pad_2d(u, 1)
            v_p = halo_pad_2d(v, 1)
            nx, ny = _neighbor_terms(u_p, v_p, u, v, sigma_s,
                                     mask_l, mask_r, mask_t, mask_b,
                                     geman_mcclure_psi)
            center = geman_mcclure_psi(gx_t * u + gy_t * v + it_t, sigma_d)
            dEx = lambda_d * gx_t * center + lambda_s * nx
            dEy = lambda_d * gy_t * center + lambda_s * ny
            u = u - dEx / sup_x
            v = v - dEy / sup_y
            if is_level0:
                E_new = lax.cond((n % energy_every) == 0,
                                 lambda: energy(u, v), lambda: E)
                inc_new = inc
            else:
                E_new = energy(u, v)
                inc_new = jnp.where(E_new > E, inc + 1, 0)
            stop = jnp.logical_or(E_new < error_min_threshold, inc_new > 3)
            return u, v, E_new, inc_new, n + 1, stop

        E0 = jnp.asarray(0.0, u0_t.dtype)
        u, v, E, _, n, _ = lax.while_loop(
            cond, body,
            (u0_t, v0_t, E0, jnp.int32(0), jnp.int32(0), jnp.bool_(False)))
        return u, v

    f = jax.jit(shard_map(tile_body, mesh, in_specs=(spec,) * 5,
                          out_specs=(spec, spec)))
    return f(*args)
