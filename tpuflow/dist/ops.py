"""Distributed L1 image ops — the reference's ImgLibrary OpenMP sites
over a device mesh.

``ImgLibrary.cpp`` parallelizes its filter loops with OpenMP row loops
(``Filterer``:445-447, ``Gaussian``:223-225, ``EpsilonFilter``:97-99 —
SURVEY.md §2.6); the multi-chip analogue tiles the image over the
("ty", "tx") mesh, exchanges kernel-radius halos with ppermute, and runs
the SAME post-pad compute as the single-chip ops (bit-identical: the
tile bodies call the exact op-order code of :mod:`tpuflow.ops.filters`
on border-corrected tiles).

Border correctness at the global edge: :func:`halo_pad_2d` delivers real
neighbor-tile data and zeros beyond the image; for non-zero border
policies the out-of-range halo rows/cols are re-pointed at the policy's
source row/col (mirror / reflect101 / clamp indices land within the
border tile itself whenever the tile is at least the kernel radius wide,
so one local take per axis reproduces ``bd.pad2d`` exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding

from tpuflow.core import borders as bd
from tpuflow.dist.halo import halo_pad_2d
from tpuflow.dist.solvers import SPEC, shard_map

_INDEX_FN = {
    bd.MIRROR: bd.mirror_index,
    bd.REFLECT101: bd.reflect101_index,
    bd.CLAMP: bd.clamp_index,
}


def halo_pad_2d_border(tile, r: int, mode: str, iy, ix, h: int, w: int):
    """(th + 2r, tw + 2r) tile padded with neighbor halos AND the global
    border policy — tile-local equivalent of ``bd.pad2d(img, r, mode)``.
    Requires tiles >= r on each axis for the non-zero policies."""
    p = halo_pad_2d(tile, r)
    if mode == bd.ZERO:
        return p
    idx = _INDEX_FN[mode]
    th, tw = tile.shape
    row0 = iy * th
    col0 = ix * tw
    gy = row0 - r + jnp.arange(th + 2 * r)
    ly = jnp.clip(idx(gy, h) - row0 + r, 0, th + 2 * r - 1)
    p = jnp.take(p, ly, axis=0)
    gx = col0 - r + jnp.arange(tw + 2 * r)
    lx = jnp.clip(idx(gx, w) - col0 + r, 0, tw + 2 * r - 1)
    return jnp.take(p, lx, axis=1)


@functools.lru_cache(maxsize=64)
def _conv2d_sharded_fn(mesh: Mesh, h: int, w: int, kh: int, kw: int,
                       ay: int, ax: int, mode: str):
    from tpuflow.ops.filters import _conv2d_valid

    r = max(ay, kh - 1 - ay, ax, kw - 1 - ax, 1)

    def body(img_t, kern):
        th, tw = img_t.shape
        iy = lax.axis_index("ty")
        ix = lax.axis_index("tx")
        p = halo_pad_2d_border(img_t, r, mode, iy, ix, h, w)
        # The exact asymmetric pad of ops.filters.conv2d
        # (ay, kh-1-ay, ax, kw-1-ax) cropped out of the symmetric halo.
        p = p[r - ay : r - ay + th + kh - 1,
              r - ax : r - ax + tw + kw - 1]
        return _conv2d_valid(p, kern)

    rep = jax.sharding.PartitionSpec()
    return jax.jit(shard_map(body, mesh, in_specs=(SPEC, rep),
                             out_specs=SPEC))


def conv2d_sharded(img, kernel, mesh: Mesh,
                   border: str = bd.ZERO,
                   flip: bool = False,
                   anchor: tuple[int, int] | None = None):
    """Distributed :func:`tpuflow.ops.filters.conv2d` — same signature,
    flip/anchor semantics and op order, image tiled over the mesh."""
    img = jnp.asarray(img)
    kernel = jnp.asarray(kernel)
    kh, kw = kernel.shape
    if flip:
        kernel = kernel[::-1, ::-1]
        if anchor is None:
            anchor = (kw - 1 - kw // 2, kh - 1 - kh // 2)
    if anchor is None:
        anchor = (kw // 2, kh // 2)
    ax, ay = anchor
    h, w = img.shape
    ty, tx = mesh.devices.shape
    if h % ty or w % tx:
        raise ValueError(f"image {h}x{w} not divisible by mesh {ty}x{tx}")
    f = _conv2d_sharded_fn(mesh, h, w, kh, kw, int(ay), int(ax), border)
    return f(jax.device_put(img, NamedSharding(mesh, SPEC)), kernel)


def filterer_sharded(img, kernel, mesh: Mesh, mirroring: bool = False):
    """Distributed reference ``Filterer`` (ImgLibrary.cpp:408-464, the
    OMP row loop at :445-447)."""
    return conv2d_sharded(img, kernel, mesh,
                          border=bd.MIRROR if mirroring else bd.ZERO,
                          flip=True)


def gaussian_filter_sharded(img, size_wh, sigma: float, mesh: Mesh):
    """Distributed reference ``Gaussian`` (ImgLibrary.cpp:124-244, OMP
    at :223-225): same kernel builder, zero-pad borders."""
    from tpuflow.ops.filters import gaussian_kernel

    k = gaussian_kernel(size_wh, sigma, jnp.asarray(img).dtype)
    return conv2d_sharded(img, k, mesh, border=bd.ZERO, flip=False)


@functools.lru_cache(maxsize=64)
def _epsilon_sharded_fn(mesh: Mesh, h: int, w: int, fw: int, fh: int,
                        epsilon: float):
    w2, h2 = fw // 2, fh // 2
    r = max(w2, h2, 1)

    def body(img_t):
        th, tw = img_t.shape
        iy = lax.axis_index("ty")
        ix = lax.axis_index("tx")
        pz = halo_pad_2d_border(img_t, r, bd.ZERO, iy, ix, h, w)
        pm = halo_pad_2d_border(img_t, r, bd.MIRROR, iy, ix, h, w)
        pz = pz[r - h2 : r - h2 + th + fh - 1,
                r - w2 : r - w2 + tw + fw - 1]
        pm = pm[r - h2 : r - h2 + th + fh - 1,
                r - w2 : r - w2 + tw + fw - 1]
        acc = jnp.zeros_like(img_t)
        # Same unrolled accumulation order as ops.filters.epsilon_filter.
        for fy in range(fh):
            for fx in range(fw):
                nz = lax.dynamic_slice(pz, (fy, fx), (th, tw))
                nm = lax.dynamic_slice(pm, (fy, fx), (th, tw))
                take = jnp.abs(img_t - nz) <= epsilon
                acc = acc + jnp.where(take, nm, img_t)
        return acc / (fw * fh)

    return jax.jit(shard_map(body, mesh, in_specs=(SPEC,), out_specs=SPEC))


def epsilon_filter_sharded(img, size_wh, epsilon: float, mesh: Mesh):
    """Distributed reference ``EpsilonFilter`` (ImgLibrary.cpp:58-121,
    OMP at :97-99) — bit-identical window accumulation per tile."""
    img = jnp.asarray(img)
    fw, fh = size_wh
    if fw % 2 == 0 or fh % 2 == 0 or fw <= 0 or fh <= 0:
        raise ValueError("epsilon filter size must be odd and positive")
    h, w = img.shape
    ty, tx = mesh.devices.shape
    if h % ty or w % tx:
        raise ValueError(f"image {h}x{w} not divisible by mesh {ty}x{tx}")
    f = _epsilon_sharded_fn(mesh, h, w, int(fw), int(fh), float(epsilon))
    return f(jax.device_put(img, NamedSharding(mesh, SPEC)))


@functools.lru_cache(maxsize=32)
def _hmedian_sharded_fn(mesh: Mesh, h: int, w: int, width: int):
    lo = width // 2
    hi = (width - 1) // 2
    k = lo + hi + 1
    r = max(lo, hi, 1)

    def body(img_t):
        th, tw = img_t.shape
        iy = lax.axis_index("ty")
        ix = lax.axis_index("tx")
        col0 = ix * tw
        p = halo_pad_2d_border(img_t, r, bd.ZERO, iy, ix, h, w)
        p = p[r : r + th, r - hi : r - hi + tw + k - 1]
        big = jnp.asarray(jnp.inf, img_t.dtype)
        cols = jnp.stack(
            [lax.dynamic_slice(p, (0, i), (th, tw)) for i in range(k)],
            axis=-1)
        x = col0 + jnp.arange(tw)  # GLOBAL columns gate the window
        off = jnp.arange(k) - hi
        valid = ((x[:, None] + off[None, :] >= 0)
                 & (x[:, None] + off[None, :] < w))
        cols = jnp.where(valid[None, :, :], cols, big)
        srt = jnp.sort(cols, axis=-1)
        L = jnp.sum(valid, axis=-1)
        mid_hi = L // 2
        mid_lo = (L - 1) // 2
        g_hi = jnp.take_along_axis(
            srt, jnp.broadcast_to(mid_hi[None, :, None], (th, tw, 1)),
            axis=-1)[..., 0]
        g_lo = jnp.take_along_axis(
            srt, jnp.broadcast_to(mid_lo[None, :, None], (th, tw, 1)),
            axis=-1)[..., 0]
        return 0.5 * (g_hi + g_lo)

    return jax.jit(shard_map(body, mesh, in_specs=(SPEC,), out_specs=SPEC))


def horizontal_median_sharded(img, width: int, mesh: Mesh):
    """Distributed :func:`tpuflow.ops.filters.horizontal_median`
    (HorizontalMedian, ImgLibrary.cpp:8-55): the one-sided window
    shrink follows GLOBAL column coordinates."""
    img = jnp.asarray(img)
    h, w = img.shape
    ty, tx = mesh.devices.shape
    if h % ty or w % tx:
        raise ValueError(f"image {h}x{w} not divisible by mesh {ty}x{tx}")
    f = _hmedian_sharded_fn(mesh, h, w, int(width))
    return f(jax.device_put(img, NamedSharding(mesh, SPEC)))


@functools.lru_cache(maxsize=32)
def _hog_match_sharded_fn(mesh: Mesh, h: int, w: int, per_dev: int):
    n_dev = int(np.prod(mesh.devices.shape))

    def body(prv_t, cur_t, offs_t):
        dt = prv_t.dtype
        ep = 1.0e-6
        big = jnp.asarray(1.0e10, dt)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]

        def step(k, carry):
            # Same per-offset update as the single-chip hog_matching.
            d1, d2, bx, by = carry
            yc = offs_t[0, k, 0]
            xc = offs_t[0, k, 1]
            shifted = jnp.roll(cur_t, shift=(-yc, -xc), axis=(0, 1))
            valid = ((ys + yc >= 0) & (ys + yc < h)
                     & (xs + xc >= 0) & (xs + xc < w))
            diff = prv_t - shifted
            dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
            dist = jnp.where(valid, dist, big)
            better1 = dist < d1
            better2 = jnp.logical_and(~better1, dist < d2)
            d2 = jnp.where(better1, d1, jnp.where(better2, dist, d2))
            d1 = jnp.where(better1, dist, d1)
            bx = jnp.where(better1, xc.astype(dt), bx)
            by = jnp.where(better1, yc.astype(dt), by)
            return d1, d2, bx, by

        z = jnp.zeros((h, w), dt)
        loc = lax.fori_loop(0, per_dev, step,
                            (jnp.full((h, w), big), jnp.full((h, w), big),
                             z, z))
        # (n_dev, h, w) partial top-2 tables in global enumeration order
        # (contiguous offset slices): a sequential in-order merge keeps
        # the reference's first-better-wins tie semantics.
        g1, g2, gx, gy = (lax.all_gather(a, ("ty", "tx")) for a in loc)

        def merge(k, carry):
            d1, d2, bx, by = carry
            p1, p2 = g1[k], g2[k]
            better1 = p1 < d1
            d2 = jnp.where(better1, jnp.minimum(d1, p2),
                           jnp.minimum(d2, p1))
            d1 = jnp.where(better1, p1, d1)
            bx = jnp.where(better1, gx[k], bx)
            by = jnp.where(better1, gy[k], by)
            return d1, d2, bx, by

        d1, d2, bx, by = lax.fori_loop(
            1, n_dev, merge, (g1[0], g2[0], gx[0], gy[0]))
        score = (d2 - d1) / (d1 + ep)
        return bx, by, score

    from jax.sharding import PartitionSpec as P

    rep = P()
    return jax.jit(shard_map(
        body, mesh,
        in_specs=(rep, rep, P(("ty", "tx"), None, None)),
        out_specs=(rep, rep, rep)))


def hog_matching_sharded(feat_prv, feat_cur, mesh: Mesh,
                         search_w: int = 65, search_h: int = 65):
    """Distributed HOG matching (HOG_Matching, HOG_match.cpp:9-75; the
    OMP loop at :30-32): the 65x65 candidate grid is split over the
    mesh's devices in contiguous enumeration-order slices, partial
    best/second-best tables all-gather, and an in-order merge reproduces
    the single-chip result including first-better-wins tie direction.
    Returns (u, v, score) like tpuflow.features.hog.hog_matching."""
    feat_prv = jnp.asarray(feat_prv)
    feat_cur = jnp.asarray(feat_cur)
    h, w, _ = feat_prv.shape
    n_dev = int(np.prod(mesh.devices.shape))
    ys, xs = np.meshgrid(np.arange(-(search_h // 2), search_h // 2),
                         np.arange(-(search_w // 2), search_w // 2),
                         indexing="ij")
    offs = np.stack([ys, xs], -1).reshape(-1, 2).astype(np.int32)
    per_dev = -(-offs.shape[0] // n_dev)
    pad = per_dev * n_dev - offs.shape[0]
    if pad:
        # Sentinel offsets fall outside every window -> dist = big,
        # never selected (padding must not duplicate a real candidate:
        # a duplicate would corrupt the second-best distance).
        offs = np.concatenate(
            [offs, np.full((pad, 2), max(h, w) + 1, np.int32)])
    f = _hog_match_sharded_fn(mesh, h, w, int(per_dev))
    rep_sh = NamedSharding(mesh, jax.sharding.PartitionSpec())
    offs_sh = jax.device_put(
        jnp.asarray(offs).reshape(n_dev, per_dev, 2),
        NamedSharding(mesh, jax.sharding.PartitionSpec(("ty", "tx"), None,
                                                       None)))
    return f(jax.device_put(feat_prv, rep_sh),
             jax.device_put(feat_cur, rep_sh), offs_sh)


@functools.lru_cache(maxsize=32)
def _scratch_sharded_fn(mesh: Mesh, h: int, w: int, s_med: float,
                        s_avg: float):
    from tpuflow.core.config import (
        AVE_FAR,
        PLOT_INTENSITY_MAX,
        SCRATCH_WIDTH,
    )

    half = SCRATCH_WIDTH // 2
    r = AVE_FAR

    def body(img_t, med_t):
        th, tw = img_t.shape
        iy = lax.axis_index("ty")
        ix = lax.axis_index("tx")
        col0 = ix * tw
        # Zero halo: the clamped side windows sum only in-range pixels,
        # and out-of-range halo values are exactly zero, so a fixed-tap
        # sum over the halo'd row equals the reference's shrunk window.
        p = halo_pad_2d_border(img_t, r, bd.ZERO, iy, ix, h, w)
        p = p[r : r + th, :]
        candidate = jnp.abs(img_t - med_t) >= s_med
        l_sum = jnp.zeros_like(img_t)
        r_sum = jnp.zeros_like(img_t)
        for d in range(half + 1, AVE_FAR + 1):
            l_sum = l_sum + lax.dynamic_slice(p, (0, r - d), (th, tw))
            r_sum = r_sum + lax.dynamic_slice(p, (0, r + d), (th, tw))
        xs_g = col0 + jnp.arange(tw)
        la = jnp.maximum(0, xs_g - AVE_FAR)
        lb = xs_g - half - 1
        l_cnt = jnp.maximum(lb - la + 1, 0)
        ra = xs_g + half + 1
        rb = jnp.minimum(w - 1, xs_g + AVE_FAR)
        r_cnt = jnp.maximum(rb - ra + 1, 0)
        ok = (l_cnt > 0) & (r_cnt > 0)
        il = l_sum / jnp.maximum(l_cnt, 1)[None, :]
        ir = r_sum / jnp.maximum(r_cnt, 1)[None, :]
        confirmed = candidate & ok[None, :] & (jnp.abs(il - ir) <= s_avg)
        return jnp.where(confirmed, float(PLOT_INTENSITY_MAX),
                         0.0).astype(img_t.dtype)

    return jax.jit(shard_map(body, mesh, in_specs=(SPEC, SPEC),
                             out_specs=SPEC))


def detect_scratch_sharded(img, mesh: Mesh, s_med: float = 3.0,
                           s_avg: float = 20.0, filter_param=None,
                           do_detection: bool = True):
    """Distributed DetectScratch (Detection.cpp:7-132, the OMP row loop
    at :95-97): sharded prefilter + horizontal median + side-average
    test, same decisions as :func:`tpuflow.detection.scratch.
    detect_scratch` (side sums accumulate in tap order instead of the
    single-chip cumsum differences — exact for integer-valued frames).
    Returns (scratch_map, filtered_img)."""
    from tpuflow.core.config import (
        FILTER_ID_EPSILON,
        FILTER_ID_GAUSSIAN,
        MEAN_WIDTH,
    )

    img = jnp.asarray(img)
    h, w = img.shape
    filtered = img
    if filter_param is not None:
        if filter_param.type == FILTER_ID_EPSILON:
            filtered = epsilon_filter_sharded(
                img, filter_param.size, filter_param.epsilon, mesh)
        elif filter_param.type == FILTER_ID_GAUSSIAN:
            filtered = gaussian_filter_sharded(
                img, filter_param.size, filter_param.std_deviation, mesh)
    if not do_detection:
        return filtered, filtered
    med = horizontal_median_sharded(filtered, MEAN_WIDTH, mesh)
    f = _scratch_sharded_fn(mesh, h, w, float(s_med), float(s_avg))
    sharding = NamedSharding(mesh, SPEC)
    out = f(jax.device_put(filtered, sharding),
            jax.device_put(med, sharding))
    return out, filtered
