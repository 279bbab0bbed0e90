"""Fused Farneback aggregation + solve as one Pallas TPU kernel.

The Farneback displacement update (solvers/farneback.py, after OpenCV's
FarnebackUpdateFlow_Blur) box-averages the 5-channel normal-equation
field M over winsize^2 and solves a per-pixel 2x2 system. As separate
ops that is 10 sep-conv dispatches + a 5-frame intermediate round-trip
per iteration; this kernel does the whole thing in ONE pallas_call:

- the caller CLAMP-pads M by winsize//2 exactly like
  ``tpuflow.solvers.farneback._blur_same`` (bit-comparable semantics,
  including the even-winsize crop);
- each grid step DMAs the 5 halo'd channel tiles (one 3-D DMA), runs a
  VALID sliding box *sum* per channel, and solves for (u, v) in-register;
- the sliding sum is block-decomposed: K-tap windows build from 8-tap
  partial sums (~(8-1) + K/8 adds per axis instead of K-1 — a ~4x VPU
  saving at the streaming demo's winsize 48, DenseFlow.cpp:37).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _sliding_sum_rows(a: jnp.ndarray, K: int, n_out: int) -> jnp.ndarray:
    """out[i, :] = sum_{d<K} a[i+d, :] via 8-tap block partial sums."""
    B = 8 if K >= 16 else K
    q, rem = divmod(K, B)
    n_s = n_out + (q - 1) * B
    s = a[0:n_s, :]
    for d in range(1, B):
        s = s + a[d : d + n_s, :]
    out = s[0:n_out, :]
    for b in range(1, q):
        out = out + s[b * B : b * B + n_out, :]
    for d in range(rem):
        out = out + a[q * B + d : q * B + d + n_out, :]
    return out


def _sliding_sum_cols(a: jnp.ndarray, K: int, n_out: int) -> jnp.ndarray:
    B = 8 if K >= 16 else K
    q, rem = divmod(K, B)
    n_s = n_out + (q - 1) * B
    s = a[:, 0:n_s]
    for d in range(1, B):
        s = s + a[:, d : d + n_s]
    out = s[:, 0:n_out]
    for b in range(1, q):
        out = out + s[:, b * B : b * B + n_out]
    for d in range(rem):
        out = out + a[:, q * B + d : q * B + d + n_out]
    return out


def _fb_kernel(m_hbm, u_ref, v_ref, ms, sems,
               *, tile_h: int, tile_w: int, halo_y: int, halo_x: int,
               winsize: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    hh = tile_h + halo_y
    hw = tile_w + halo_x
    c = pltpu.make_async_copy(
        m_hbm.at[:, pl.ds(i * tile_h, hh), pl.ds(j * tile_w, hw)],
        ms, sems)
    c.start()
    c.wait()

    inv_area = jnp.asarray(1.0 / (winsize * winsize), ms.dtype)
    blurred = []
    for ch in range(5):
        a = ms[ch, 0 : tile_h + winsize - 1, 0 : tile_w + winsize - 1]
        rows = _sliding_sum_rows(a, winsize, tile_h)
        blurred.append(_sliding_sum_cols(rows, winsize, tile_w) * inv_area)
    m11, m12, m22, h1, h2 = blurred
    det = m11 * m22 - m12 * m12
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
    u_ref[:] = (m22 * h1 - m12 * h2) / det
    v_ref[:] = (m11 * h2 - m12 * h1) / det


@functools.partial(
    jax.jit,
    static_argnames=("winsize", "tile_h", "tile_w", "interpret"))
def fb_blur_solve_pallas(
    m_padded: jnp.ndarray,
    winsize: int,
    tile_h: int = 256,
    tile_w: int = 512,
    interpret: bool = False,
):
    """(5, Hp, Wp) CLAMP-padded M -> (u, v) of shape (Hp - 2*(w//2), ...)
    cropped like ``_blur_same`` (first Hp - winsize + 1 VALID rows; the
    caller passes Hp = H + 2*(winsize//2), so output is (H[+1 even])
    cropped to H outside). Returns (u, v)."""
    _, hp, wp = m_padded.shape
    dt = m_padded.dtype
    ho = hp - winsize + 1
    wo = wp - winsize + 1
    tile_h = min(tile_h, _cdiv(ho, 8) * 8)
    tile_w = min(tile_w, _cdiv(wo, 128) * 128)
    n_i = _cdiv(ho, tile_h)
    n_j = _cdiv(wo, tile_w)
    hop = n_i * tile_h
    wop = n_j * tile_w
    halo_y = _cdiv(winsize - 1, 8) * 8
    halo_x = _cdiv(winsize - 1, 128) * 128
    m_in = jnp.pad(m_padded, ((0, 0), (0, hop + halo_y - hp),
                              (0, wop + halo_x - wp)))

    kern = functools.partial(_fb_kernel, tile_h=tile_h, tile_w=tile_w,
                             halo_y=halo_y, halo_x=halo_x, winsize=winsize)
    out_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    u, v = pl.pallas_call(
        kern,
        grid=(n_i, n_j),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((hop, wop), dt),
                   jax.ShapeDtypeStruct((hop, wop), dt)),
        scratch_shapes=[
            pltpu.VMEM((5, tile_h + halo_y, tile_w + halo_x), dt),
            pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(m_in)
    return u[:ho, :wo], v[:ho, :wo]


def _fb_poly_kernel(img_hbm, b1_ref, b2_ref, a11_ref, a22_ref, a12_ref,
                    scratch, sems,
                    *, tile_h: int, tile_w: int, halo_y: int, halo_x: int,
                    g: tuple, gx: tuple, gxx: tuple, ginv: tuple):
    """All six separable Gaussian moments + the G^-1 combination of the
    Farneback polynomial expansion (solvers/farneback.py poly_expansion)
    in one pass: 3 row convolutions feed 6 column convolutions feed the
    static 6x6 inverse — the image is read ONCE per tile instead of once
    per moment (6 sep-conv dispatches before)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    taps = len(g)
    hh = tile_h + halo_y
    hw = tile_w + halo_x
    c = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * tile_h, hh), pl.ds(j * tile_w, hw)],
        scratch, sems)
    c.start()
    c.wait()

    a = scratch[0 : tile_h + taps - 1, 0 : tile_w + taps - 1]

    def rows_pass(k):
        out = None
        for d in range(taps):
            t = k[d] * a[d : d + tile_h, :]
            out = t if out is None else out + t
        return out

    def cols_pass(rows, k):
        out = None
        for d in range(taps):
            t = k[d] * rows[:, d : d + tile_w]
            out = t if out is None else out + t
        return out

    rows_g = rows_pass(g)
    rows_gx = rows_pass(gx)
    rows_gxx = rows_pass(gxx)
    # Basis order [1, x, y, x^2, y^2, xy]; m(ky, kx) = rows(ky) cols(kx).
    m = (cols_pass(rows_g, g),     # m00
         cols_pass(rows_g, gx),    # m10 (x moment)
         cols_pass(rows_gx, g),    # m01 (y moment)
         cols_pass(rows_g, gxx),   # m20
         cols_pass(rows_gxx, g),   # m02
         cols_pass(rows_gx, gx))   # m11
    outs = (b1_ref, b2_ref, a11_ref, a22_ref, a12_ref)
    # ginv rows j = 1..5 of G^-1 (row 0 — the constant term — unused),
    # with the a12 row pre-scaled by 0.5.
    for o, row in zip(outs, ginv):
        acc = None
        for k in range(6):
            if row[k] == 0.0:
                continue
            t = row[k] * m[k]
            acc = t if acc is None else acc + t
        o[:] = acc if acc is not None else jnp.zeros_like(m[0])


@functools.partial(
    jax.jit,
    static_argnames=("g", "gx", "gxx", "ginv", "tile_h", "tile_w",
                     "interpret"))
def fb_poly_expansion_pallas(
    img_padded: jnp.ndarray,
    g: tuple,
    gx: tuple,
    gxx: tuple,
    ginv: tuple,
    tile_h: int = 256,
    tile_w: int = 512,
    interpret: bool = False,
):
    """(Hp, Wp) CLAMP-padded image -> (b1, b2, a11, a22, a12), each
    (Hp - taps + 1, Wp - taps + 1). ``g``/``gx``/``gxx`` are the static
    applicability taps; ``ginv`` is a 5-tuple of 6-float rows: rows
    1, 2, 3, 4 and 0.5x row 5 of G^-1 (the b1/b2/a11/a22/a12
    combinations)."""
    hp, wp = img_padded.shape
    dt = img_padded.dtype
    taps = len(g)
    ho = hp - taps + 1
    wo = wp - taps + 1
    tile_h = min(tile_h, _cdiv(ho, 8) * 8)
    tile_w = min(tile_w, _cdiv(wo, 128) * 128)
    n_i = _cdiv(ho, tile_h)
    n_j = _cdiv(wo, tile_w)
    hop = n_i * tile_h
    wop = n_j * tile_w
    halo_y = _cdiv(taps - 1, 8) * 8
    halo_x = _cdiv(taps - 1, 128) * 128
    img_in = jnp.pad(img_padded, ((0, hop + halo_y - hp),
                                  (0, wop + halo_x - wp)))

    kern = functools.partial(_fb_poly_kernel, tile_h=tile_h, tile_w=tile_w,
                             halo_y=halo_y, halo_x=halo_x,
                             g=g, gx=gx, gxx=gxx, ginv=ginv)
    out_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((hop, wop), dt)
    outs = pl.pallas_call(
        kern,
        grid=(n_i, n_j),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=(out_spec,) * 5,
        out_shape=(shp,) * 5,
        scratch_shapes=[
            pltpu.VMEM((tile_h + halo_y, tile_w + halo_x), dt),
            pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(img_in)
    return tuple(o[:ho, :wo] for o in outs)
