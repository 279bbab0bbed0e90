"""Separable 2-D convolution as a Pallas TPU kernel.

XLA's convolution lowering on the target chip is pathologically slow for
the image-filter shapes this framework lives on (a 100-iteration 5x5
Horn-Schunck at 1080p runs ~2.4 s as XLA ops; Farneback's 48-tap blur
makes the streaming config ~12 s/frame). This kernel is the generic fast
path behind :func:`tpuflow.ops.filters.sep_conv2d` on TPU:

- the caller pads for border policy exactly as the jnp path does (so the
  result is bit-comparable), then the kernel runs a VALID separable
  correlation: rows pass (ky taps over sublane offsets) into a VMEM
  scratch value, then columns pass (kx taps over lane offsets);
- tiling: output tiles (tile_h, tile_w); each grid step DMAs the
  (tile + taps - 1) input window with (8, 128)-aligned margins and writes
  the exact output tile;
- kernels taps are static Python floats — fully unrolled multiply-adds on
  the VPU (2*(ky+kx) ops/pixel instead of ky*kx MACs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _win_sum_axis(a, n: int, axis: int, out_len: int):
    """VALID sliding-window sum of width ``n`` along ``axis`` via log2
    doubling: ~2*log2(n) shifted adds instead of n-1. For the big box
    blurs (Farneback winsize 48) the naive tap loop's 47 misaligned
    slices dominate the kernel; doubling cuts them to ~7."""
    def sl(x, start: int, length: int):
        if axis == 0:
            return x[start : start + length, :]
        return x[:, start : start + length]

    result = None
    off = 0
    cur = a
    bit = 1
    nn = n
    while nn:
        if nn & 1:
            piece = sl(cur, off, out_len)
            result = piece if result is None else result + piece
            off += bit
        nn >>= 1
        if nn:
            newlen = cur.shape[axis] - bit
            cur = sl(cur, 0, newlen) + sl(cur, bit, newlen)
            bit *= 2
    return result


def _sep_pass(a, taps: tuple, axis: int, out_len: int):
    """One separable correlation pass; uniform taps (box kernels) route
    through the doubling window sum."""
    n = len(taps)
    if n >= 8 and len(set(taps)) == 1:
        return taps[0] * _win_sum_axis(a, n, axis, out_len)
    out = None
    for d in range(n):
        piece = (a[d : d + out_len, :] if axis == 0
                 else a[:, d : d + out_len])
        term = taps[d] * piece
        out = term if out is None else out + term
    return out


def _sep_kernel(in_hbm, out_ref, scratch, sems,
                *, tile_h: int, tile_w: int, ky: tuple, kx: tuple,
                m_y: int, m_x: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nky = len(ky)
    nkx = len(kx)
    hh = tile_h + m_y
    hw = tile_w + m_x
    c = pltpu.make_async_copy(
        in_hbm.at[pl.ds(i * tile_h, hh), pl.ds(j * tile_w, hw)],
        scratch, sems)
    c.start()
    c.wait()

    a = scratch[0 : tile_h + nky - 1, 0 : tile_w + nkx - 1]
    rows = _sep_pass(a, ky, 0, tile_h)
    out_ref[:] = _sep_pass(rows, kx, 1, tile_w)


@functools.partial(
    jax.jit,
    static_argnames=("ky", "kx", "tile_h", "tile_w", "interpret"))
def sep_conv2d_valid_pallas(
    padded: jnp.ndarray,
    ky: tuple,
    kx: tuple,
    tile_h: int = 256,
    tile_w: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """VALID separable correlation of a pre-padded (Hp, Wp) image.

    Returns (Hp - len(ky) + 1, Wp - len(kx) + 1). ``ky``/``kx`` are
    tuples of Python floats (static).
    """
    hp, wp = padded.shape
    dt = padded.dtype
    nky = len(ky)
    nkx = len(kx)
    ho = hp - nky + 1
    wo = wp - nkx + 1
    tile_h = min(tile_h, _cdiv(ho, 8) * 8)
    tile_w = min(tile_w, _cdiv(wo, 128) * 128)
    n_i = _cdiv(ho, tile_h)
    n_j = _cdiv(wo, tile_w)
    hop = n_i * tile_h
    wop = n_j * tile_w
    # Aligned DMA margins covering the (taps - 1) window overhang.
    m_y = _cdiv(nky - 1, 8) * 8
    m_x = _cdiv(nkx - 1, 128) * 128
    # Grow the padded input so every tile's window slice is in range.
    in_arr = jnp.pad(padded, ((0, hop + m_y - hp), (0, wop + m_x - wp)))

    kern = functools.partial(_sep_kernel, tile_h=tile_h, tile_w=tile_w,
                             ky=ky, kx=kx, m_y=m_y, m_x=m_x)
    out = pl.pallas_call(
        kern,
        grid=(n_i, n_j),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hop, wop), dt),
        scratch_shapes=[pltpu.VMEM((tile_h + m_y, tile_w + m_x), dt),
                        pltpu.SemaphoreType.DMA],
        # XLA's scoped-vmem assignment tries to park the whole operand +
        # result of mid-sized custom calls in VMEM and trips its 16 MB
        # stack budget; raise the cap so assignment succeeds (the kernel
        # itself only ever holds one tile + margins).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(in_arr)
    return out[:ho, :wo]
