"""Mean-shift filtering as a VMEM-resident Pallas TPU kernel.

The XLA formulation (tpuflow/segmentation/meanshift.py
``mean_shift_filter``) iterates iters x (2E+1)^2 static offsets; each
offset's slice + kernel tests + 7 accumulator updates round-trip the
~28 MB carry set through HBM, which bounds the filter at ~1.1 s/frame at
KITTI res on the v5e even with an 8x unrolled loop. Here the whole
halo'd Lab tile and every carry live in VMEM for the full run — the
offset loop reads the ORIGINAL frame only (mean-shift queries track
modes, data points never move), so tiles are embarrassingly parallel
with a one-time E-halo and ZERO HBM traffic between offsets.

The shifted read is two hardware cyclic rotations (pltpu.roll, dynamic
shifts) + a static core slice: wrap garbage stays inside the halo
margin (halo >= E), exactly like the HS roll kernel
(tpuflow/kernels/hs_stencil.py). Math is identical to the jnp filter
(flat kernels, same accumulation order over the offset grid) — pinned
by an interpret-mode equivalence test. NOTE: this kernel sweeps the
full (2E+1)^2 square while the jnp filter sweeps the banded disc
(meanshift._ms_bands); the two differ only at out-of-contract
(drift > margin) outlier queries, where both windows are truncated
approximations — the pinned test's in-contract data is bitwise-equal
either way.

Reference behavior: Segmentation<Lab> construction
(OpticalFlow_BlockMatching.cpp:122-135; SURVEY.md §2.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ms_kernel(l0_hbm, l1_hbm, l2_hbm,
               px_ref, py_ref, c0_ref, c1_ref, c2_ref,
               l0s, l1s, l2s, sems,
               *, tile_h: int, tile_w: int, halo_y: int, halo_x: int,
               E: int, iters: int, hs2: float, hr2: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = i * tile_h
    col0 = j * tile_w
    hh = tile_h + 2 * halo_y
    hw = tile_w + 2 * halo_x

    copies = []
    for idx, (src, dst) in enumerate(
            ((l0_hbm, l0s), (l1_hbm, l1s), (l2_hbm, l2s))):
        c = pltpu.make_async_copy(
            src.at[pl.ds(row0, hh), pl.ds(col0, hw)], dst, sems.at[idx])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    dt = l0s.dtype
    core = (slice(halo_y, halo_y + tile_h),
            slice(halo_x, halo_x + tile_w))
    l0 = l0s[:]
    l1 = l1s[:]
    l2 = l2s[:]
    # Global (x, y) of every core pixel (only used outside the offset
    # loop: the state carries the DRIFT from the origin, matching the
    # jnp filter's accumulation algebra bitwise).
    xs = (col0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
          ).astype(dt)
    ys = (row0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
          ).astype(dt)
    n_off = (2 * E + 1) * (2 * E + 1)
    span = 2 * E + 1

    def one_iter(_, state):
        ex, ey, c0, c1, c2 = state

        def body(k, acc):
            s_dx, s_dy, s_n, s0, s1, s2 = acc
            dy = k // span - E
            dx = k % span - E
            # Shifted original frame: cyclic rotations + static core
            # slice (wrap garbage stays in the halo margin; the
            # out-of-image border carries the color sentinel, so no
            # validity mask is needed — mirrors the jnp filter).
            sh_y = (-dy) % hh
            sh_x = (-dx) % hw
            q0 = pltpu.roll(pltpu.roll(l0, sh_y, 0), sh_x, 1)[core]
            q1 = pltpu.roll(pltpu.roll(l1, sh_y, 0), sh_x, 1)[core]
            q2 = pltpu.roll(pltpu.roll(l2, sh_y, 0), sh_x, 1)[core]
            dxf = dx.astype(dt)
            dyf = dy.astype(dt)
            d_sp = (dxf - ex) ** 2 + (dyf - ey) ** 2
            d_cl = (q0 - c0) ** 2 + (q1 - c1) ** 2 + (q2 - c2) ** 2
            wgt = jnp.where((d_sp <= hs2) & (d_cl <= hr2),
                            1.0, 0.0).astype(dt)
            return (s_dx + wgt * dxf, s_dy + wgt * dyf, s_n + wgt,
                    s0 + wgt * q0, s1 + wgt * q1, s2 + wgt * q2)

        z = jnp.zeros((tile_h, tile_w), dt)
        s_dx, s_dy, s_n, s0, s1, s2 = jax.lax.fori_loop(
            0, n_off, body, (z, z, z, z, z, z))
        n = jnp.maximum(s_n, 1.0)
        got = s_n > 0
        return (jnp.where(got, s_dx / n, -xs),
                jnp.where(got, s_dy / n, -ys),
                s0 / n, s1 / n, s2 / n)

    z0 = jnp.zeros((tile_h, tile_w), dt)
    state0 = (z0, z0, l0[core], l1[core], l2[core])
    ex, ey, c0, c1, c2 = jax.lax.fori_loop(0, iters, one_iter, state0)
    px_ref[:] = xs + ex
    py_ref[:] = ys + ey
    c0_ref[:] = c0
    c1_ref[:] = c1
    c2_ref[:] = c2


@functools.partial(
    jax.jit,
    static_argnames=("kernel_spatial", "kernel_intensity", "iters",
                     "margin", "tile_h", "tile_w", "interpret"))
def mean_shift_filter_pallas(
    lab: jnp.ndarray,
    kernel_spatial: int = 20,
    kernel_intensity: float = 16.0 / 255.0,
    iters: int = 8,
    margin: int | None = None,
    tile_h: int = 512,
    tile_w: int = 1280,
    interpret: bool = False,
):
    """Drop-in for :func:`tpuflow.segmentation.meanshift.mean_shift_filter`
    (same (pos, color) contract) with the whole offset x iteration loop
    VMEM-resident per tile."""
    h, w = lab.shape[:2]
    dt = lab.dtype
    R = int(kernel_spatial)
    M = R if margin is None else int(margin)
    E = R + M
    tile_h = min(tile_h, _cdiv(h, 8) * 8)
    tile_w = min(tile_w, _cdiv(w, 128) * 128)
    n_i = _cdiv(h, tile_h)
    n_j = _cdiv(w, tile_w)
    hp = n_i * tile_h
    wp = n_j * tile_w
    halo_y = _cdiv(E, 4) * 4
    halo_x = _cdiv(E, 64) * 64

    # The out-of-image border carries the same color sentinel as the jnp
    # filter (farther than the color radius from every real value), so
    # out-of-image data points weigh 0 with no per-offset validity mask.
    from tpuflow.segmentation.meanshift import _color_sentinel

    sentinel = _color_sentinel(lab, float(kernel_intensity))

    def pad_h(a):
        return jnp.pad(a, ((halo_y, hp - h + halo_y),
                           (halo_x, wp - w + halo_x)),
                       constant_values=sentinel)

    chans = [pad_h(lab[..., c]) for c in range(3)]
    hh = tile_h + 2 * halo_y
    hw = tile_w + 2 * halo_x
    kern = functools.partial(
        _ms_kernel, tile_h=tile_h, tile_w=tile_w, halo_y=halo_y,
        halo_x=halo_x, E=E, iters=int(iters),
        hs2=float(kernel_spatial) ** 2, hr2=float(kernel_intensity) ** 2)
    any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    out_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(n_i, n_j),
        in_specs=[any_spec] * 3,
        out_specs=(out_spec,) * 5,
        out_shape=tuple(jax.ShapeDtypeStruct((hp, wp), dt)
                        for _ in range(5)),
        scratch_shapes=[pltpu.VMEM((hh, hw), dt)] * 3
        + [pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*chans)
    px, py, c0, c1, c2 = (o[:h, :w] for o in outs)
    return (jnp.stack([px, py], axis=-1),
            jnp.stack([c0, c1, c2], axis=-1))
