"""Fused Horn-Schunck Jacobi sweep as a Pallas TPU kernel.

The demo solver (HornSchunckOF/hornSchunck.cpp:43-75) iterates

    ub = box_{W x W}(u)          (BORDER_CONSTANT zeros)
    upd = (gx*ub + gy*vb + gt) / (alpha^2 + gx^2 + gy^2)
    u   = ub - gx * upd,   v = vb - gy * upd

100 times over the whole frame. Expressed one-XLA-op-per-iteration this
reads/writes ~6 full frames of HBM per iteration; the kernel below fuses
``fuse`` iterations per HBM round-trip:

- the image is padded to tile multiples plus a ``halo = fuse * r`` ring
  (r = window radius), all six fields live in HBM (memory_space ANY);
- each grid step DMAs the halo'd tile of every field into VMEM scratch,
  runs ``fuse`` sweeps with statically shrinking valid regions (each sweep
  consumes an r-ring), and writes the exact (tile_h, tile_w) core through
  a regular blocked output spec;
- BORDER_CONSTANT semantics: an inside-image mask (from global tile
  coordinates) re-zeroes u, v outside the frame after every sweep, so
  border pixels always see zeros beyond the edge — bitwise the same
  Jacobi iteration as the reference, tile boundaries included.

The separable box sum is 2*(W-1) shifted adds on the VPU; per fused block
the kernel streams each field once, so HBM traffic drops by ~``fuse``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _box_valid(a: jnp.ndarray, taps: int) -> jnp.ndarray:
    """Separable box *sum* over taps x taps; output shrinks by taps-1."""
    h, w = a.shape
    rows = a[0 : h - taps + 1, :]
    for d in range(1, taps):
        rows = rows + a[d : h - taps + 1 + d, :]
    out = rows[:, 0 : w - taps + 1]
    for d in range(1, taps):
        out = out + rows[:, d : w - taps + 1 + d]
    return out


def _band_matrix(hw: int, taps: int, dtype) -> jnp.ndarray:
    """Banded (hw, hw - taps + 1) 0/1 matrix B with B[i, j] = (0 <= i - j
    < taps): `rows @ B` is the horizontal valid box sum. The band depends
    only on i - j, so the top-left submatrix of a wider band is the band
    for a narrower input — build once per tile, slice per sweep."""
    wo = hw - taps + 1
    ii = jax.lax.broadcasted_iota(jnp.int32, (hw, wo), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (hw, wo), 1)
    d = ii - jj
    return ((d >= 0) & (d < taps)).astype(dtype)


def _box_valid_mxu(a: jnp.ndarray, taps: int, band: jnp.ndarray):
    """Valid box sum with the horizontal pass as a banded matmul.

    The lane-dimension shifted adds of :func:`_box_valid` each cost a
    Mosaic relayout copy — measured to be what bounds the fused HS kernel
    (BASELINE.md: fuse-halving costs only +10%, full DMA overlap gains
    2%). The MXU multiplies by the static band instead: no lane shifts,
    and the row sums ride the systolic array."""
    h, w = a.shape
    rows = a[0 : h - taps + 1, :]
    for d in range(1, taps):
        rows = rows + a[d : h - taps + 1 + d, :]
    wo = w - taps + 1
    return jax.lax.dot_general(
        rows, band[:w, :wo], (((1,), (0,)), ((), ())),
        preferred_element_type=rows.dtype)


def _box_sum_roll(a: jnp.ndarray, taps: int) -> jnp.ndarray:
    """Centered cyclic box *sum*: out[i, j] = sum over the taps x taps
    window around (i, j) with wrap-around indexing, built from hardware
    lane/sublane rotations (pltpu.roll) — no shrinking slices, so Mosaic
    inserts no relayout copies. Wrap garbage stays within a radius-r ring
    of the array edge per application."""
    h, w = a.shape
    r = taps // 2
    rows = a
    for d in range(1, r + 1):
        rows = rows + pltpu.roll(a, d, 0) + pltpu.roll(a, h - d, 0)
    out = rows
    for d in range(1, r + 1):
        out = out + pltpu.roll(rows, d, 1) + pltpu.roll(rows, w - d, 1)
    return out


def _box_sum_roll2(a: jnp.ndarray, forward: bool) -> jnp.ndarray:
    """5-tap cyclic box *sum* in TWO-STAGE form: pairs, quads, +1 tail —
    3 rolls + 3 adds per axis instead of the classic 4 + 4
    (:func:`_box_sum_roll`), at the price of a CONSTANT 2-px result
    drift per axis (content rolled toward lower indices for
    ``forward=True``, higher for ``forward=False``). The r4 probe
    (scripts/r4_hs_formulation_probe.py) measured the composite sweep
    ~14% faster — the sweep is op-count-bound (~20 us/op regardless of
    kind), and this is the only 5-tap op-count reduction available.

    forward: out[i] = sum a[i..i+4]  = box5_centered[i + 2]
    backward: out[i] = sum a[i-4..i] = box5_centered[i - 2]
    """
    h, w = a.shape
    if forward:
        s1 = a + pltpu.roll(a, h - 1, 0)
        s2 = s1 + pltpu.roll(s1, h - 2, 0)
        rows = s2 + pltpu.roll(a, h - 4, 0)
        s1 = rows + pltpu.roll(rows, w - 1, 1)
        s2 = s1 + pltpu.roll(s1, w - 2, 1)
        return s2 + pltpu.roll(rows, w - 4, 1)
    s1 = a + pltpu.roll(a, 1, 0)
    s2 = s1 + pltpu.roll(s1, 2, 0)
    rows = s2 + pltpu.roll(a, 4, 0)
    s1 = rows + pltpu.roll(rows, 1, 1)
    s2 = s1 + pltpu.roll(s1, 2, 1)
    return s2 + pltpu.roll(rows, 4, 1)


def _hs_sweeps_roll2(u, v, gxa, gya, gta, inva, mask_full, window: int,
                     fuse: int):
    """Two-stage ALTERNATING-DRIFT sweeps (``roll="two_stage"``,
    window == 5 only): even sweeps use the forward two-stage box (result
    drifted -2 px per axis), odd sweeps the backward one (drift returns
    to zero) — so the iteration-invariant fields need exactly ONE
    pre-drifted copy set (built once per block, ~1 op/sweep amortized)
    and the final state is undrifted whenever ``fuse`` is even (odd
    fuse pays one undrift roll pair at block end).

    Halo invariant unchanged: a sweep reaches 4 px on one side and 0 on
    the other, alternating — taint grows 4 px/side per sweep PAIR, the
    same 2 px/sweep budget as the symmetric box (halo >= fuse * r). The
    box summation ORDER differs from :func:`_hs_sweeps_roll` (pairwise
    association), so results match to float tolerance, not bitwise —
    kept as an opt-in variant with its own equivalence test."""
    if window != 5:
        raise ValueError("roll='two_stage' implements the 5-tap box only")
    h, w = u.shape

    def drift(x):
        # The forward box leaves content at R_{-2} per axis; sample the
        # invariants in that frame.
        return pltpu.roll(pltpu.roll(x, h - 2, 0), w - 2, 1)

    gxa_d = drift(gxa)
    gya_d = drift(gya)
    gta_d = drift(gta)
    inva_d = drift(inva)
    mask_d = drift(mask_full)
    inv_area = jnp.asarray(1.0 / (window * window), u.dtype)
    for k in range(fuse):
        fwd = (k % 2) == 0
        ub = _box_sum_roll2(u, fwd) * inv_area
        vb = _box_sum_roll2(v, fwd) * inv_area
        g1, g2, g3, g4, m = ((gxa_d, gya_d, gta_d, inva_d, mask_d)
                             if fwd else
                             (gxa, gya, gta, inva, mask_full))
        upd = (g1 * ub + g2 * vb + g3) * g4
        u = (ub - g1 * upd) * m
        v = (vb - g2 * upd) * m
    if fuse % 2:
        u = pltpu.roll(pltpu.roll(u, 2, 0), 2, 1)
        v = pltpu.roll(pltpu.roll(v, 2, 0), 2, 1)
    return u, v


def _hs_sweeps_roll(u, v, gxa, gya, gta, inva, mask_full, window: int,
                    fuse: int):
    """``fuse`` Jacobi sweeps with every field kept FULL-SIZE: the box
    average is cyclic (:func:`_box_sum_roll`), so wrap garbage invades an
    r-ring per sweep — exactly the ring the shrinking-slice scheme
    discards. Valid whenever the caller's halo >= fuse * r (the same
    invariant as :func:`_hs_sweeps`); the caller crops the core. The
    point: zero Mosaic relayout copies per sweep (the shrinking slices'
    misaligned lane/sublane offsets are what bound the tiled kernel —
    BASELINE.md round-2 notes)."""
    inv_area = jnp.asarray(1.0 / (window * window), u.dtype)
    for _ in range(fuse):
        ub = _box_sum_roll(u, window) * inv_area
        vb = _box_sum_roll(v, window) * inv_area
        upd = (gxa * ub + gya * vb + gta) * inva
        u = (ub - gxa * upd) * mask_full
        v = (vb - gya * upd) * mask_full
    return u, v


def _hs_sweeps_roll_batched(u, v, gxa, gya, gta, inva, mask_full,
                            window: int, fuse: int):
    """:func:`_hs_sweeps_roll` with u and v stacked on the sublane axis:
    one (2*hh, hw) array rides every roll/add, halving the instruction
    count of the box pass (the sweep is VPU-issue-bound, BASELINE.md).
    Cross-field wrap garbage from the cyclic rolls lands in the same
    discarded halo rings as same-field wrap garbage (block edges are the
    fields' halo margins), so the caller's halo >= fuse * r invariant is
    unchanged."""
    hh = u.shape[0]
    inv_area = jnp.asarray(1.0 / (window * window), u.dtype)
    uv = jnp.concatenate([u, v], axis=0)
    for _ in range(fuse):
        b = _box_sum_roll(uv, window) * inv_area
        ub = b[:hh]
        vb = b[hh:]
        # Pointwise update kept in the exact per-element op order of
        # :func:`_hs_sweeps_roll` (bitwise-identical results).
        upd = (gxa * ub + gya * vb + gta) * inva
        uv = jnp.concatenate([(ub - gxa * upd) * mask_full,
                              (vb - gya * upd) * mask_full], axis=0)
    return uv[:hh], uv[hh:]


def _hs_sweeps(u, v, gxa, gya, gta, inva, mask_full, window: int,
               fuse: int, mxu: bool = False):
    """``fuse`` Jacobi sweeps on a halo'd tile with statically shrinking
    valid regions; ``mask_full`` re-zeroes u, v outside the frame after
    every sweep (BORDER_CONSTANT). Inputs are (hh, hw); returns the
    (hh - 2*fuse*r, hw - 2*fuse*r) core. ``mxu`` routes the horizontal
    box pass through a banded matmul (see :func:`_box_valid_mxu`)."""
    hh, hw = u.shape
    r = window // 2
    inv_area = jnp.asarray(1.0 / (window * window), u.dtype)
    band = _band_matrix(hw, window, u.dtype) if mxu else None
    for t in range(fuse):
        o = r * (t + 1)
        sh = hh - 2 * r * (t + 1)
        sw = hw - 2 * r * (t + 1)
        if mxu:
            ub = _box_valid_mxu(u, window, band) * inv_area
            vb = _box_valid_mxu(v, window, band) * inv_area
        else:
            ub = _box_valid(u, window) * inv_area
            vb = _box_valid(v, window) * inv_area
        gxc = gxa[o : o + sh, o : o + sw]
        gyc = gya[o : o + sh, o : o + sw]
        gtc = gta[o : o + sh, o : o + sw]
        invc = inva[o : o + sh, o : o + sw]
        mc = mask_full[o : o + sh, o : o + sw]
        upd = (gxc * ub + gyc * vb + gtc) * invc
        u = (ub - gxc * upd) * mc
        v = (vb - gyc * upd) * mc
    return u, v


def _inside_mask(row0, col0, ch: int, cw: int, img_h: int, img_w: int,
                 dtype):
    """Float inside-image mask for a tile whose local (0, 0) sits at
    global (row0, col0). Materialized as FLOAT (Mosaic crashes on strided
    slices of int32 iota values — slice the float mask instead)."""
    ly = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0)
    lx = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1)
    gy_img = row0 + ly
    gx_img = col0 + lx
    return ((gy_img >= 0) & (gy_img < img_h)
            & (gx_img >= 0) & (gx_img < img_w)).astype(dtype)


def _hs_kernel(u_hbm, v_hbm, gx_hbm, gy_hbm, gt_hbm, inv_hbm,
               uo_ref, vo_ref,
               us, vs, gxs, gys, gts, invs, sems,
               *, tile_h: int, tile_w: int, halo_y: int, halo_x: int,
               need: int, window: int, fuse: int, img_h: int, img_w: int,
               mxu: bool = False, roll: bool = False):
    # halo_y/halo_x are the DMA margins (aligned to the (8, 128) memref
    # tiling Mosaic requires for HBM slices); `need` = fuse * r is the halo
    # the stencil actually consumes — the margin is cropped right after
    # load.
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = i * tile_h  # halo'd tile origin in padded coords
    col0 = j * tile_w
    hh = tile_h + 2 * halo_y
    hw = tile_w + 2 * halo_x

    copies = []
    for idx, (src, dst) in enumerate(
            ((u_hbm, us), (v_hbm, vs), (gx_hbm, gxs), (gy_hbm, gys),
             (gt_hbm, gts), (inv_hbm, invs))):
        c = pltpu.make_async_copy(
            src.at[pl.ds(row0, hh), pl.ds(col0, hw)], dst, sems.at[idx])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    if roll:
        # Full-size sweeps: no crop at load (no relayout), one static
        # core slice at the end. Wrap garbage stays within the halo
        # margin (halo >= need = fuse * r).
        mask_full = _inside_mask(row0 - halo_y, col0 - halo_x, hh, hw,
                                 img_h, img_w, us.dtype)
        u = us[:] * mask_full
        v = vs[:] * mask_full
        sweep = (_hs_sweeps_roll_batched if roll == "batched"
                 else _hs_sweeps_roll2 if roll == "two_stage"
                 else _hs_sweeps_roll)
        u, v = sweep(u, v, gxs[:], gys[:], gts[:], invs[:],
                     mask_full, window, fuse)
        uo_ref[:] = u[halo_y : halo_y + tile_h, halo_x : halo_x + tile_w]
        vo_ref[:] = v[halo_y : halo_y + tile_h, halo_x : halo_x + tile_w]
        return

    ch = tile_h + 2 * need
    cw = tile_w + 2 * need
    oy = halo_y - need
    ox = halo_x - need
    crop = (slice(oy, oy + ch), slice(ox, ox + cw))

    # Inside-image mask in cropped tile coords: image pixel (y, x) lives
    # at padded (y + halo), so cropped-local row l maps to image row
    # row0 + l - need.
    mask_full = _inside_mask(row0 - need, col0 - need, ch, cw,
                             img_h, img_w, us.dtype)

    u = us[crop] * mask_full  # halo beyond the frame must read as zero
    v = vs[crop] * mask_full
    u, v = _hs_sweeps(u, v, gxs[crop], gys[crop], gts[crop], invs[crop],
                      mask_full, window, fuse, mxu=mxu)
    uo_ref[:] = u
    vo_ref[:] = v


def _hs_tile_kernel(row0_ref, col0_ref, u_ref, v_ref, gx_ref, gy_ref,
                    gt_ref, inv_ref, uo_ref, vo_ref,
                    *, window: int, fuse: int, img_h: int, img_w: int,
                    mxu: bool = False):
    """Single-tile fused sweep for the shard_map distributed path: the
    whole halo'd tile arrives in VMEM (halos already exchanged by
    ppermute outside), global tile origin arrives as SMEM scalars."""
    row0 = row0_ref[0, 0]
    col0 = col0_ref[0, 0]
    ch, cw = u_ref.shape
    mask_full = _inside_mask(row0, col0, ch, cw, img_h, img_w, u_ref.dtype)
    u = u_ref[:] * mask_full
    v = v_ref[:] * mask_full
    u, v = _hs_sweeps(u, v, gx_ref[:], gy_ref[:], gt_ref[:], inv_ref[:],
                      mask_full, window, fuse, mxu=mxu)
    uo_ref[:] = u
    vo_ref[:] = v


def hs_tile_sweeps(u_p, v_p, gx_p, gy_p, gt_p, inv_p, row0, col0,
                   img_h: int, img_w: int, window: int, fuse: int,
                   interpret: bool = False):
    """Run ``fuse`` fused HS sweeps on one halo'd tile (the Pallas body
    of the distributed solver, tpuflow/dist/solvers.py). Inputs are
    (th + 2*fuse*r, tw + 2*fuse*r) with halos already exchanged;
    ``row0``/``col0`` are the *global* image coordinates of ``u_p[0, 0]``
    (may be traced scalars — e.g. built from lax.axis_index). Returns the
    (th, tw) core after ``fuse`` sweeps."""
    hh, hw = u_p.shape
    r = window // 2
    need = fuse * r
    dt = u_p.dtype
    kern = functools.partial(_hs_tile_kernel, window=window, fuse=fuse,
                             img_h=img_h, img_w=img_w)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        in_specs=[smem, smem] + [vspec] * 6,
        out_specs=(vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((hh - 2 * need, hw - 2 * need), dt),
                   jax.ShapeDtypeStruct((hh - 2 * need, hw - 2 * need), dt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(row0, jnp.int32).reshape(1, 1),
      jnp.asarray(col0, jnp.int32).reshape(1, 1),
      u_p, v_p, gx_p, gy_p, gt_p, inv_p)


def _hs_resident_kernel(gx_ref, gy_ref, gt_ref, uo_ref, vo_ref,
                        *, window: int, iterations: int,
                        img_h: int, img_w: int, alpha: float):
    """Whole-frame VMEM-resident solve: every field lives in VMEM for the
    entire run, the iteration loop is a lax.fori_loop inside the kernel —
    zero HBM traffic between iterations. VMEM is the binding constraint
    (v5e: 128 MB), so the box filter pads one axis at a time and the
    update denominator is recomputed per iteration rather than stored
    (3 inputs + 2 carries + ~5 transient frames ~ 90 MB at 1080p f32).
    """
    r = window // 2
    inv_area = 1.0 / (window * window)
    gx = gx_ref[:]
    gy = gy_ref[:]
    gt = gt_ref[:]
    h, w = img_h, img_w
    zc = jnp.zeros((h, r), gx.dtype)
    zr = jnp.zeros((r, w), gx.dtype)

    def box(a):
        # BORDER_CONSTANT box mean; pad per axis to keep peak VMEM low.
        ap = jnp.concatenate([zr, a, zr], axis=0)  # (h + 2r, w)
        rows = ap[0:h, :]
        for d in range(1, window):
            rows = rows + ap[d : d + h, :]
        rp = jnp.concatenate([zc, rows, zc], axis=1)  # (h, w + 2r)
        out = rp[:, 0:w]
        for d in range(1, window):
            out = out + rp[:, d : d + w]
        return out * inv_area

    uo_ref[:] = jnp.zeros((h, w), gx.dtype)
    vo_ref[:] = jnp.zeros((h, w), gx.dtype)

    def body(_, carry):
        # Mutate the output refs in place: ub/vb/upd are fully computed
        # before either ref is written, preserving Jacobi semantics while
        # avoiding a second carried frame pair (VMEM is the binding
        # constraint).
        ub = box(uo_ref[:])
        vb = box(vo_ref[:])
        upd = (gx * ub + gy * vb + gt) \
            / (alpha * alpha + gx * gx + gy * gy)
        uo_ref[:] = ub - gx * upd
        vo_ref[:] = vb - gy * upd
        return carry

    jax.lax.fori_loop(0, iterations, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("window_size", "max_iterations",
                                    "alpha", "interpret"))
def horn_schunck_pallas_resident(
    prev: jnp.ndarray,
    next: jnp.ndarray,
    window_size: int = 5,
    max_iterations: int = 100,
    alpha: float = 1.0,
    interpret: bool = False,
):
    """Horn-Schunck with the whole problem VMEM-resident (one kernel, the
    iteration loop on-chip). Valid when ~6 * H * W * 4 bytes fits VMEM
    (e.g. 1080p f32 on v5e); use :func:`horn_schunck_pallas` beyond that."""
    from tpuflow.solvers.horn_schunck import hs_gradients

    gx, gy, gt = hs_gradients(prev, next)
    dt = gx.dtype
    h, w = prev.shape

    kern = functools.partial(_hs_resident_kernel, window=window_size,
                             iterations=max_iterations, img_h=h, img_w=w,
                             alpha=float(alpha))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    u, v = pl.pallas_call(
        kern,
        in_specs=[vspec] * 3,
        out_specs=(vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((h, w), dt),
                   jax.ShapeDtypeStruct((h, w), dt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(127.75 * 1024 * 1024)),
        interpret=interpret,
    )(gx, gy, gt)
    return u, v


def _hs_resident2_kernel(gx_ref, gy_ref, gt_ref, up_ref, vp_ref,
                         inv_ref, *, window: int, iterations: int,
                         img_h: int, h_s: int, strip: int,
                         alpha: float):
    """Whole-frame VMEM-resident solve, v2: u and v live in r-padded
    output buffers whose zero halo doubles as the BORDER_CONSTANT ring;
    the iteration loop runs on-chip with ZERO HBM traffic. Each sweep
    streams the frame in ``strip``-row slabs so live vector values stay
    slab-sized — a whole-frame-values formulation makes Mosaic's
    register allocator spill ~13 full frames to VMEM (156 MB at 1080p,
    compile-time OOM). Jacobi double-buffering without a second frame
    pair: before a slab is overwritten, the r old rows the NEXT slab's
    box needs are carried forward as a loop value (the classic streaming
    boundary band)."""
    # Buffer layout (Mosaic: dynamic sublane offsets must be provably
    # 8-aligned, so the image starts at row TOPH = 8 and every dynamic
    # load/store offset is a multiple of ``strip``; the r-row halo lives
    # in the last r rows of the top block / first r rows of the tail):
    #   rows [0, TOPH)          zero top halo (only the last r used)
    #   rows [TOPH, TOPH+h_s)   the field
    #   rows [TOPH+h_s, +TOPH)  zero bottom halo / slack
    TOPH = 8
    r = window // 2
    w = gx_ref.shape[1]
    w2 = w + 2 * r
    n_s = h_s // strip
    inv_area = 1.0 / (window * window)
    inv_ref[:] = 1.0 / (alpha * alpha + gx_ref[:] * gx_ref[:]
                        + gy_ref[:] * gy_ref[:])
    up_ref[:] = jnp.zeros((h_s + 2 * TOPH, w2), gx_ref.dtype)
    vp_ref[:] = jnp.zeros((h_s + 2 * TOPH, w2), gx_ref.dtype)
    pad_tail = h_s != img_h
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (strip, w), 0)

    def box_valid_mean(blk):
        # (strip + 2r, w2) -> (strip, w) box mean.
        rows = blk[0:strip, :]
        for d in range(1, window):
            rows = rows + blk[d : d + strip, :]
        out = rows[:, 0:w]
        for d in range(1, window):
            out = out + rows[:, d : d + w]
        return out * inv_area

    def strip_body(s, bands):
        # bands: the r OLD buffer rows [TOPH + s*strip - r, TOPH + s*strip)
        # — the previous slab overwrote them, the box still needs them.
        band_u, band_v = bands
        top = s * strip
        lu = up_ref[pl.ds(top, strip + 2 * TOPH), :]  # aligned load
        lv = vp_ref[pl.ds(top, strip + 2 * TOPH), :]
        blk_u = jnp.concatenate(
            [band_u, lu[TOPH : TOPH + strip + r, :]], axis=0)
        blk_v = jnp.concatenate(
            [band_v, lv[TOPH : TOPH + strip + r, :]], axis=0)
        band_u_next = blk_u[strip : strip + r, :]
        band_v_next = blk_v[strip : strip + r, :]
        ub = box_valid_mean(blk_u)
        vb = box_valid_mean(blk_v)
        gxs = gx_ref[pl.ds(top, strip), :]
        gys = gy_ref[pl.ds(top, strip), :]
        gts = gt_ref[pl.ds(top, strip), :]
        invs = inv_ref[pl.ds(top, strip), :]
        upd = (gxs * ub + gys * vb + gts) * invs
        u_new = ub - gxs * upd
        v_new = vb - gys * upd
        if pad_tail:
            # Rows past the image must stay zero (BORDER_CONSTANT ring).
            m = (top + row_ids < img_h).astype(u_new.dtype)
            u_new = u_new * m
            v_new = v_new * m
        # Write through a full-width aligned store: stitch the halo
        # columns back on so shapes stay (strip, w2).
        zc = jnp.zeros((strip, r), u_new.dtype)
        up_ref[pl.ds(top + TOPH, strip), :] = jnp.concatenate(
            [zc, u_new, zc], axis=1)
        vp_ref[pl.ds(top + TOPH, strip), :] = jnp.concatenate(
            [zc, v_new, zc], axis=1)
        return band_u_next, band_v_next

    zb = jnp.zeros((r, w2), gx_ref.dtype)

    def iter_body(_, carry):
        jax.lax.fori_loop(0, n_s, strip_body, (zb, zb))
        return carry

    jax.lax.fori_loop(0, iterations, iter_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("window_size", "max_iterations",
                                    "alpha", "strip", "interpret"))
def horn_schunck_pallas_resident2(
    prev: jnp.ndarray,
    next: jnp.ndarray,
    window_size: int = 5,
    max_iterations: int = 100,
    alpha: float = 1.0,
    strip: int = 120,
    interpret: bool = False,
):
    """VMEM-resident Horn-Schunck v2 (see :func:`_hs_resident2_kernel`).
    Same contract as :func:`horn_schunck_pallas_resident`; valid when
    ~6 * H * W * 4 bytes fits VMEM (1080p f32 on v5e)."""
    from tpuflow.solvers.horn_schunck import hs_gradients

    gx, gy, gt = hs_gradients(prev, next)
    dt = gx.dtype
    h, w = prev.shape
    r = window_size // 2
    strip = max(min(strip, _cdiv(h, 8) * 8), 8)
    n_s = _cdiv(h, strip)
    h_s = n_s * strip
    if h_s != h:
        pad = ((0, h_s - h), (0, 0))
        gx, gy, gt = (jnp.pad(a, pad) for a in (gx, gy, gt))

    kern = functools.partial(_hs_resident2_kernel, window=window_size,
                             iterations=max_iterations, img_h=h, h_s=h_s,
                             strip=strip, alpha=float(alpha))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hp2, wp2 = h_s + 16, w + 2 * r  # TOPH = 8 top + bottom blocks
    up, vp = pl.pallas_call(
        kern,
        in_specs=[vspec] * 3,
        out_specs=(vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((hp2, wp2), dt),
                   jax.ShapeDtypeStruct((hp2, wp2), dt)),
        scratch_shapes=[pltpu.VMEM((h_s, w), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(127.75 * 1024 * 1024)),
        interpret=interpret,
    )(gx, gy, gt)
    return up[8 : 8 + h, r : r + w], vp[8 : 8 + h, r : r + w]


def _hs_pipelined_kernel(u_hbm, v_hbm, gx_hbm, gy_hbm, gt_hbm, inv_hbm,
                         uo_hbm, vo_hbm,
                         bufs, obufs, sems, osems,
                         *, n_i: int, n_j: int, tile_h: int, tile_w: int,
                         halo_y: int, halo_x: int, need: int, window: int,
                         fuse: int, img_h: int, img_w: int,
                         mxu: bool = False, roll: bool = False):
    """Double-buffered variant of :func:`_hs_kernel`: one grid step loops
    over all tiles, prefetching tile t+1's six halo'd fields while tile t
    computes, and writing results back with async copies (two slots each
    way) — DMA fully overlapped with the sweep compute."""
    n_t = n_i * n_j
    hh = tile_h + 2 * halo_y
    hw = tile_w + 2 * halo_x
    srcs = (u_hbm, v_hbm, gx_hbm, gy_hbm, gt_hbm, inv_hbm)

    def in_dma(slot, t, k):
        i = t // n_j
        j = t % n_j
        return pltpu.make_async_copy(
            srcs[k].at[pl.ds(i * tile_h, hh), pl.ds(j * tile_w, hw)],
            bufs.at[slot, k], sems.at[slot, k])

    def out_dma(slot, t, k):
        i = t // n_j
        j = t % n_j
        dst = (uo_hbm, vo_hbm)[k]
        return pltpu.make_async_copy(
            obufs.at[slot, k],
            dst.at[pl.ds(i * tile_h, tile_h), pl.ds(j * tile_w, tile_w)],
            osems.at[slot, k])

    for k in range(6):
        in_dma(0, 0, k).start()

    def loop_body(t, carry):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < n_t)
        def _():
            for k in range(6):
                in_dma(nxt, t + 1, k).start()

        for k in range(6):
            in_dma(slot, t, k).wait()

        i = t // n_j
        j = t % n_j
        row0 = i * tile_h
        col0 = j * tile_w
        if roll:
            mask_full = _inside_mask(row0 - halo_y, col0 - halo_x, hh, hw,
                                     img_h, img_w, bufs.dtype)
            u = bufs[slot, 0] * mask_full
            v = bufs[slot, 1] * mask_full
            sweep = (_hs_sweeps_roll_batched if roll == "batched"
                     else _hs_sweeps_roll2 if roll == "two_stage"
                     else _hs_sweeps_roll)
            u, v = sweep(u, v, bufs[slot, 2], bufs[slot, 3],
                         bufs[slot, 4], bufs[slot, 5],
                         mask_full, window, fuse)
            u = u[halo_y : halo_y + tile_h, halo_x : halo_x + tile_w]
            v = v[halo_y : halo_y + tile_h, halo_x : halo_x + tile_w]
        else:
            ch = tile_h + 2 * need
            cw = tile_w + 2 * need
            oy = halo_y - need
            ox = halo_x - need
            crop = (slice(oy, oy + ch), slice(ox, ox + cw))
            mask_full = _inside_mask(row0 - need, col0 - need, ch, cw,
                                     img_h, img_w, bufs.dtype)
            u = bufs[slot, 0][crop] * mask_full
            v = bufs[slot, 1][crop] * mask_full
            u, v = _hs_sweeps(u, v, bufs[slot, 2][crop],
                              bufs[slot, 3][crop], bufs[slot, 4][crop],
                              bufs[slot, 5][crop],
                              mask_full, window, fuse, mxu=mxu)

        # Reuse of this output slot requires its previous copy done.
        @pl.when(t >= 2)
        def _():
            for k in range(2):
                out_dma(slot, t - 2, k).wait()

        obufs[slot, 0] = u
        obufs[slot, 1] = v
        for k in range(2):
            out_dma(slot, t, k).start()
        return carry

    jax.lax.fori_loop(0, n_t, loop_body, 0)
    for t in (n_t - 2, n_t - 1):
        if t >= 0:
            for k in range(2):
                out_dma(t % 2, t, k).wait()


@functools.partial(
    jax.jit,
    static_argnames=("window_size", "max_iterations", "tile_h", "tile_w",
                     "fuse", "pipelined", "mxu", "roll", "interpret"))
def horn_schunck_pallas(
    prev: jnp.ndarray,
    next: jnp.ndarray,
    window_size: int = 5,
    max_iterations: int = 100,
    alpha: float = 1.0,
    tile_h: int = 128,
    tile_w: int = 1024,
    fuse: int = 10,
    pipelined: bool = False,
    mxu: bool = False,
    roll: bool | str = False,
    interpret: bool = False,
):
    """Horn-Schunck flow with the fused Pallas sweep. Returns (u, v).
    Default tiling = the measured v5e optimum at 1080p.

    Matches :func:`tpuflow.solvers.horn_schunck` (same gradients, same
    BORDER_CONSTANT box average); `fuse` controls iterations per HBM
    round-trip and must divide into max_iterations (the remainder runs in
    a final smaller-fuse call). ``pipelined=True`` selects the
    double-buffered kernel (input prefetch + async write-back overlap the
    sweep compute, :func:`_hs_pipelined_kernel`). ``roll=True`` replaces
    the shrinking-slice sweeps with full-size cyclic-rotation sweeps
    (:func:`_hs_sweeps_roll`) — no Mosaic relayout copies;
    ``roll="batched"`` additionally stacks u and v on the sublane axis so
    every roll/add instruction carries both fields
    (:func:`_hs_sweeps_roll_batched`); ``roll="two_stage"`` uses the
    two-stage alternating-drift 5-tap box (:func:`_hs_sweeps_roll2`,
    12 box ops/field/sweep instead of 16 — float-tolerance, not bitwise,
    vs the symmetric association).
    """
    from tpuflow.solvers.horn_schunck import hs_gradients

    gx, gy, gt = hs_gradients(prev, next)
    dt = gx.dtype
    inv_denom = 1.0 / (alpha * alpha + gx * gx + gy * gy)

    h, w = prev.shape
    tile_h = min(tile_h, _cdiv(h, 8) * 8)
    tile_w = min(tile_w, _cdiv(w, 128) * 128)
    n_i = _cdiv(h, tile_h)
    n_j = _cdiv(w, tile_w)
    hp = n_i * tile_h
    wp = n_j * tile_w
    r = window_size // 2

    u = jnp.zeros((h, w), dt)
    v = jnp.zeros((h, w), dt)

    def run_block(u, v, k):
        need = k * r
        # DMA margins aligned to the memref tiling: (8, 128) for 32-bit,
        # (16, 128) for 16-bit dtypes (2*halo_y must hit the sublane
        # tile; halo_x the lane tile).
        sub = 8 if dt.itemsize < 4 else 4
        halo_y = _cdiv(need, sub) * sub
        halo_x = _cdiv(need, 64) * 64

        def pad_h(a):
            return jnp.pad(a, ((halo_y, hp - h + halo_y),
                               (halo_x, wp - w + halo_x)))

        hh = tile_h + 2 * halo_y
        hw = tile_w + 2 * halo_x
        any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
        args = (pad_h(u), pad_h(v), pad_h(gx), pad_h(gy), pad_h(gt),
                pad_h(inv_denom))
        if pipelined:
            kern = functools.partial(
                _hs_pipelined_kernel, n_i=n_i, n_j=n_j, tile_h=tile_h,
                tile_w=tile_w, halo_y=halo_y, halo_x=halo_x, need=need,
                window=window_size, fuse=k, img_h=h, img_w=w, mxu=mxu,
                roll=roll)
            u_new, v_new = pl.pallas_call(
                kern,
                in_specs=[any_spec] * 6,
                out_specs=(any_spec, any_spec),
                out_shape=(jax.ShapeDtypeStruct((hp, wp), dt),
                           jax.ShapeDtypeStruct((hp, wp), dt)),
                scratch_shapes=[
                    pltpu.VMEM((2, 6, hh, hw), dt),
                    pltpu.VMEM((2, 2, tile_h, tile_w), dt),
                    pltpu.SemaphoreType.DMA((2, 6)),
                    pltpu.SemaphoreType.DMA((2, 2))],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(*args)
            return u_new[:h, :w], v_new[:h, :w]
        kern = functools.partial(
            _hs_kernel, tile_h=tile_h, tile_w=tile_w, halo_y=halo_y,
            halo_x=halo_x, need=need, window=window_size, fuse=k,
            img_h=h, img_w=w, mxu=mxu, roll=roll)
        out_spec = pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        u_new, v_new = pl.pallas_call(
            kern,
            grid=(n_i, n_j),
            in_specs=[any_spec] * 6,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((hp, wp), dt),
                       jax.ShapeDtypeStruct((hp, wp), dt)),
            scratch_shapes=[pltpu.VMEM((hh, hw), dt)] * 6
            + [pltpu.SemaphoreType.DMA((6,))],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*args)
        return u_new[:h, :w], v_new[:h, :w]

    n_full, rem = divmod(max_iterations, fuse)
    if n_full:
        u, v = jax.lax.fori_loop(
            0, n_full, lambda _, uv: run_block(*uv, fuse), (u, v))
    if rem:
        u, v = run_block(u, v, rem)
    return u, v
