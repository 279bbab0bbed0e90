"""Measured anchors for the extrapolated oracle baselines (VERDICT r4 #4).

bench.py's BA and flagship ``vs_baseline`` figures come from the pinned
f64 NumPy oracle (the reference C++ cannot build — missing submodules)
op-count-extrapolated to the full budget. This script runs the SAME
oracle math END-TO-END — the complete Black-Anandan pyramid at a
reduced per-level budget on the real KITTI pair, and the flagship's
three extrapolated stages (mean-shift filter, bidirectional 61x61 BM
search + subpixel, 2x2048 gated IRLS) at FULL budget on a quarter-pixel
crop — and reports the measured time next to what bench.py's
extrapolation predicts for the same work. The ratio is the anchor
recorded in BASELINE.md.

CPU-only; ~5-8 minutes. Usage:
    python -u scripts/r5_oracle_anchor.py [--crop-scale 2]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np  # noqa: E402

PAIR = Path("/root/reference/HornSchunckOF/img/leftimage")


def _gray(a):
    return (0.299 * a[..., 0] + 0.587 * a[..., 1]
            + 0.114 * a[..., 2]).round()


# ---------------------------------------------------------------------------
# Part A: Black-Anandan — instrumented end-to-end pyramid oracle.


def ba_anchor(prev, nxt, iter_cap=64):
    """The optical_flow_pyramid_oracle loop (tests/oracles.py:179-248)
    run end-to-end with the per-level budget capped at ``iter_cap``
    sweeps, timing each level's sweep/energy loops — then the measured
    per-level rates are scaled to bench.py's benched budget (512 sweeps
    + 8 energies per level) and compared against bench._ba_oracle_spf's
    micro-fragment extrapolation."""
    import oracles as orc

    lam_d, lam_s = 5.0, 1.0
    sd_init, sd_l0 = 0.8 / math.sqrt(2), 0.2 / math.sqrt(2)
    ss_init, ss_l0 = 0.3 / math.sqrt(2), 0.03 / math.sqrt(2)
    level = 5
    it_n = prev.astype(np.float64) / 255.0
    itp1_n = nxt.astype(np.float64) / 255.0
    lt = orc.pyramider_oracle(it_n, level)
    ltp = orc.pyramider_oracle(itp1_n, level)
    max_level = len(lt) - 1
    dts = orc.dt_pyramid_oracle(lt, ltp)
    grads = orc.grad_pyramid_oracle(lt)
    u = v = None
    t_total = 0.0
    t_pred_bench = 0.0
    per_level = []
    for lev in range(max_level, -1, -1):
        sd = sd_init + (sd_l0 - sd_init) / max_level * (max_level - lev)
        ss = ss_init + (ss_l0 - ss_init) / max_level * (max_level - lev)
        gx, gy = grads[lev]
        h, w = gx.shape
        if lev < max_level:
            xs, ys = np.meshgrid(np.arange(w), np.arange(h))
            uo = u[np.minimum(ys // 2, u.shape[0] - 1),
                   np.minimum(xs // 2, u.shape[1] - 1)]
            vo = v[np.minimum(ys // 2, v.shape[0] - 1),
                   np.minimum(xs // 2, v.shape[1] - 1)]
            ox = np.floor(2.0 * uo).astype(int)
            oy = np.floor(2.0 * vo).astype(int)
            acc = np.zeros((h, w))
            for dy in (0, 1):
                for dx in (0, 1):
                    acc += orc.zeropad_get(ltp[lev], xs + dx + ox,
                                           ys + dy + oy)
                    acc -= orc.zeropad_get(lt[lev], xs + dx, ys + dy)
            it_l = acc / 4.0
        else:
            it_l = dts[lev]
        sup_x = lam_d * np.max(gx**2) / sd**2 + 4 * lam_s / ss**2
        sup_y = lam_d * np.max(gy**2) / sd**2 + 4 * lam_s / ss**2
        ul = np.zeros((h, w))
        vl = np.zeros((h, w))
        n_sweep = n_energy = 0
        t0 = time.perf_counter()
        for n in range(iter_cap):
            ul, vl = orc.irls_sweep_oracle(ul, vl, gx, gy, it_l, lam_d,
                                           lam_s, sd, ss, sup_x, sup_y)
            n_sweep += 1
            if (n & 0x3F) == 0:
                orc.irls_energy_oracle(ul, vl, gx, gy, it_l, lam_d,
                                       lam_s, sd, ss)
                n_energy += 1
        dt_lev = time.perf_counter() - t0
        t_total += dt_lev
        # Per-level rates from the end-to-end run -> the benched budget
        # (512 sweeps + 8 energies, bench.bench_black_anandan).
        t_per_unit = dt_lev / (n_sweep + 0.3 * n_energy)  # energy ~0.3 sweep
        t_pred_bench += t_per_unit * (512 + 0.3 * 8)
        per_level.append({"level": lev, "shape": [h, w],
                          "sweeps": n_sweep, "t": round(dt_lev, 3)})
        if lev < max_level:
            xs, ys = np.meshgrid(np.arange(w), np.arange(h))
            ul = ul + 2.0 * u[np.minimum(ys // 2, u.shape[0] - 1),
                              np.minimum(xs // 2, u.shape[1] - 1)]
            vl = vl + 2.0 * v[np.minimum(ys // 2, v.shape[0] - 1),
                              np.minimum(xs // 2, v.shape[1] - 1)]
        u, v = ul, vl
    return {"measured_e2e_s": round(t_total, 2),
            "iter_cap": iter_cap,
            "levels": per_level,
            "bench_budget_anchor_s": round(t_pred_bench, 1),
            "flow_u_range": [round(float(u.min()), 2),
                             round(float(u.max()), 2)]}


# ---------------------------------------------------------------------------
# Part B: flagship stages at FULL budget on a quarter-pixel crop.


def meanshift_filter_oracle(lab, R=20, hr=16.0 / 255.0, iters=8):
    """Vectorized f64 mean-shift filter: per iteration, sweep every
    (2R+1)^2 window offset against the drifted spatial origin — the
    reference Segmentation<Lab>::MeanShift math (SURVEY §2.4), same
    structure bench._flagship_oracle_spf times a fragment of."""
    h, w = lab.shape[:2]
    ex = np.zeros((h, w))
    ey = np.zeros((h, w))
    col = lab.copy()
    for _ in range(iters):
        acc = [np.zeros((h, w)) for _ in range(6)]
        for dy in range(-R, R + 1):
            for dx in range(-R, R + 1):
                sh = np.roll(lab, (-dy, -dx), axis=(0, 1))
                d2 = ((sh - col) ** 2).sum(-1)
                m = ((d2 <= hr * hr)
                     & ((ex + dx) ** 2 + (ey + dy) ** 2 <= R * R))
                for i in range(3):
                    acc[i] += np.where(m, sh[..., i], 0.0)
                acc[3] += m * dx
                acc[4] += m * dy
                acc[5] += m
        n = np.maximum(acc[5], 1.0)
        col = np.stack([acc[i] / n for i in range(3)], -1)
        ex = ex + acc[3] / n
        ey = ey + acc[4] / n
    return ex, ey, col


def bm_search_oracle(cur_lab, ref_lab, labels, n_regions,
                     search_range=61, coeff_mad=1.0, coeff_zncc=0.5,
                     lab_scale=100.0):
    """Exhaustive 61x61 MAD+ZNCC region search, f64, get_zeropad reads
    (matcher.py's cost in literal per-candidate bincount form)."""
    h, w = cur_lab.shape[:2]
    flat = labels.ravel()
    R = search_range // 2
    a = cur_lab[..., 0]
    n_r = np.bincount(flat, minlength=n_regions).astype(np.float64)
    s_a = np.bincount(flat, weights=a.ravel(), minlength=n_regions)
    s_aa = np.bincount(flat, weights=(a * a).ravel(), minlength=n_regions)
    best = np.full(n_regions, np.inf)
    best_d = np.zeros((n_regions, 2))
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            sh = np.roll(ref_lab, (-dy, -dx), axis=(0, 1))
            ys = np.arange(h)[:, None] + dy
            xs = np.arange(w)[None, :] + dx
            valid = ((ys >= 0) & (ys < h) & (xs >= 0) & (xs < w))
            sh = sh * valid[..., None]
            mad_px = np.abs(cur_lab - sh).sum(-1) * (lab_scale / 3.0)
            b = sh[..., 0]
            s_mad = np.bincount(flat, weights=mad_px.ravel(),
                                minlength=n_regions)
            s_b = np.bincount(flat, weights=b.ravel(),
                              minlength=n_regions)
            s_bb = np.bincount(flat, weights=(b * b).ravel(),
                               minlength=n_regions)
            s_ab = np.bincount(flat, weights=(a * b).ravel(),
                               minlength=n_regions)
            ns = np.maximum(n_r, 1.0)
            mad = s_mad / ns
            var_a = np.maximum(s_aa / ns - (s_a / ns) ** 2, 0.0)
            var_b = np.maximum(s_bb / ns - (s_b / ns) ** 2, 0.0)
            zncc = np.clip((s_ab / ns - s_a / ns * s_b / ns)
                           / (np.sqrt(var_a * var_b) + 1e-12), -1, 1)
            cost = coeff_mad * mad - coeff_zncc * zncc
            upd = cost < best
            best = np.where(upd, cost, best)
            best_d[upd] = (dy, dx)
    return best_d, best


def gated_irls_oracle(gx, gy, it, labels, iters=2048):
    """Reference-budget gated IRLS (sup, energy cadence, 3 strikes)."""
    import oracles as orc

    lam_d, lam_s = 5.0, 1.0
    sd = 0.2 / math.sqrt(2)
    ss = 0.03 / math.sqrt(2)
    sup_x = lam_d * np.max(gx * gx) / sd**2 + 4 * lam_s / ss**2
    sup_y = lam_d * np.max(gy * gy) / sd**2 + 4 * lam_s / ss**2
    u = np.zeros_like(gx)
    v = np.zeros_like(gx)
    E = 0.0
    inc = 0
    for n in range(iters):
        u, v = orc.gated_irls_sweep_oracle(u, v, gx, gy, it, labels,
                                           lam_d, lam_s, sd, ss, sup_x,
                                           sup_y)
        if (n & 0x3F) == 0:
            E_new = orc.gated_irls_energy_oracle(u, v, gx, gy, it,
                                                 labels, lam_d, lam_s,
                                                 sd, ss)
            inc = inc + 1 if E_new > E and n else 0
            E = E_new
            if E < 1e-6 or inc > 3:
                break
    return u, v


def flagship_anchor(crop_scale=2):
    """The three stages bench._flagship_oracle_spf extrapolates, run at
    FULL reference budget on a 1/crop_scale^2-pixel crop of the real
    steady-state triple (000050_10/11 + 000051_10), f64. The measured
    total scales by the exact pixel ratio to the full-frame anchor."""
    from tpuflow.core.color import srgb_to_lab
    from tpuflow.core.io import read_image
    from tpuflow.segmentation import segment_meanshift

    import jax
    import jax.numpy as jnp

    h, w = 376 // crop_scale, 1240 // crop_scale
    frames = []
    for name in ("000050_10.png", "000050_11.png", "000051_10.png"):
        img, _ = read_image(str(PAIR / name))
        frames.append(img[:h, :w].astype(np.float64))
    labs = [np.asarray(srgb_to_lab(jnp.asarray(f / 255.0,
                                               jnp.float64)))
            for f in frames]

    # Stage 1: mean-shift filter, full 8x(2R+1)^2 budget.
    t0 = time.perf_counter()
    ex, ey, col = meanshift_filter_oracle(labs[1])
    t_ms = time.perf_counter() - t0

    # Labels for the gated stages (untimed plumbing — the extrapolation
    # excludes labeling too).
    seg = segment_meanshift(labs[1].astype(np.float32), 20, 16.0 / 255.0)

    # Stage 2: bidirectional exhaustive search + x2 subpixel-equivalent
    # (the subpixel stage re-scores 9 sub-cells around the winner with
    # shared taps; ~100 full-pel equivalents per bench's accounting —
    # folded in here by running 100 extra candidates' worth of work).
    t0 = time.perf_counter()
    for ref in (labs[0], labs[2]):
        bm_search_oracle(labs[1], ref, seg.labels, seg.n_regions)
    t_bm = time.perf_counter() - t0
    t_bm *= 3821.0 / 3721.0  # subpixel-equivalent candidates

    # Stage 3: both directions' 2048-sweep gated IRLS (zero-MV dt).
    L = 100.0
    int_l = labs[1][..., 0] * L

    def mirror_shift(img, dx, dy):
        hh, ww = img.shape
        xs = np.arange(ww) + dx
        ys = np.arange(hh) + dy
        xs = np.where(xs >= ww, 2 * ww - 2 - xs, np.abs(xs))
        ys = np.where(ys >= hh, 2 * hh - 2 - ys, np.abs(ys))
        return img[ys][:, xs]

    gx = ((mirror_shift(int_l, 1, 0) - int_l)
          + (mirror_shift(int_l, 1, 1) - mirror_shift(int_l, 0, 1))) / 2
    gy = ((mirror_shift(int_l, 0, 1) - int_l)
          + (mirror_shift(int_l, 1, 1) - mirror_shift(int_l, 1, 0))) / 2
    t0 = time.perf_counter()
    for ref in (labs[0], labs[2]):
        ref_l = ref[..., 0] * L
        it = sum(mirror_shift(ref_l, dx, dy) - mirror_shift(int_l, dx, dy)
                 for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1))) / 4.0
        gated_irls_oracle(gx, gy, it, seg.labels)
    t_irls = time.perf_counter() - t0

    total_crop = t_ms + t_bm + t_irls
    scale = crop_scale * crop_scale
    return {"crop": [h, w], "n_regions": int(seg.n_regions),
            "t_meanshift_s": round(t_ms, 1),
            "t_bm_s": round(t_bm, 1),
            "t_irls_s": round(t_irls, 1),
            "total_crop_s": round(total_crop, 1),
            "fullframe_anchor_s": round(total_crop * scale, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop-scale", type=int, default=2)
    ap.add_argument("--ba-cap", type=int, default=64)
    ap.add_argument("--skip-ba", action="store_true")
    ap.add_argument("--skip-flagship", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from tpuflow.core.io import read_image

    import bench

    if not args.skip_ba:
        prev = _gray(read_image(str(PAIR / "000050_10.png"))[0])
        nxt = _gray(read_image(str(PAIR / "000050_11.png"))[0])
        res = ba_anchor(prev, nxt, iter_cap=args.ba_cap)
        t0 = time.perf_counter()
        extrap = bench._ba_oracle_spf()
        res["bench_extrapolation_s"] = round(extrap, 1)
        res["extrapolation_measure_cost_s"] = round(
            time.perf_counter() - t0, 1)
        res["anchor_over_extrapolation"] = round(
            res["bench_budget_anchor_s"] / extrap, 3)
        print(json.dumps({"ba_anchor": res}), flush=True)

    if not args.skip_flagship:
        res = flagship_anchor(args.crop_scale)
        t0 = time.perf_counter()
        extrap = bench._flagship_oracle_spf()
        res["bench_extrapolation_s"] = round(extrap, 1)
        res["extrapolation_measure_cost_s"] = round(
            time.perf_counter() - t0, 1)
        res["anchor_over_extrapolation"] = round(
            res["fullframe_anchor_s"] / extrap, 3)
        print(json.dumps({"flagship_anchor": res}), flush=True)


if __name__ == "__main__":
    main()
