"""Round-4 mean-shift per-iteration window schedule A/B (VERDICT r3 #9).

The sweep window for iterations k >= 1 is E = R + M with M = R — the
sound worst-case (drift after iteration 0 is provably <= R; beyond that
the k*R bound is unsound under the empty-window reset, so no PROVABLE
shrink below 2R exists; meanshift._ms_window). But the OBSERVED drift
distribution on real imagery is far tighter than R for the early
iterations, so an empirical per-iteration schedule

    E_k = R + min(ceil(drift_p999(k)) + slack, R)

may cut the dominant flagship stage (~0.59 s of 1.55 s synthetic) with
the same corpus-PSNR-unchanged guard the banded-disc change used
(scripts/r3_ms_disc_ab.py).

This script, on the real TPU:
1. profiles per-iteration drift percentiles on real corpus frames,
2. derives the schedule,
3. times default vs scheduled filter at KITTI res,
4. guards quality: compensation PSNR of the full flagship driver on a
   corpus subset with the schedule monkeypatched in, vs default.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r4_ms_sched_ab.py [--subset 8]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

CORPUS = Path("/root/reference/HornSchunckOF/img/leftimage")
R = 20
HR = 16.0 / 255.0
ITERS = 8


def emit(**kw):
    print(json.dumps(kw, default=float), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subset", type=int, default=8,
                    help="corpus pairs for the quality guard")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpuflow.core.color import srgb_to_lab
    from tpuflow.core.io import read_image
    from tpuflow.segmentation import meanshift as ms

    frames = []
    for stem in ("000050_10", "000051_10", "000030_10"):
        rgb, _ = read_image(str(CORPUS / f"{stem}.png"))
        frames.append(np.asarray(srgb_to_lab(
            jnp.asarray(rgb, jnp.float32) / 255.0)))

    # 1. Per-iteration drift percentiles (ONE trajectory call per frame).
    per_iter = [[] for _ in range(ITERS)]
    for lab in frames:
        _, _, traj = ms.mean_shift_filter(jnp.asarray(lab), R, HR,
                                          iters=ITERS,
                                          return_trajectory=True)
        traj = np.asarray(traj)  # (iters, H, W, 2) drift after each step
        for k in range(ITERS):
            d = np.sqrt((traj[k] ** 2).sum(-1)).ravel()
            per_iter[k].append(d)
    profile = []
    for k in range(ITERS):
        d = np.concatenate(per_iter[k])
        profile.append({
            "after_iter": k + 1,
            "p50": float(np.percentile(d, 50)),
            "p99": float(np.percentile(d, 99)),
            "p999": float(np.percentile(d, 99.9)),
            "max": float(d.max()),
        })
        emit(**profile[-1])

    # 2. Schedule: window for iteration k uses drift AFTER k-1 moves
    #    (iteration 0 is exact at R; _ms_window handles it).
    slack = 2
    sched = [R]
    for k in range(1, ITERS):
        m = int(np.ceil(profile[k - 1]["p999"])) + slack
        sched.append(R + min(m, R))
    emit(schedule=sched)

    # 3. Filter timing, default vs scheduled (serial dispatch, best of 3).
    def timed_filter():
        lab_j = jnp.asarray(frames[0])
        out = ms.mean_shift_filter(lab_j, R, HR, iters=ITERS)
        np.asarray(out[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = ms.mean_shift_filter(lab_j, R, HR, iters=ITERS)
            np.asarray(out[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t_default = timed_filter()
    orig_window = ms._ms_window
    ms._ms_window = lambda it, R_, E_: (
        sched[it] if it < len(sched) else sched[-1])
    # _ms_window is read at trace time; drop the cached executables so
    # the patched schedule actually retraces.
    ms.mean_shift_filter.clear_cache()
    try:
        t_sched = timed_filter()

        # 4. Quality guard: flagship compensation PSNR, subset sweep.
        from tpuflow.pipeline.motion_compensation import compensate
        from tpuflow.solvers.bm_flow import optical_flow_block_matching

        def gray(a):
            return (0.299 * a[..., 0] + 0.587 * a[..., 1]
                    + 0.114 * a[..., 2]).round()

        def psnr(a, b):
            mse = float(np.mean((a - b) ** 2))
            return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)

        stems = sorted(p.name[:-7] for p in CORPUS.glob("*_10.png"))
        stems = stems[:: max(len(stems) // args.subset, 1)][: args.subset]

        def sweep():
            vals = []
            for stem in stems:
                prev, _ = read_image(str(CORPUS / f"{stem}_10.png"))
                nxt, _ = read_image(str(CORPUS / f"{stem}_11.png"))
                out, _ = optical_flow_block_matching(prev, nxt, 255.0,
                                                     iter_max=2048)
                comp = np.asarray(compensate(
                    jnp.asarray(gray(prev).astype(np.float64)),
                    jnp.asarray(out.u.astype(np.float64)),
                    jnp.asarray(out.v.astype(np.float64))))
                vals.append(psnr(comp, gray(nxt)))
            return vals

        q_sched = sweep()
    finally:
        ms._ms_window = orig_window
        ms.mean_shift_filter.clear_cache()
    q_default = sweep()

    emit(t_filter_default_s=round(t_default, 4),
         t_filter_sched_s=round(t_sched, 4),
         speedup=round(t_default / t_sched, 3),
         psnr_default_mean=round(float(np.mean(q_default)), 3),
         psnr_sched_mean=round(float(np.mean(q_sched)), 3),
         psnr_delta=round(float(np.mean(q_sched) - np.mean(q_default)), 3),
         pairs=len(q_default))


if __name__ == "__main__":
    main()
