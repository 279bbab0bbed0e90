"""Interleaved re-measurement of the mean-shift window schedule (r4).

The first A/B (r4_ms_sched_ab.py) reported a 1.28x filter speedup that
cannot be real: the schedule only shrinks ITERATION 1's window (36 vs
40 — p999 drift exceeds R from iteration 2 on, so nothing else may
shrink under the drift contract), which is ~2.5% of the sweep's offsets.
This interleaves default/scheduled timings A B A B A B on the real
frame to separate the true delta from tunnel variance.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r4_ms_sched_ab2.py
"""

from __future__ import annotations

import json
import time

import numpy as np

R, HR, ITERS = 20, 16.0 / 255.0, 8
SCHED = [20, 36, 40, 40, 40, 40, 40, 40]


def main():
    import jax.numpy as jnp

    from tpuflow.core.color import srgb_to_lab
    from tpuflow.core.io import read_image
    from tpuflow.segmentation import meanshift as ms

    rgb, _ = read_image(
        "/root/reference/HornSchunckOF/img/leftimage/000050_10.png")
    lab = jnp.asarray(srgb_to_lab(jnp.asarray(rgb, jnp.float32) / 255.0))

    def run_once():
        out = ms.mean_shift_filter(lab, R, HR, iters=ITERS)
        np.asarray(out[0]).ravel()[:1]

    def timed():
        run_once()  # compile/warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_once()
            best = min(best, time.perf_counter() - t0)
        return best

    orig = ms._ms_window
    results = {"default": [], "sched": []}
    for rep in range(3):
        ms._ms_window = orig
        ms.mean_shift_filter.clear_cache()
        results["default"].append(timed())
        ms._ms_window = lambda it, R_, E_: (
            SCHED[it] if it < len(SCHED) else SCHED[-1])
        ms.mean_shift_filter.clear_cache()
        results["sched"].append(timed())
    ms._ms_window = orig
    ms.mean_shift_filter.clear_cache()
    d = min(results["default"])
    s = min(results["sched"])
    print(json.dumps({
        "default_s": [round(x, 4) for x in results["default"]],
        "sched_s": [round(x, 4) for x in results["sched"]],
        "best_default": round(d, 4), "best_sched": round(s, 4),
        "speedup": round(d / s, 3)}), flush=True)


if __name__ == "__main__":
    main()
