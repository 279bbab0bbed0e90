"""cProfile of one steady-state flagship frame at KITTI res (TPU).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_flagship_profile.py
"""

from __future__ import annotations

import cProfile
import pstats
import time

import numpy as np

KH, KW = 376, 1240


def main():
    import jax

    from tpuflow.solvers.bm_flow import optical_flow_block_matching

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.uniform(0, 255, (KH + 8, KW + 8, 3)),
                           (2, 2, 0))
    f0 = base[:KH, :KW]
    f1 = base[4 : 4 + KH, 2 : 2 + KW]
    f2 = np.roll(f1, 2, axis=1)
    f3 = np.roll(f1, 4, axis=1)

    t0 = time.perf_counter()
    out, state = optical_flow_block_matching(f0, f1, 255.0, iter_max=2048)
    print(f"first pair: {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    out, state = optical_flow_block_matching(f1, f2, 255.0, iter_max=2048,
                                             state=state)
    print(f"second pair: {time.perf_counter() - t0:.1f} s", flush=True)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    out, state = optical_flow_block_matching(f2, f3, 255.0, iter_max=2048,
                                             state=state)
    prof.disable()
    print(f"profiled steady frame: {time.perf_counter() - t0:.2f} s",
          flush=True)
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(28)


if __name__ == "__main__":
    main()
