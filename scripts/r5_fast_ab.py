"""Interleaved A/B: flagship steady state, exhaustive vs fast profile.

Round-5 measurement for VERDICT r4 #1 (the fast profile: half-res
coarse search + analytic-bound plateau-stopped refine). Interleaves
one-cycle windows of each arm against the ±20-30% tunnel variance
(CLAUDE.md timing rules) on the same REAL corpus frames bench.py uses.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo \
    python -u scripts/r5_fast_ab.py [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import jax

    from bench import _frames_flagship
    from tpuflow.solvers.bm_flow import optical_flow_block_matching_async

    print("devices:", jax.devices(), flush=True)
    frames, real = _frames_flagship()
    print("real corpus frames:", real, flush=True)
    cyc = len(frames)

    arms = {
        "exhaustive": dict(),
        "fast": dict(profile="fast"),
        "turbo": dict(profile="turbo"),
        "quality": dict(profile="quality"),
    }
    states = {k: (None, None) for k in arms}

    def run_cycle(name, n_pairs):
        state, pending = states[name]
        kw = dict(iter_max=2048)
        kw.update(arms[name])
        t0 = time.perf_counter()
        for i in range(n_pairs):
            a = frames[i % cyc]
            b = frames[(i + 1) % cyc]
            fin, state = optical_flow_block_matching_async(
                a, b, 255.0, state=state, **kw)
            if pending is not None:
                pending()
            pending = fin
        states[name] = (state, pending)
        return (time.perf_counter() - t0) / n_pairs

    # Warmup: cold pair + one full cycle per arm (all buckets compile).
    for name in arms:
        t = run_cycle(name, cyc + 2)
        print(f"warmup {name}: {t * (cyc + 2):.1f} s total", flush=True)

    results = {k: [] for k in arms}
    for r in range(reps):
        for name in arms:
            spf = run_cycle(name, cyc)
            results[name].append(spf)
            print(f"rep {r} {name}: {spf:.3f} s/pair", flush=True)
    for name, vals in results.items():
        print(f"{name}: mean {np.mean(vals):.3f} best {np.min(vals):.3f} "
              f"all {[round(v, 3) for v in vals]}", flush=True)
    for _, pending in states.values():
        if pending is not None:
            pending()


if __name__ == "__main__":
    main()
