"""Compare HS kernel variants on the real TPU (amortized, tunnel-safe).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_hs_kernels.py [variants...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

H, W = 1080, 1920
ITERS = 100
WINDOW = 5
ALPHA = 1.0


def timed(name, run, repeats=20, windows=3):
    import jax

    u, v = run()
    jax.block_until_ready((u, v))
    np.asarray(u)  # hard sync through the tunnel
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(repeats):
            u, v = run()
        jax.block_until_ready((u, v))
        np.asarray(u)
        best = min(best, (time.perf_counter() - t0) / repeats)
    print(f"{name}: {best * 1e3:.2f} ms/frame ({1.0 / best:.1f} fps)",
          flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    prev = rng.uniform(0, 255, (H, W))
    nxt = np.roll(prev, 2, axis=1) + rng.normal(0, 1, (H, W))
    p = jnp.asarray(prev, dtype=jnp.float32)
    n = jnp.asarray(nxt, dtype=jnp.float32)

    want = sys.argv[1:] or ["tiled", "resident"]

    if "tiled" in want:
        from tpuflow.kernels import horn_schunck_pallas

        timed("tiled f10 128x1024",
              lambda: horn_schunck_pallas(p, n, WINDOW, ITERS, ALPHA,
                                          tile_h=128, tile_w=1024, fuse=10))
    pb = p.astype(jnp.bfloat16)
    nb = n.astype(jnp.bfloat16)
    for spec in want:
        parts = spec.split(":")
        kind = parts[0]
        if kind not in ("tiled", "pipe", "roll", "rollpipe", "broll",
                        "brollpipe", "roll2", "roll2pipe"):
            continue
        th, tw, f = int(parts[1]), int(parts[2]), int(parts[3])
        bf16 = len(parts) > 4 and parts[4] == "bf16"
        from tpuflow.kernels import horn_schunck_pallas

        a, b = (pb, nb) if bf16 else (p, n)
        roll_arg = ("batched" if kind.startswith("b")
                    else "two_stage" if kind.startswith("roll2")
                    else kind in ("roll", "rollpipe"))
        timed(f"{kind} f{f} {th}x{tw}{' bf16' if bf16 else ''}",
              lambda a=a, b=b, th=th, tw=tw, f=f,
              p_=(kind in ("pipe", "rollpipe", "brollpipe",
                           "roll2pipe")),
              r_=roll_arg:
              horn_schunck_pallas(a, b, WINDOW, ITERS, ALPHA, tile_h=th,
                                  tile_w=tw, fuse=f, pipelined=p_,
                                  roll=r_))
    if "resident" in want:
        from tpuflow.kernels import horn_schunck_pallas_resident

        timed("resident",
              lambda: horn_schunck_pallas_resident(p, n, WINDOW, ITERS,
                                                   ALPHA))
    if "resident2" in want:
        from tpuflow.kernels.hs_stencil import horn_schunck_pallas_resident2

        timed("resident2",
              lambda: horn_schunck_pallas_resident2(p, n, WINDOW, ITERS,
                                                    ALPHA))


if __name__ == "__main__":
    main()
