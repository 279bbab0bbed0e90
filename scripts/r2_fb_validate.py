"""Round-2 TPU run: validate fused FB kernels on hardware, then bench.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/r2_fb_validate.py
"""

from __future__ import annotations

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    from tpuflow.solvers import farneback as fb

    rng = np.random.default_rng(0)
    # --- hardware equivalence: poly expansion (Pallas vs jnp path) ---
    img = jnp.asarray(rng.uniform(0, 255, (200, 300)), jnp.float32)
    t0 = time.perf_counter()
    got = jax.jit(lambda a: fb.poly_expansion(a, 8, 1.2))(img)
    jax.block_until_ready(got)
    print(f"poly pallas compile+run: {time.perf_counter() - t0:.1f} s",
          flush=True)
    os.environ["TPUFLOW_NO_PALLAS"] = "1"
    want = jax.jit(lambda a: fb.poly_expansion(a, 8, 1.2))(img)
    jax.block_until_ready(want)
    del os.environ["TPUFLOW_NO_PALLAS"]
    for name, g, w in zip(("b1", "b2", "a11", "a22", "a12"), got, want):
        err = float(jnp.max(jnp.abs(g - w)))
        rel = err / (float(jnp.max(jnp.abs(w))) + 1e-30)
        print(f"poly {name}: max abs err {err:.3e} (rel {rel:.3e})",
              flush=True)

    # --- hardware equivalence: blur+solve ---
    M = jnp.asarray(rng.normal(size=(5, 200, 300)), jnp.float32)
    got_uv = jax.jit(lambda m: fb._blur_solve(m, 48, False))(M)
    jax.block_until_ready(got_uv)
    os.environ["TPUFLOW_NO_PALLAS"] = "1"
    want_uv = jax.jit(lambda m: fb._blur_solve(m, 48, False))(M)
    jax.block_until_ready(want_uv)
    del os.environ["TPUFLOW_NO_PALLAS"]
    for name, g, w in zip(("u", "v"), got_uv, want_uv):
        err = float(jnp.max(jnp.abs(g - w)))
        print(f"blur_solve {name}: max abs err {err:.3e}", flush=True)

    # --- full-path accuracy anchor: stream config vs no-pallas path ---
    prev = rng.uniform(0, 255, (256, 512)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    prev = gaussian_filter(prev, 3).astype(np.float32)
    nxt = np.roll(prev, 2, axis=1)
    got_f = fb.calc_optical_flow_farneback(prev, nxt, None,
                                           0.4, 1, 48, 2, 8, 1.2, 0)
    jax.block_until_ready(got_f)
    os.environ["TPUFLOW_NO_PALLAS"] = "1"
    want_f = fb.calc_optical_flow_farneback(prev, nxt, None,
                                            0.4, 1, 48, 2, 8, 1.2, 0)
    jax.block_until_ready(want_f)
    del os.environ["TPUFLOW_NO_PALLAS"]
    for name, g, w in zip(("u", "v"), got_f, want_f):
        err = float(jnp.max(jnp.abs(np.asarray(g) - np.asarray(w))))
        print(f"farneback stream {name}: max abs err {err:.3e}", flush=True)

    print("=== stage bench (1080p) ===", flush=True)
    import scripts.bench_farneback as bf

    bf.main()

    print("=== gather microbench ===", flush=True)
    import scripts.bench_gather as bg

    bg.main()


if __name__ == "__main__":
    main()
