"""Pallas-call launch overhead microbench on the tunneled v5e.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_overhead.py
"""
from __future__ import annotations

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("devices:", jax.devices(), flush=True)

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(x, k: int):
        for _ in range(k):
            x = pl.pallas_call(
                copy_kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(x)
        return x

    x = jnp.zeros((1080, 1920), jnp.float32)

    for k in (1, 10, 40):
        chained(x, k)  # compile
        out = chained(x, k)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = chained(x, k)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"chain of {k} pallas calls (1080p copy): {best*1e3:.3f} ms "
              f"({best*1e3/k:.3f} ms/call)", flush=True)

    # Same chain as pure XLA adds for comparison.
    @functools.partial(jax.jit, static_argnames=("k",))
    def chained_xla(x, k: int):
        for _ in range(k):
            x = x + 1.0
        return x

    for k in (40,):
        chained_xla(x, k)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = chained_xla(x, k)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"chain of {k} XLA adds: {best*1e3:.3f} ms "
              f"({best*1e3/k:.3f} ms/op)", flush=True)


if __name__ == "__main__":
    main()
