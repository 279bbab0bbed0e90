"""A/B: square vs banded-disc offset window for the mean-shift filter (TPU).

The spatial kernel test is Euclidean: a data point at static offset
(dx, dy) from a query's ORIGIN pixel can only pass ``d_sp <= R^2`` when
|(dx, dy)| <= R + drift. The square window sweeps (2E+1)^2 offsets with
E = R + margin; every offset with dx^2 + dy^2 > E^2 contributes an
exact +-0.0 for every query within the drift contract (drift <= margin),
so restricting the sweep to the DISC of radius E keeps the filter's
exactness guarantee while cutting ~21.5% of the offsets (pi/4 of the
square). The accumulators never hold -0.0 (they start at +0.0 and exact
cancellation yields +0.0), so dropping +-0.0 addends is bitwise-neutral.

Variant under test: BANDED disc — contiguous dy runs whose x-half-width,
quantized UP to a multiple of ``quant``, is constant. Each band keeps the
production nested-fori_loop structure (outer dy, inner dx with unroll=8),
so XLA sees ~21 loop nests instead of 1 (full Python unroll measured a
37 s/run disaster — XLA loses the loop structure entirely at 648 bodies).

Measured (v5e via axon, 376x1240 f32, R=20, 8 iters):
  square 0.406 s | banded disc q=4 0.352 s (86.6% offsets) | q=8 0.357 s
  outputs bitwise-equal. Adopted in segmentation/meanshift.py (quant=4).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/r3_ms_disc_ab.py
"""

from __future__ import annotations

import functools
import math
import time

import numpy as np

KH, KW = 376, 1240


def _bands(E_k: int, quant: int) -> list[tuple[int, int, int]]:
    """Contiguous dy runs with constant quantized x-half-width.

    Returns (dy_lo, dy_hi, half_width) with half_width >= isqrt(E_k^2-dy^2)
    for every dy in the run (quantizing UP keeps only exact-zero extras).
    """
    bands: list[list[int]] = []
    for dy in range(-E_k, E_k + 1):
        wdx = math.isqrt(E_k * E_k - dy * dy)
        wg = min(E_k, ((wdx + quant - 1) // quant) * quant)
        if bands and bands[-1][2] == wg:
            bands[-1][1] = dy
        else:
            bands.append([dy, dy, wg])
    return [tuple(b) for b in bands]


def _disc_step(labh, state, xs, ys, E: int, E_k: int,
               hs2: float, hr2: float, quant: int):
    import jax
    import jax.numpy as jnp

    ex, ey, c0, c1, c2 = state
    h, w = ex.shape
    dt = ex.dtype

    acc = tuple(jnp.zeros((h, w), dt) for _ in range(6))
    for dy_lo, dy_hi, wg in _bands(E_k, quant):
        span_x = 2 * wg + 1

        def outer(i, acc, dy_lo=dy_lo, wg=wg, span_x=span_x):
            dy = i + dy_lo
            dyf = dy.astype(dt)
            ty2 = (dyf - ey) ** 2
            # Full-width row band: the column-0 start keeps the slice
            # lane-aligned (a trimmed E-wg start column measured 22x
            # SLOWER — relayout copies per band).
            b0 = jax.lax.dynamic_slice(labh[0], (E + dy, 0), (h, w + 2 * E))
            b1 = jax.lax.dynamic_slice(labh[1], (E + dy, 0), (h, w + 2 * E))
            b2 = jax.lax.dynamic_slice(labh[2], (E + dy, 0), (h, w + 2 * E))

            def inner(j, acc):
                s_dx, s_dy, s0, s1, s2, s_n = acc
                dx = j - wg
                dxf = dx.astype(dt)
                q0 = jax.lax.dynamic_slice(b0, (0, E + dx), (h, w))
                q1 = jax.lax.dynamic_slice(b1, (0, E + dx), (h, w))
                q2 = jax.lax.dynamic_slice(b2, (0, E + dx), (h, w))
                d_sp = (dxf - ex) ** 2 + ty2
                d_cl = (q0 - c0) ** 2 + (q1 - c1) ** 2 + (q2 - c2) ** 2
                wgt = jnp.where((d_sp <= hs2) & (d_cl <= hr2), 1.0, 0.0
                                ).astype(dt)
                return (s_dx + wgt * dxf, s_dy + wgt * dyf,
                        s0 + wgt * q0, s1 + wgt * q1, s2 + wgt * q2,
                        s_n + wgt)

            return jax.lax.fori_loop(0, span_x, inner, acc, unroll=8)

        acc = jax.lax.fori_loop(0, dy_hi - dy_lo + 1, outer, acc)
    s_dx, s_dy, s0, s1, s2, s_n = acc
    import jax.numpy as jnp

    n = jnp.maximum(s_n, 1.0)
    got = s_n > 0
    return (jnp.where(got, s_dx / n, -xs),
            jnp.where(got, s_dy / n, -ys),
            s0 / n, s1 / n, s2 / n)


def disc_filter(lab, R: int, hr: float, iters: int = 8, quant: int = 4):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
    def run(lab, R, hr, iters, quant):
        h, w = lab.shape[:2]
        dt = lab.dtype
        E = 2 * R
        hs2 = float(R) ** 2
        hr2 = float(hr) ** 2
        xs = jnp.arange(w, dtype=dt)[None, :] * jnp.ones((h, 1), dt)
        ys = jnp.arange(h, dtype=dt)[:, None] * jnp.ones((1, w), dt)
        sentinel = (jnp.max(jnp.abs(lab)) + jnp.asarray(hr + 1.0, dt)
                    ).astype(dt)
        labh = [jnp.pad(lab[..., c], E, constant_values=sentinel)
                for c in range(3)]
        state = (jnp.zeros((h, w), dt), jnp.zeros((h, w), dt),
                 lab[..., 0], lab[..., 1], lab[..., 2])
        for it in range(iters):
            state = _disc_step(labh, state, xs, ys, E,
                               R if it == 0 else E, hs2, hr2, quant)
        ex, ey, c0, c1, c2 = state
        return (jnp.stack([xs + ex, ys + ey], axis=-1),
                jnp.stack([c0, c1, c2], axis=-1))

    return run(lab, R, hr, iters, quant)


def _timed(fn, tag: str, reps: int = 4):
    t0 = time.perf_counter()
    out = [np.asarray(o) for o in fn()]
    print(f"{tag} compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = [np.asarray(o) for o in fn()]   # device-to-host fetch ends it
        dt = time.perf_counter() - t0
        best = min(best, dt)
        print(f"{tag} run {i}: {dt:.3f} s", flush=True)
    print(f"{tag} best: {best:.3f} s", flush=True)
    return out, best


def main():
    import jax
    import jax.numpy as jnp

    from tpuflow.segmentation.meanshift import mean_shift_filter

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    lab = jnp.asarray(
        gaussian_filter(rng.uniform(0, 1, (KH, KW, 3)), (2, 2, 0)),
        jnp.float32)
    jax.block_until_ready(lab)

    R, E = 20, 40
    sq = (2 * E + 1) ** 2
    for q in (4, 8):
        kept = sum((hi - lo + 1) * (2 * wg + 1) for lo, hi, wg in _bands(E, q))
        print(f"offsets/iter (E={E}): square {sq}, banded q={q} {kept} "
              f"({kept/sq:.1%}, {len(_bands(E, q))} bands)", flush=True)

    (p1, c1), t_sq = _timed(
        lambda: mean_shift_filter(lab, 20, 16.0 / 255.0), "square")
    (p2, c2), t_d4 = _timed(
        lambda: disc_filter(lab, 20, 16.0 / 255.0, quant=4), "disc q=4")
    (p3, c3), t_d8 = _timed(
        lambda: disc_filter(lab, 20, 16.0 / 255.0, quant=8), "disc q=8")

    for tag, p, c in (("q=4", p2, c2), ("q=8", p3, c3)):
        bit = (np.asarray(p1) == p).all() and (np.asarray(c1) == c).all()
        dp = np.abs(np.asarray(p1) - p).max()
        print(f"{tag}: bitwise-equal={bit} max|pos diff|={dp:.4g}", flush=True)
    print(f"speedup q=4: {t_sq/t_d4:.3f}x   q=8: {t_sq/t_d8:.3f}x", flush=True)


if __name__ == "__main__":
    main()
