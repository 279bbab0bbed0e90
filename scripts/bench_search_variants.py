"""A/B variants of the strip-one-hot matmul BM search (real TPU).

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_search_variants.py
"""
from __future__ import annotations

import functools
import time

import numpy as np

KH, KW = 376, 1240


def build_eval(out_axes1: bool, bf16: bool, chunk: int):
    import jax
    import jax.numpy as jnp

    from tpuflow.blockmatching.matcher import (
        _cost_from_sums,
        _host_cdiv,
        _moment_fields,
        search_candidates,
    )

    @functools.partial(jax.jit, static_argnames=("n_regions", "radius"))
    def integer_costs(cur_lab, ref_lab, labels, n_regions, cand, radius):
        dt = cur_lab.dtype
        cdt = jnp.bfloat16 if bf16 else dt
        CH = chunk
        R = radius
        STRIP = 8
        h, w = cur_lab.shape[:2]
        n_ch_col = cur_lab.shape[-1]
        hp = _host_cdiv(h, STRIP) * STRIP
        n_s = hp // STRIP
        P = STRIP * w
        cur_p = jnp.pad(cur_lab, ((0, hp - h), (0, 0), (0, 0)))
        inside = jnp.pad(jnp.ones((h, w), dt), ((0, hp - h), (0, 0)))
        lab_p = jnp.pad(labels, ((0, hp - h), (0, 0)))
        ref_p = jnp.pad(ref_lab, ((R, R + hp - h), (R, R), (0, 0)))
        chunks = cand.reshape(-1, CH, 2)
        n_chunks = chunks.shape[0]
        ys_l = jnp.arange(STRIP, dtype=jnp.int32)[:, None]
        xs = jnp.arange(w, dtype=jnp.int32)[None, :]
        reg_ids = jnp.arange(n_regions, dtype=jnp.int32)[None, :]

        def per_strip(acc, s):
            y0 = s * STRIP
            lab_s = jax.lax.dynamic_slice(lab_p, (y0, 0), (STRIP, w))
            L = (lab_s.reshape(P)[:, None] == reg_ids).astype(cdt)
            cur_s = jax.lax.dynamic_slice(
                cur_p, (y0, 0, 0), (STRIP, w, n_ch_col)).reshape(P, n_ch_col)
            ins_s = jax.lax.dynamic_slice(inside, (y0, 0), (STRIP, w))
            block = jax.lax.dynamic_slice(
                ref_p, (y0, 0, 0), (STRIP + 2 * R, w + 2 * R, n_ch_col))

            def fields_for(d):
                dy, dx = d[0], d[1]
                sub = jax.lax.dynamic_slice(
                    block, (R + dy, R + dx, 0),
                    (STRIP, w, n_ch_col)).reshape(P, n_ch_col)
                valid = ((y0 + ys_l + dy >= 0) & (y0 + ys_l + dy < h)
                         & (xs + dx >= 0) & (xs + dx < w))
                return _moment_fields(
                    cur_s, sub, (valid.astype(dt) * ins_s).reshape(P))

            def per_chunk(d_chunk):
                if out_axes1:
                    F = jax.vmap(fields_for, out_axes=1)(d_chunk)
                    F2 = F.reshape(P, CH * 7)
                else:
                    F = jax.vmap(fields_for)(d_chunk)
                    F2 = jnp.transpose(F, (1, 0, 2)).reshape(P, CH * 7)
                return jax.lax.dot_general(
                    L, F2.astype(cdt), (((0,), (0,)), ((), ())),
                    preferred_element_type=dt)

            return acc + jax.lax.map(per_chunk, chunks), None

        acc0 = jnp.zeros((n_chunks, n_regions, CH * 7), dt)
        acc, _ = jax.lax.scan(per_strip, acc0, jnp.arange(n_s))
        sums = jnp.transpose(
            acc.reshape(n_chunks, n_regions, CH, 7),
            (0, 2, 1, 3)).reshape(-1, n_regions, 7)
        mad, zncc, _ = _cost_from_sums(sums, dt)
        return mad - 0.5 * zncc

    return integer_costs


def main():
    import jax
    import jax.numpy as jnp

    from tpuflow.blockmatching.matcher import search_candidates
    from tpuflow.core.color import srgb_to_lab
    from tpuflow.segmentation import segment_meanshift

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.uniform(0, 255, (KH + 8, KW + 8, 3)),
                           (2, 2, 0))
    f0 = base[:KH, :KW]
    f1 = base[4 : 4 + KH, 2 : 2 + KW]
    lab0 = np.asarray(srgb_to_lab(jnp.asarray(f0 / 255.0, jnp.float32)))
    lab1 = np.asarray(srgb_to_lab(jnp.asarray(f1 / 255.0, jnp.float32)))
    seg = segment_meanshift(lab1, 20, 16.0 / 255.0)
    labels = jnp.asarray(seg.labels)
    n_pad = 384

    for name, oa, bf, ch in (
        ("base (transpose, f32, ch64)", False, False, 64),
        ("out_axes=1, f32, ch64", True, False, 64),
        ("bf16 dot, ch64", False, True, 64),
        ("f32 ch128", False, False, 128),
    ):
        ev = build_eval(oa, bf, ch)
        cand_np = search_candidates(61)
        pad = (-cand_np.shape[0]) % ch
        cand = jnp.asarray(
            np.concatenate([cand_np, np.zeros((pad, 2), cand_np.dtype)]))
        out = ev(jnp.asarray(lab1), jnp.asarray(lab0), labels, n_pad,
                 cand, 30)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = ev(jnp.asarray(lab1), jnp.asarray(lab0), labels, n_pad,
                     cand, 30)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f} s", flush=True)


if __name__ == "__main__":
    main()
