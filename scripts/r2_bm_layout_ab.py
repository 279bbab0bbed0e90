"""A/B the BM matmul evaluator's RHS layout on the real TPU.

The evaluator currently materializes an explicit (CH, P, 7) ->
(P, CH*7) transpose before every strip-chunk matmul (~12 G floats of
relayout per direction at KITTI res). Variant B contracts the
un-transposed (CH, P, 7) array directly with dot_general
(contract P, rhs non-contracting dims (CH, 7)) — same math bitwise,
but XLA can fold the relayout into the matmul operand fetch.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/r2_bm_layout_ab.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

KH, KW = 376, 1240


def build_variant(transpose_free: bool):
    import jax
    import jax.numpy as jnp

    from tpuflow.blockmatching.matcher import (
        _cost_from_sums,
        _host_cdiv,
        _moment_fields,
        pad_region_bounds,
        region_bucket,
        region_reduction_plan,
        search_candidates,
    )

    @functools.partial(jax.jit, static_argnames=("n_regions",))
    def integer_costs(cur_lab, ref_lab, labels, cand, n_regions):
        dt = cur_lab.dtype
        CH = 64
        R = 30
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
            L = (lab_s.reshape(P)[:, None] == reg_ids).astype(dt)
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
                return _moment_fields(cur_s, sub,
                                      (valid.astype(dt) * ins_s).reshape(P))

            def per_chunk(d_chunk):
                F = jax.vmap(fields_for)(d_chunk)          # (CH, P, 7)
                if transpose_free:
                    out = jax.lax.dot_general(
                        L, F, (((0,), (1,)), ((), ())),
                        preferred_element_type=dt)         # (R, CH, 7)
                    return out.reshape(n_regions, CH * 7)
                F2 = jnp.transpose(F, (1, 0, 2)).reshape(P, CH * 7)
                return jax.lax.dot_general(
                    L, F2, (((0,), (0,)), ((), ())),
                    preferred_element_type=dt)
            return acc + jax.lax.map(per_chunk, chunks), None

        acc0 = jnp.zeros((n_chunks, n_regions, CH * 7), dt)
        acc, _ = jax.lax.scan(per_strip, acc0, jnp.arange(n_s))
        sums = jnp.transpose(
            acc.reshape(n_chunks, n_regions, CH, 7),
            (0, 2, 1, 3)).reshape(-1, n_regions, 7)
        mad, zncc, _ = _cost_from_sums(sums, dt)
        return 1.0 * mad - 0.5 * zncc

    return integer_costs


def main():
    import jax
    import jax.numpy as jnp

    import tpuflow  # noqa: F401
    from tpuflow.blockmatching.matcher import search_candidates
    from tpuflow.core.color import srgb_to_lab
    from tpuflow.segmentation import segment_meanshift

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.uniform(0, 255, (KH + 8, KW + 8, 3)),
                           (2, 2, 0))
    f1 = base[4:4 + KH, 2:2 + KW]
    f0 = base[:KH, :KW]
    lab1 = np.asarray(srgb_to_lab(jnp.asarray(f1 / 255.0, jnp.float32)))
    lab0 = np.asarray(srgb_to_lab(jnp.asarray(f0 / 255.0, jnp.float32)))
    seg = segment_meanshift(lab1, 20, 16.0 / 255.0)
    from tpuflow.blockmatching.matcher import region_bucket

    n_pad = region_bucket(seg.n_regions)
    print(f"{seg.n_regions} regions (bucket {n_pad})", flush=True)

    cand_np = search_candidates(61)
    pad = (-cand_np.shape[0]) % 64
    cand = jnp.asarray(np.concatenate(
        [cand_np, np.zeros((pad, 2), cand_np.dtype)]))
    l1 = jax.device_put(jnp.asarray(lab1))
    l0 = jax.device_put(jnp.asarray(lab0))
    labels = jax.device_put(jnp.asarray(seg.labels))

    out = {}
    for name, tf in (("transpose", False), ("dot_general", True)):
        fn = build_variant(tf)
        c = fn(l1, l0, labels, cand, n_pad)
        np.asarray(c[0, 0])
        t0 = time.perf_counter()
        c = fn(l1, l0, labels, cand, n_pad)
        np.asarray(c[0, 0])
        print(f"{name}: {time.perf_counter() - t0:.3f} s (integer stage)",
              flush=True)
        out[name] = np.asarray(c)

    d = np.abs(out["transpose"] - out["dot_general"])
    print(f"max |dcost| = {d.max():.3e}", flush=True)


if __name__ == "__main__":
    main()
