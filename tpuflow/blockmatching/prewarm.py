"""Region-bucket ladder pre-warming for the flagship pipeline.

The jitted matchers take the (bucketed) region count as a static
argument (matcher.region_bucket): a REAL frame sequence drifts across
buckets, and each fresh bucket costs a ~10-20 s XLA compile that lands
in the middle of the stream (round-4 measurement: 121-pair sweep median
2.52 s/pair but p90 3.12 s — almost all bucket recompiles). The
reference binary never recompiles anything
(Scratch_MeaningfulMotion.cpp:79 frame loop); this module restores that
property for the steady state by compiling the plausible neighbor
buckets in a background thread while the first pairs stream.

Design notes:

- The warmers CALL the real driver dispatch path
  (:func:`matcher._match_device_bidirectional` and the device-side
  composition) on zero frames with a synthetic label map of exactly the
  target bucket's region count — the one way to guarantee the warmed
  jit signature (shapes, dtypes, statics) is identical to what the
  stream will request. Executing the dummy search costs ~0.5 s of
  device time per bucket; the payoff is removing a 10-20 s compile from
  the stream's tail.
- jit caches are process-global and thread-safe, so a daemon thread
  warms them for the main loop; the persistent compile cache
  (~/.cache/tpuflow_jax) makes the work durable across runs.
- The ladder is matcher.region_bucket's 1-2-3 x 2^k pattern; real
  sequences drift a rung or two around the first frame's count, so the
  default warms one rung below and one above plus the current rung's
  bidirectional program (the first pair only compiles the
  unidirectional one).
"""

from __future__ import annotations

import threading

import jax.numpy as jnp
import numpy as np

from tpuflow.blockmatching.matcher import region_bucket

#: The bucket ladder: 128 * (2^k or 3*2^k), ascending. Large enough for
#: any realistic segmentation (2^22 regions).
LADDER = tuple(sorted({128 * (b << k) for b in (1, 3) for k in range(16)}))


def neighbor_buckets(n_regions: int, below: int = 1, above: int = 1,
                     include_current: bool = True) -> list[int]:
    """The bucket rungs a sequence whose current frame has ``n_regions``
    regions plausibly visits: ``below`` rungs under and ``above`` rungs
    over the current bucket (clipped to the ladder)."""
    cur = region_bucket(n_regions)
    i = LADDER.index(cur)
    lo = max(0, i - below)
    hi = min(len(LADDER), i + above + 1)
    out = [b for b in LADDER[lo:hi] if include_current or b != cur]
    return out


def _synthetic_labels(h: int, w: int, n_regions: int) -> np.ndarray:
    """A label map whose region count is exactly ``n_regions`` (the
    first n-1 pixels are singleton regions, the rest region n-1) — the
    cheapest map with the right static signature."""
    if n_regions > h * w:
        raise ValueError(f"bucket {n_regions} exceeds {h}x{w} pixels")
    flat = np.full(h * w, n_regions - 1, np.int32)
    flat[: n_regions - 1] = np.arange(n_regions - 1, dtype=np.int32)
    return flat.reshape(h, w)


def warm_bucket(frame_shape: tuple[int, int], bucket: int,
                search_range: int = 61, subpixel_scale: int = 2,
                chunk: int = 16, bm_method: str = "matmul",
                bidirectional: bool = True,
                include_compose: bool = True) -> None:
    """Compile (and once execute) the bucket-static flagship programs
    for one bucket rung: the fused bidirectional search (or the
    unidirectional one) and the device-side Vector_ST composition."""
    from tpuflow.blockmatching.matcher import (
        _match_device,
        _match_device_bidirectional,
    )
    from tpuflow.solvers.bm_flow import (
        _compose_bidirectional,
        _compose_unidirectional,
    )

    h, w = frame_shape
    labels = _synthetic_labels(h, w, bucket)
    zero = jnp.zeros((h, w, 3), jnp.float32)
    if bidirectional:
        d_prev, d_next = _match_device_bidirectional(
            zero, zero, zero, labels, bucket, search_range, 1.0, 0.5,
            subpixel_scale, chunk, bm_method)
    else:
        d_prev = _match_device(zero, zero, labels, bucket, search_range,
                               1.0, 0.5, subpixel_scale, chunk, bm_method)
        d_next = None
    if include_compose:
        labels_j = jnp.asarray(labels)
        zf = jnp.zeros((h, w), jnp.float32)

        def table(uv, cost):
            return jnp.concatenate([uv, cost[:, None]], axis=-1)

        if bidirectional:
            out = _compose_bidirectional(labels_j, table(*d_prev),
                                         table(*d_next), zf, zf, zf, zf)
        else:
            out = _compose_unidirectional(labels_j, table(*d_prev), zf, zf)
        out[0].block_until_ready()
    else:
        d_prev[0].block_until_ready()


def warm_refine(frame_shape: tuple[int, int], iter_max: int = 2048,
                error_min_threshold: float = 1.0e-6,
                sup_mode: str = "reference",
                plateau_rtol: float = 0.0) -> None:
    """Compile the (bucket-INdependent, frame-shape-dependent) batched
    bidirectional gradient refinement the steady state runs every pair
    — its one-time compile otherwise lands on pair 1 of the stream.
    Zero fields stop at the first energy check, so execution is cheap."""
    from tpuflow.solvers.bm_flow import gradient_method_flow_bidirectional

    h, w = frame_shape
    zero3 = jnp.zeros((h, w, 3), jnp.float32)
    labels = jnp.zeros((h, w), jnp.int32)
    outs = gradient_method_flow_bidirectional(
        [zero3, zero3], zero3, labels, iter_max=iter_max,
        error_min_threshold=error_min_threshold, sup_mode=sup_mode,
        plateau_rtol=plateau_rtol)
    outs[0][0].block_until_ready()


def prewarm_flagship(
    frame_shape: tuple[int, int],
    n_regions_hint: int,
    below: int = 1,
    above: int = 1,
    search_range: int = 61,
    subpixel_scale: int = 2,
    chunk: int = 16,
    bm_method: str = "matmul",
    profile: str | None = None,
    include_refine: bool = False,
    refine_iter_max: int = 2048,
    error_min_threshold: float = 1.0e-6,
    refine_sup_mode: str = "reference",
    refine_plateau_rtol: float = 0.0,
    background: bool = True,
):
    """Warm the flagship's bucket ladder around ``n_regions_hint``.

    Compiles the fused bidirectional search + composition for the
    current bucket and ``below``/``above`` neighbor rungs (and
    optionally the batched refine), either synchronously
    (``background=False`` — a cache-priming script) or on a daemon
    thread that races the stream's first pairs (the jit caches are
    process-global). Returns the thread (or None when synchronous).

    ``profile`` applies the same knob bundle as the driver
    (:data:`tpuflow.solvers.bm_flow.PROFILES`), so a profiled stream
    warms exactly the search/refine programs it will run (seg-side
    knobs like ``seg_scale`` don't affect the warmed signatures — the
    bucket hint already comes from the real segmentation).
    """
    import os

    from tpuflow.solvers.bm_flow import PROFILES

    # Kill-switch for test suites / constrained hosts: background
    # compiles of neighbor buckets are pure steady-state optimization.
    if background and os.environ.get("TPUFLOW_NO_PREWARM"):
        return None
    if profile is not None:
        knobs = PROFILES[profile]
        bm_method = knobs.get("bm_method", bm_method)
        refine_sup_mode = knobs.get("refine_sup_mode", refine_sup_mode)
        refine_plateau_rtol = knobs.get("refine_plateau_rtol",
                                        refine_plateau_rtol)
        if "refine_iter_max" in knobs:
            refine_iter_max = min(refine_iter_max,
                                  knobs["refine_iter_max"])
    buckets = neighbor_buckets(int(n_regions_hint), below, above)
    h, w = frame_shape
    buckets = [b for b in buckets if b <= h * w]

    def _run():
        from tpuflow.utils.telemetry import get_telemetry

        tel = get_telemetry()
        if include_refine:
            try:
                warm_refine(frame_shape, refine_iter_max,
                            error_min_threshold, refine_sup_mode,
                            refine_plateau_rtol)
                tel.event("prewarm.refine", shape=list(frame_shape))
            except Exception as e:  # pragma: no cover - defensive
                tel.event("prewarm.error", stage="refine", error=repr(e))
        for b in buckets:
            try:
                warm_bucket(frame_shape, b, search_range,
                            subpixel_scale, chunk, bm_method)
                tel.event("prewarm.bucket", bucket=b)
            except Exception as e:  # pragma: no cover - defensive
                tel.event("prewarm.error", stage=f"bucket{b}",
                          error=repr(e))

    if not background:
        _run()
        return None
    t = threading.Thread(target=_run, name="tpuflow-prewarm", daemon=True)
    t.start()
    return t
