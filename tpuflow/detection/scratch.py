"""Film-scratch detection (DetectScratch, MeaningfulAlignments/Detection.cpp:7-132).

Per pixel of the (optionally epsilon/Gaussian pre-filtered) frame:

- Im = horizontal median over a width-3 window;
- candidate if |I - Im| >= s_med;
- confirmed if the left/right side averages agree: Il over
  x - AVE_FAR .. x - 2, Ir over x + 2 .. x + AVE_FAR (border-clamped,
  averaged over however many pixels exist), |Il - Ir| <= s_avg;
- output PLOT_INTENSITY_MAX (255) at confirmed pixels, 0 elsewhere.

Pixels whose side window is empty (x <= 1 or x >= W-2) are never flagged
(the reference divides 0/0 there and the NaN comparison rejects).

Everything is dense row-wise arithmetic (cumulative sums for the
variable-width side windows) and jit-fuses into one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuflow.core.config import (
    AVE_FAR,
    FILTER_ID_EPSILON,
    FILTER_ID_GAUSSIAN,
    MEAN_WIDTH,
    PLOT_INTENSITY_MAX,
    SCRATCH_WIDTH,
    FilterParam,
)
from tpuflow.ops.filters import epsilon_filter, gaussian_filter, horizontal_median


def apply_prefilter(img: jnp.ndarray, filter_param: FilterParam | None):
    """The DetectScratch pre-filter dispatch (Detection.cpp:36-66)."""
    if filter_param is None:
        return img
    if filter_param.type == FILTER_ID_EPSILON:
        return epsilon_filter(img, filter_param.size, filter_param.epsilon)
    if filter_param.type == FILTER_ID_GAUSSIAN:
        return gaussian_filter(img, filter_param.size,
                               filter_param.std_deviation)
    return img


@functools.partial(jax.jit, static_argnames=())
def _detect(img: jnp.ndarray, s_med: float, s_avg: float) -> jnp.ndarray:
    h, w = img.shape
    med = horizontal_median(img, MEAN_WIDTH)
    candidate = jnp.abs(img - med) >= s_med

    # Side averages via row cumsums: S[:, i] = sum img[:, :i].
    S = jnp.concatenate(
        [jnp.zeros((h, 1), img.dtype), jnp.cumsum(img, axis=1)], axis=1)
    xs = jnp.arange(w)
    half = SCRATCH_WIDTH // 2  # = 1

    la = jnp.maximum(0, xs - AVE_FAR)
    lb = xs - half - 1  # inclusive upper bound x-2
    l_cnt = jnp.maximum(lb - la + 1, 0)
    l_sum = S[:, jnp.clip(lb + 1, 0, w)] - S[:, la]
    ra = xs + half + 1  # x+2
    rb = jnp.minimum(w - 1, xs + AVE_FAR)
    r_cnt = jnp.maximum(rb - ra + 1, 0)
    r_sum = S[:, jnp.clip(rb + 1, 0, w)] - S[:, jnp.clip(ra, 0, w)]

    ok_sides = (l_cnt > 0) & (r_cnt > 0)
    il = l_sum / jnp.maximum(l_cnt, 1)[None, :]
    ir = r_sum / jnp.maximum(r_cnt, 1)[None, :]
    confirmed = candidate & ok_sides[None, :] & (jnp.abs(il - ir) <= s_avg)
    return jnp.where(confirmed, float(PLOT_INTENSITY_MAX), 0.0).astype(img.dtype)


def detect_scratch(
    img: jnp.ndarray,
    s_med: float = 3.0,
    s_avg: float = 20.0,
    filter_param: FilterParam | None = None,
    do_detection: bool = True,
):
    """DetectScratch. Returns (scratch_map, filtered_img).

    With do_detection=False returns the filtered image as the map (the
    ``--filtered`` output mode, Detection.cpp:81-84).
    """
    filtered = apply_prefilter(jnp.asarray(img), filter_param)
    if not do_detection:
        return filtered, filtered
    return _detect(filtered, float(s_med), float(s_avg)), filtered
