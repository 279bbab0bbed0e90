"""Motion compensation: synthesize a predicted frame by warping along flow.

Reconstruction of the missing ``MotionCompensation<T>`` submodule class
(call sites: ``OpticalFlow/OpticalFlow.cpp:389-424``,
``OpticalFlow_BlockMatching.cpp:595-830``, ``HOG/HOG_match.cpp:125-145``;
SURVEY.md §2.4). The flow u maps frame t to frame t+1
(It(x) ~ Itp1(x + u(x))), so the compensated image warps the *next* frame
back through u to predict the *previous* one — its quality is the visual
check of flow accuracy the reference relies on (SURVEY.md §4).

Both nearest (the C++-style integer round) and bilinear sampling are
provided; out-of-range reads are zero-padded.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpuflow.core import borders as bd


def compensate(next_img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               method: str = "nearest") -> jnp.ndarray:
    """Warp next_img by (u, v): out(x, y) = next(x + u, y + v).

    Supports (H, W) gray or (H, W, C) color (channels warped identically).
    """
    h, w = u.shape
    xs = jnp.arange(w)[None, :] + u
    ys = jnp.arange(h)[:, None] + v

    chan_first = None
    img = next_img
    if img.ndim == 3:
        chan_first = img.shape[-1]
        img = jnp.moveaxis(img, -1, 0)  # (C, H, W)

    if method == "nearest":
        xi = jnp.round(xs).astype(jnp.int32)
        yi = jnp.round(ys).astype(jnp.int32)
        out = bd.gather2d(img, xi, yi, bd.ZERO)
    elif method == "bilinear":
        x0 = jnp.floor(xs).astype(jnp.int32)
        y0 = jnp.floor(ys).astype(jnp.int32)
        fx = (xs - x0).astype(img.dtype)
        fy = (ys - y0).astype(img.dtype)
        p00 = bd.gather2d(img, x0, y0, bd.ZERO)
        p10 = bd.gather2d(img, x0 + 1, y0, bd.ZERO)
        p01 = bd.gather2d(img, x0, y0 + 1, bd.ZERO)
        p11 = bd.gather2d(img, x0 + 1, y0 + 1, bd.ZERO)
        out = ((1 - fx) * (1 - fy) * p00 + fx * (1 - fy) * p10
               + (1 - fx) * fy * p01 + fx * fy * p11)
    else:
        raise ValueError(f"unknown method {method}")

    if chan_first is not None:
        out = jnp.moveaxis(out, 0, -1)
    return out
