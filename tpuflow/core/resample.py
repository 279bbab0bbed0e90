"""Image resampling — the missing ``pnm_resize`` surface
(PNM_Resize_ZeroOrderHold / PNM_Resize_Bicubic, used by the orchestrator's
``--resample`` path, Scratch_MeaningfulMotion.cpp:156-209).

- zero-order hold: nearest source pixel by index scaling (floor);
- bicubic: Keys cubic convolution (a = -0.5), clamped borders — standard
  pnmlib behavior; runs as jitted separable gathers on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

ZERO_ORDER_HOLD = 0
BICUBIC = 1


@functools.partial(jax.jit, static_argnames=("out_wh",))
def resize_zero_order_hold(img: jnp.ndarray, out_wh: tuple[int, int]):
    ow, oh = out_wh
    h, w = img.shape[:2]
    xs = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    ys = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    xs = jnp.clip(xs, 0, w - 1)
    ys = jnp.clip(ys, 0, h - 1)
    return img[ys][:, xs]


def _keys(t, a=-0.5):
    at = jnp.abs(t)
    return jnp.where(
        at <= 1.0, (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0,
        jnp.where(at < 2.0, a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a,
                  0.0))


@functools.partial(jax.jit, static_argnames=("out_wh",))
def resize_bicubic(img: jnp.ndarray, out_wh: tuple[int, int]):
    ow, oh = out_wh
    h, w = img.shape[:2]
    dt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    imgf = img.astype(dt)

    def axis_resize(a, n_in, n_out, axis):
        pos = (jnp.arange(n_out, dtype=dt) + 0.5) * (n_in / n_out) - 0.5
        i0 = jnp.floor(pos).astype(jnp.int32)
        out = None
        for k in range(-1, 3):
            idx = jnp.clip(i0 + k, 0, n_in - 1)
            wgt = _keys(pos - (i0 + k).astype(dt))
            gathered = jnp.take(a, idx, axis=axis)
            shape = [1] * a.ndim
            shape[axis] = n_out
            term = gathered * wgt.reshape(shape)
            out = term if out is None else out + term
        return out

    out = axis_resize(imgf, h, oh, 0)
    out = axis_resize(out, w, ow, 1)
    return out


def resample(img: jnp.ndarray, out_wh: tuple[int, int],
             method: int = ZERO_ORDER_HOLD):
    if method == BICUBIC:
        return resize_bicubic(img, out_wh)
    return resize_zero_order_hold(img, out_wh)
