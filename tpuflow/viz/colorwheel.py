"""Middlebury-style flow color coding (standard optical-flow visualization).

The reference only draws quivers; the colorwheel is the standard dense
visualization added for the new framework's debugging/benchmark reports.
Pure jnp — jit-able, runs on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _make_colorwheel() -> np.ndarray:
    """55-entry RY/YG/GC/CB/BM/MR wheel (Baker et al., Middlebury)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


_WHEEL = jnp.asarray(_make_colorwheel())


def flow_to_color(u: jnp.ndarray, v: jnp.ndarray,
                  max_flow: float | None = None) -> jnp.ndarray:
    """(H, W) u, v -> (H, W, 3) uint8 Middlebury color coding."""
    u = jnp.asarray(u)
    v = jnp.asarray(v)
    rad = jnp.sqrt(u * u + v * v)
    if max_flow is None:
        maxrad = jnp.maximum(jnp.max(rad), 1e-9)
    else:
        maxrad = jnp.asarray(max_flow, u.dtype)
    un = u / maxrad
    vn = v / maxrad
    rad = jnp.sqrt(un * un + vn * vn)
    ncols = _WHEEL.shape[0]
    a = jnp.arctan2(-vn, -un) / jnp.pi  # [-1, 1]
    fk = (a + 1.0) / 2.0 * (ncols - 1)
    k0 = jnp.floor(fk).astype(jnp.int32)
    k1 = jnp.mod(k0 + 1, ncols)
    f = (fk - k0)[..., None]
    col0 = _WHEEL[k0] / 255.0
    col1 = _WHEEL[k1] / 255.0
    col = (1 - f) * col0 + f * col1
    radc = jnp.clip(rad, 0.0, 1.0)[..., None]
    col = 1.0 - radc * (1.0 - col)
    return (255.0 * col).astype(jnp.uint8)
