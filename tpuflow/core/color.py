"""Color conversions: RGB<->gray, sRGB->CIE Lab.

The reference relies on the missing ``pnm_lib_cpp`` submodule's
``PNM_DOUBLE::RGB2Gray`` (used at ``Scratch_MeaningfulMotion.cpp:247``) and
the missing ``ImgClass::Lab::set(RGB)`` sRGB->CIE-Lab conversion (used by the
block-matching path, ``OpticalFlow/OpticalFlow_BlockMatching.cpp:75-81``).
Their behavior is reconstructed here with the standard definitions:

- gray: ITU-R BT.601 luma (0.299 R + 0.587 G + 0.114 B), the same weights
  OpenCV's cvtColor(BGR2GRAY) uses, matching the demo projects
  (``HornSchunckOF/main.cpp:11-26``).
- Lab: sRGB (D65) gamma linearization -> XYZ -> CIE L*a*b*. Inputs are
  normalized sRGB in [0, 1] (the reference normalizes by MaxInt before
  converting, ``OpticalFlow_BlockMatching.cpp:66-81``); output L is scaled
  to [0, 1] (L*/100) so matching/gradient thresholds stay resolution-free.

IMPORTANT: the reference's missing ``ImgClass::Lab`` carries STANDARD
CIE units (L* in [0, 100]), and every constant the reference tunes
against Lab quantities (the matcher's coeff_MAD=1/coeff_ZNCC=0.5
balance, the refinement sigmas 0.2/sqrt(2) and 0.03/sqrt(2)) assumes
that scale. Consumers that implement reference-contracted math multiply
by :data:`LAB_SCALE` internally (blockmatching/matcher.py,
solvers/bm_flow.py) — round 3 measured the normalized scale silently
degenerating both the matching cost and the robust penalties.

Everything is elementwise jnp and fuses under jit.
"""

from __future__ import annotations

#: Factor between this module's normalized Lab ([0, 1] L) and the
#: standard CIE scale the reference's constants assume.
LAB_SCALE = 100.0

import jax.numpy as jnp

# BT.601 luma weights (OpenCV RGB2GRAY).
_LUMA_R, _LUMA_G, _LUMA_B = 0.299, 0.587, 0.114

# sRGB -> XYZ (D65) matrix rows.
_SRGB_TO_XYZ = (
    (0.4124564, 0.3575761, 0.1804375),
    (0.2126729, 0.7151522, 0.0721750),
    (0.0193339, 0.1191920, 0.9503041),
)
# D65 reference white.
_XN, _YN, _ZN = 0.95047, 1.0, 1.08883


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) -> (..., H, W) BT.601 luma."""
    return (
        _LUMA_R * rgb[..., 0] + _LUMA_G * rgb[..., 1] + _LUMA_B * rgb[..., 2]
    )


def gray_to_rgb(gray: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) -> (..., H, W, 3) by channel replication (pnm Gray2RGB)."""
    return jnp.stack([gray, gray, gray], axis=-1)


def _srgb_linearize(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    delta = 6.0 / 29.0
    return jnp.where(
        t > delta**3, jnp.cbrt(t), t / (3.0 * delta**2) + 4.0 / 29.0
    )


def srgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """Normalized sRGB (..., H, W, 3) in [0,1] -> Lab (..., H, W, 3).

    L is scaled to [0, 1]; a, b are scaled by 1/100 to keep all channels on
    comparable ranges for the Lab-space block-matching cost.
    """
    lin = _srgb_linearize(rgb)
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    x = _SRGB_TO_XYZ[0][0] * r + _SRGB_TO_XYZ[0][1] * g + _SRGB_TO_XYZ[0][2] * b
    y = _SRGB_TO_XYZ[1][0] * r + _SRGB_TO_XYZ[1][1] * g + _SRGB_TO_XYZ[1][2] * b
    z = _SRGB_TO_XYZ[2][0] * r + _SRGB_TO_XYZ[2][1] * g + _SRGB_TO_XYZ[2][2] * b
    fx = _lab_f(x / _XN)
    fy = _lab_f(y / _YN)
    fz = _lab_f(z / _ZN)
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return jnp.stack([L / 100.0, a / 100.0, bb / 100.0], axis=-1)
