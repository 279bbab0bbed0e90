"""Flow quiver rasterization (array-out, no GUI).

Re-implements the reference's Bresenham flow plotter
(``HornSchunckOF/plotFlow.cpp:43-88``) and the OpenCV line-draw quivers of
the Farneback demos (``FarnebackOF/FarnebackOF.cpp:25-38``,
``VideoDenseOF/DenseFlow.cpp:40-46``) as pure NumPy rasterization into an
RGB array; callers save with :func:`tpuflow.core.io.write_image`.

Notes on the reference's conventions (kept for visual parity):
- the grid steps every ``delta`` pixels; vectors are scaled by ``scale``;
- an ``outlier`` bound (if > 0) suppresses lines with |u| or |v| >= bound
  (plotFlow.cpp:74-78);
- line color green, endpoint red.
"""

from __future__ import annotations

import numpy as np


def _draw_line(img: np.ndarray, x0: int, y0: int, x1: int, y1: int,
               color: tuple[int, int, int]) -> None:
    """Integer Bresenham matching plotFlow::bresenhamPoints (midpoint walk,
    endpoint excluded)."""
    dx = x1 - x0
    dy = y1 - y0
    sx = (dx > 0) - (dx < 0)
    sy = (dy > 0) - (dy < 0)
    dx, dy = abs(dx), abs(dy)
    n = max(dx, dy)
    if n == 0:
        return
    h, w = img.shape[:2]
    x, y = x0, y0
    if dx > dy:
        r = n / 2.0
        for _ in range(n):
            if 0 <= x < w - 1 and 0 <= y < h - 1:
                img[y, x] = color
            x += sx
            r += dy
            if r >= dx:
                y += sy
                r -= dx
    else:
        r = n / 2.0
        for _ in range(n):
            if 0 <= x < w - 1 and 0 <= y < h - 1:
                img[y, x] = color
            y += sy
            r += dx
            if r >= dy:
                x += sx
                r -= dy


def plot_quiver(
    image: np.ndarray,
    u: np.ndarray,
    v: np.ndarray,
    delta: int = 10,
    scale: float = 1.0,
    outlier: float = 0.0,
    line_color: tuple[int, int, int] = (0, 255, 0),
    tip_color: tuple[int, int, int] = (255, 0, 0),
) -> np.ndarray:
    """Rasterize a flow quiver over ``image``; returns an (H, W, 3) uint8."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    img = np.asarray(image)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    try:
        from tpuflow import native

        return native.draw_quiver(img, u, v, delta, scale, outlier,
                                  line_color, tip_color)
    except Exception:
        pass  # pure-Python fallback below
    out = np.ascontiguousarray(img.astype(np.uint8).copy())
    h, w = u.shape
    for y0 in range(0, h, delta):
        for x0 in range(0, w, delta):
            du, dv = u[y0, x0], v[y0, x0]
            x1 = int(x0 + du * scale)
            y1 = int(y0 + dv * scale)
            if outlier <= 0 or (abs(du) < outlier and abs(dv) < outlier):
                _draw_line(out, x0, y0, x1, y1, line_color)
            if 0 <= x1 < w - 1 and 0 <= y1 < h - 1:
                out[y1, x1] = tip_color
    return out
