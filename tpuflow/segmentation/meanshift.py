"""Mean-shift segmentation over CIE-Lab (the missing ``Segmentation<Lab>``).

The reference's flagship path constructs ``Segmentation<Lab>(img, 20,
16/255)`` (OpticalFlow_BlockMatching.cpp:122-135) from the absent ImgClass
submodule; its required surface (SURVEY.md §2.4) is

- ``ref_segmentation_map()`` — per-pixel region label,
- ``ref_regions()``         — per-region pixel lists,
- ``ref_shift_vector_spatial()`` — per-pixel converged spatial position
  (written as ``shift - (x, y)`` side output, lines 183-196).

Reconstruction (Comaniciu-Meer mean-shift segmentation): every pixel is a
point in joint (x, y, L, a, b) space; each query point iteratively moves
to the mean of the *original* data points within a flat kernel (spatial
radius ``kernel_spatial``, Lab-space radius ``kernel_intensity``); pixels
whose modes coincide (within half a kernel) and touch form a region.

TPU design: the filtering iterations are the hot part and run fully on
device — a fixed number of mean-shift steps, each a dense sweep over the
(2R+1)^2 window as masked gathers at the current (rounded) query center
(no data-dependent shapes; ``lax.fori_loop`` over window offsets).
Labeling is irregular graph work on tiny data and runs host-side
(NumPy/SciPy union of adjacent near-mode pixels), per SURVEY.md §7.3.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class SegmentationResult:
    """The ``Segmentation<Lab>`` surface."""

    labels: np.ndarray          # (H, W) int32 region ids, 0..n_regions-1
    n_regions: int
    shift_spatial: np.ndarray   # (H, W, 2) converged (x, y) positions
    shift_color: np.ndarray     # (H, W, 3) converged Lab
    regions: list[np.ndarray] | None = None  # lazily built (N_i, 2) (x, y)

    def build_regions(self) -> list[np.ndarray]:
        """ref_regions(): per-region (x, y) pixel lists."""
        if self.regions is None:
            h, w = self.labels.shape
            ys, xs = np.mgrid[0:h, 0:w]
            flat = self.labels.reshape(-1)
            order = np.argsort(flat, kind="stable")
            pts = np.stack([xs.reshape(-1)[order], ys.reshape(-1)[order]], -1)
            counts = np.bincount(flat, minlength=self.n_regions)
            self.regions = list(np.split(pts, np.cumsum(counts)[:-1]))
        return self.regions


@functools.partial(jax.jit, static_argnames=("kernel_spatial",
                                             "kernel_intensity", "iters"))
def mean_shift_filter(
    lab: jnp.ndarray,
    kernel_spatial: int = 20,
    kernel_intensity: float = 16.0 / 255.0,
    iters: int = 8,
):
    """Run ``iters`` mean-shift steps; returns (pos (H,W,2) xy, color (H,W,3)).

    ``lab`` is (H, W, 3) normalized Lab. Flat kernels: spatial radius
    ``kernel_spatial`` (pixels), color radius ``kernel_intensity``
    (Euclidean in Lab).
    """
    h, w = lab.shape[:2]
    dt = lab.dtype
    R = int(kernel_spatial)
    hs2 = float(kernel_spatial) ** 2
    hr2 = float(kernel_intensity) ** 2

    xs = jnp.arange(w, dtype=dt)[None, :] * jnp.ones((h, 1), dt)
    ys = jnp.arange(h, dtype=dt)[:, None] * jnp.ones((1, w), dt)

    # Window offsets flattened: (n_off, 2) int32.
    offs = jnp.stack(
        jnp.meshgrid(jnp.arange(-R, R + 1), jnp.arange(-R, R + 1),
                     indexing="ij"), -1).reshape(-1, 2)  # (dy, dx)

    labp = lab

    def gather(img, yy, xx):
        """Clamped gather at int32 index arrays via flat axis-0 take (the
        TPU-fast gather pattern, see core.borders._take2d)."""
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        flat = img.reshape(h * w, -1) if img.ndim == 3 else img.reshape(h * w)
        out = jnp.take(flat, yy * w + xx, axis=0)
        return out

    def step(state):
        px, py, cl = state  # query positions (H, W), colors (H, W, 3)
        cy = jnp.round(py).astype(jnp.int32)
        cx = jnp.round(px).astype(jnp.int32)

        def body(k, acc):
            s_x, s_y, s_c, s_n = acc
            dy = offs[k, 0]
            dx = offs[k, 1]
            qy = cy + dy
            qx = cx + dx
            valid = (qy >= 0) & (qy < h) & (qx >= 0) & (qx < w)
            qc = gather(labp, qy, qx)  # (H, W, 3) original colors
            qxf = qx.astype(dt)
            qyf = qy.astype(dt)
            d_sp = (qxf - px) ** 2 + (qyf - py) ** 2
            d_cl = jnp.sum((qc - cl) ** 2, axis=-1)
            wgt = jnp.where(valid & (d_sp <= hs2) & (d_cl <= hr2), 1.0, 0.0
                            ).astype(dt)
            return (s_x + wgt * qxf, s_y + wgt * qyf,
                    s_c + wgt[..., None] * qc, s_n + wgt)

        z = jnp.zeros((h, w), dt)
        s_x, s_y, s_c, s_n = jax.lax.fori_loop(
            0, offs.shape[0], body,
            (z, z, jnp.zeros((h, w, 3), dt), z))
        n = jnp.maximum(s_n, 1.0)
        return s_x / n, s_y / n, s_c / n[..., None]

    state = (xs, ys, lab)
    for _ in range(iters):
        state = step(state)
    px, py, cl = state
    return jnp.stack([px, py], axis=-1), cl


def _merge_labels(pos: np.ndarray, col: np.ndarray,
                  kernel_spatial: float, kernel_intensity: float,
                  min_size: int) -> tuple[np.ndarray, int]:
    """Host-side region formation: join 4-adjacent pixels whose modes are
    within half a kernel, then absorb regions smaller than min_size into
    their most-similar touching neighbor."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    h, w = pos.shape[:2]
    idx = np.arange(h * w).reshape(h, w)
    feats = np.concatenate([pos, col], axis=-1)  # (H, W, 5)

    rows, cols = [], []
    sp_th = (0.5 * kernel_spatial) ** 2
    cl_th = kernel_intensity**2
    for axis, sl_a, sl_b in (
            (0, (slice(0, h - 1), slice(None)), (slice(1, h), slice(None))),
            (1, (slice(None), slice(0, w - 1)), (slice(None), slice(1, w)))):
        fa = feats[sl_a].reshape(-1, 5)
        fb = feats[sl_b].reshape(-1, 5)
        d_sp = ((fa[:, :2] - fb[:, :2]) ** 2).sum(-1)
        d_cl = ((fa[:, 2:] - fb[:, 2:]) ** 2).sum(-1)
        ok = (d_sp <= sp_th) & (d_cl <= cl_th)
        rows.append(idx[sl_a].reshape(-1)[ok])
        cols.append(idx[sl_b].reshape(-1)[ok])
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    g = coo_matrix((np.ones(len(r)), (r, c)), shape=(h * w, h * w))
    n, lab = connected_components(g, directed=False)
    lab = lab.reshape(h, w)

    if min_size > 1:
        for _ in range(64):  # until no tiny region remains (or give up)
            counts = np.bincount(lab.reshape(-1), minlength=n)
            tiny = np.nonzero(counts < min_size)[0]
            tiny = tiny[counts[tiny] > 0]
            if len(tiny) == 0:
                break
            tiny_set = set(tiny.tolist())
            # For each tiny region: merge into the neighbor label with the
            # closest mean color among touching pixels.
            mean_col = np.zeros((n, 3))
            np.add.at(mean_col, lab.reshape(-1), col.reshape(-1, 3))
            mean_col /= np.maximum(counts, 1)[:, None]
            remap = np.arange(n)
            pairs = set()
            for sl_a, sl_b in (
                    ((slice(0, h - 1), slice(None)), (slice(1, h), slice(None))),
                    ((slice(None), slice(0, w - 1)), (slice(None), slice(1, w)))):
                la = lab[sl_a].reshape(-1)
                lb = lab[sl_b].reshape(-1)
                m = la != lb
                pairs.update(zip(la[m].tolist(), lb[m].tolist()))
            best: dict[int, tuple[float, int]] = {}
            for a, b in pairs:
                for t, o in ((a, b), (b, a)):
                    if t in tiny_set:
                        d = float(((mean_col[t] - mean_col[o]) ** 2).sum())
                        if t not in best or d < best[t][0]:
                            best[t] = (d, o)
            if not best:
                break
            for t, (_, o) in best.items():
                remap[t] = o
            # Resolve chains.
            for _ in range(8):
                remap = remap[remap]
            lab = remap[lab]
        # Compact labels.
        uniq, lab = np.unique(lab, return_inverse=True)
        lab = lab.reshape(h, w)
        n = len(uniq)
    return lab.astype(np.int32), n


def segment_meanshift(
    lab: np.ndarray,
    kernel_spatial: int = 20,
    kernel_intensity: float = 16.0 / 255.0,
    iters: int = 8,
    min_size: int = 16,
) -> SegmentationResult:
    """Full segmentation: device mean-shift filtering + host labeling."""
    pos, col = mean_shift_filter(jnp.asarray(lab), kernel_spatial,
                                 float(kernel_intensity), iters)
    pos = np.asarray(pos)
    col = np.asarray(col)
    labels, n = _merge_labels(pos, col, float(kernel_spatial),
                              float(kernel_intensity), min_size)
    return SegmentationResult(labels=labels, n_regions=n,
                              shift_spatial=pos, shift_color=col)
