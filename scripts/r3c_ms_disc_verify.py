"""Verify the adopted banded-disc mean-shift window on the real TPU.

Times the production filter (banded disc, quant=4) against the previous
full-square sweep (reconstructed by forcing a single full-width band) on
the REAL bundled KITTI frame at reference defaults (R=20, 8 iters), and
reports how many pixels differ — expected: only out-of-contract
(drift > margin) outliers can differ, where both windows were already
truncated approximations of the true query-centered kernel.

Usage: env PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/r3c_ms_disc_verify.py
"""

from __future__ import annotations

import time

import numpy as np


def _timed(fn, tag: str, reps: int = 4):
    t0 = time.perf_counter()
    out = [np.asarray(o) for o in fn()]
    print(f"{tag} compile+run: {time.perf_counter()-t0:.1f} s", flush=True)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = [np.asarray(o) for o in fn()]
        best = min(best, time.perf_counter() - t0)
    print(f"{tag} best of {reps}: {best:.3f} s", flush=True)
    return out, best


def main():
    import jax
    import jax.numpy as jnp

    import tpuflow  # noqa: F401  (enables the persistent compile cache)
    from tpuflow.core.color import srgb_to_lab
    from tpuflow.core.io import read_image
    from tpuflow.segmentation import meanshift as ms

    print("devices:", jax.devices(), flush=True)
    img, maxval = read_image(
        "/root/reference/HornSchunckOF/img/leftimage/000050_10.png")
    rgb = jnp.asarray(img / float(maxval), jnp.float32)
    if rgb.ndim == 2:
        rgb = jnp.stack([rgb] * 3, -1)
    lab = srgb_to_lab(rgb)
    jax.block_until_ready(lab)
    print("frame:", lab.shape, flush=True)

    (p_d, c_d), t_d = _timed(
        lambda: ms.mean_shift_filter(lab, 20, 16.0 / 255.0), "disc q=4")

    bands_real = ms._ms_bands
    ms._ms_bands = lambda E_k, quant=4: ((-E_k, E_k, E_k),)
    ms.mean_shift_filter.clear_cache()
    try:
        (p_s, c_s), t_s = _timed(
            lambda: ms.mean_shift_filter(lab, 20, 16.0 / 255.0), "square")
    finally:
        ms._ms_bands = bands_real
        ms.mean_shift_filter.clear_cache()

    diff = (p_d != p_s).any(-1) | (c_d != c_s).any(-1)
    n = int(diff.sum())
    print(f"differing pixels: {n} / {diff.size} ({n/diff.size:.4%})",
          flush=True)
    if n:
        dp = np.abs(p_d - p_s).max()
        print(f"max |pos diff| = {dp:.3f} px", flush=True)
    print(f"speedup: {t_s/t_d:.3f}x ({t_s:.3f} -> {t_d:.3f} s)", flush=True)


if __name__ == "__main__":
    main()
