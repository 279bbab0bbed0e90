"""Diagnose the Farneback top-level convergence-basin gap vs cv2.

BASELINE.md r5 records that on unit-variance multi-octave texture our
pyramid's top-level basin is ~1 level-pixel narrower than cv2's (24-px
1080p pans fail where cv2 locks). Both implementations build the level
images the same way (one-shot Gaussian of the FULL-RES frame with
sigma=(1/scale-1)/2, then bilinear resize) — except for one silent
difference: ``jax.image.resize(method="linear")`` defaults to
``antialias=True``, which WIDENS the interpolation kernel on
downsampling; OpenCV's INTER_LINEAR applies no anti-aliasing (the
explicit Gaussian is the anti-alias).  The extra kernel widening is a
second blur pass that costs top-level contrast — the one quantity the
multi-octave bench texture showed the basin is sensitive to.

This probe sweeps pan magnitudes and compares median recovered u for
(a) cv2, (b) tpuflow default, (c) tpuflow with antialias=False
(monkeypatched), on the bench's texture at 1080p.  Quality-only — no
timing — so it runs on CPU.

Usage: JAX_PLATFORMS=cpu python -u scripts/r5_fb_basin_probe.py
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import W, _multioctave_frames
    from tpuflow.solvers import farneback as fb

    cfg = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
               poly_n=5, poly_sigma=1.2, flags=0)
    pans = [16, 20, 22, 24, 26, 28]
    base = _multioctave_frames(max(pans))
    prev = np.ascontiguousarray(base[:, :W])

    try:
        import cv2
    except Exception:
        cv2 = None

    orig_resize = jax.image.resize

    def resize_no_aa(image, shape, method, **kw):
        kw["antialias"] = False
        return orig_resize(image, shape, method, **kw)

    results: dict[str, dict[int, float]] = {}
    if cv2 is not None:
        results["cv2"] = {}
        for pan in pans:
            nxt = np.ascontiguousarray(base[:, pan : pan + W])
            fl = cv2.calcOpticalFlowFarneback(
                prev, nxt, None, 0.5, 3, 15, 3, 5, 1.2, 0)
            results["cv2"][pan] = float(np.median(fl[..., 0]))
            print(f"cv2 pan {pan}: {results['cv2'][pan]:+.2f}", flush=True)
    # Variant-major so each monkeypatched resize gets exactly one fresh
    # trace (the patch is baked in at trace time; pan changes reuse it).
    for name, patch in (("default", None), ("no-AA", resize_no_aa)):
        fb._farneback_impl.clear_cache()
        if patch is not None:
            jax.image.resize = patch
        try:
            results[name] = {}
            for pan in pans:
                nxt = np.ascontiguousarray(base[:, pan : pan + W])
                u, _ = fb.calc_optical_flow_farneback(
                    jnp.asarray(prev, jnp.float32),
                    jnp.asarray(nxt, jnp.float32), None, **cfg)
                results[name][pan] = float(jnp.median(u))
                print(f"{name} pan {pan}: {results[name][pan]:+.2f}",
                      flush=True)
        finally:
            jax.image.resize = orig_resize
    print("\npan  " + "  ".join(f"{n:>8s}" for n in results), flush=True)
    for pan in pans:
        print(f"{pan:3d}  " + "  ".join(
            f"{results[n][pan]:+8.2f}" for n in results),
            f"(true {-pan})", flush=True)


if __name__ == "__main__":
    main()
