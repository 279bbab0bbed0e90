"""Corpus-level flagship quality: compensation PSNR over bundled pairs.

The reference ships 62 KITTI-style frame pairs under
``HornSchunckOF/img/leftimage`` (``NNNNNN_10.png``/``_11.png``) and its
de-facto quality measure is eyeballing the motion-compensated frame
(OpticalFlow.cpp:420-426). This sweeps the flagship segmentation-BM
driver over the corpus and reports, per pair and aggregated:

- flagship compensation PSNR (warp prev by the flagship flow vs next),
- the no-compensation identity PSNR,
- OpenCV Farneback compensation PSNR as an external reference.

Usage (real TPU):
  env PYTHONPATH=/root/.axon_site:/root/repo \
      python -u scripts/corpus_psnr.py [--limit N] [--stride K] \
      [--corpus left|right]

``--corpus right`` sweeps the stereo-right camera pairs
(``img/rightimage``, 62 pairs) — an independent held-out set the
flagship's constants were never examined against.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

CORPORA = {
    "left": Path("/root/reference/HornSchunckOF/img/leftimage"),
    "right": Path("/root/reference/HornSchunckOF/img/rightimage"),
}


def _gray(a: np.ndarray) -> np.ndarray:
    g = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    return g.round().astype(np.float64)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0,
                    help="max pairs (0 = all)")
    ap.add_argument("--stride", type=int, default=1,
                    help="take every K-th pair")
    ap.add_argument("--corpus", choices=sorted(CORPORA), default="left",
                    help="bundled corpus: left (62 pairs) or the "
                         "stereo-right camera (62 pairs)")
    args = ap.parse_args()
    corpus_dir = CORPORA[args.corpus]

    import jax.numpy as jnp

    from tpuflow.core.io import read_image
    from tpuflow.pipeline.motion_compensation import compensate
    from tpuflow.solvers.bm_flow import optical_flow_block_matching

    try:
        import cv2
    except Exception:
        cv2 = None

    stems = sorted(p.name[:-7] for p in corpus_dir.glob("*_10.png"))
    stems = stems[:: max(args.stride, 1)]
    if args.limit:
        stems = stems[: args.limit]

    rows = []
    t_total = 0.0
    for stem in stems:
        prev, _ = read_image(str(corpus_dir / f"{stem}_10.png"))
        nxt, _ = read_image(str(corpus_dir / f"{stem}_11.png"))
        gp, gn = _gray(prev), _gray(nxt)
        t0 = time.perf_counter()
        out, _ = optical_flow_block_matching(prev, nxt, 255.0,
                                             iter_max=2048)
        t_total += time.perf_counter() - t0
        comp = np.asarray(compensate(
            jnp.asarray(gp), jnp.asarray(out.u.astype(np.float64)),
            jnp.asarray(out.v.astype(np.float64))))
        row = {
            "pair": stem,
            "flagship_db": round(_psnr(comp, gn), 2),
            "identity_db": round(_psnr(gp, gn), 2),
        }
        if cv2 is not None:
            flow = cv2.calcOpticalFlowFarneback(
                gn.astype(np.float32), gp.astype(np.float32), None,
                0.5, 3, 15, 3, 5, 1.2, 0)
            comp_fb = np.asarray(compensate(
                jnp.asarray(gp),
                jnp.asarray(flow[..., 0].astype(np.float64)),
                jnp.asarray(flow[..., 1].astype(np.float64)),
                method="bilinear"))
            row["cv2_farneback_db"] = round(_psnr(comp_fb, gn), 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    def agg(key):
        vals = [r[key] for r in rows if key in r]
        return {"mean": round(float(np.mean(vals)), 2),
                "median": round(float(np.median(vals)), 2)} if vals else None

    summary = {
        "corpus": args.corpus,
        "pairs": len(rows),
        "flagship": agg("flagship_db"),
        "identity": agg("identity_db"),
        "cv2_farneback": agg("cv2_farneback_db"),
        "beats_identity": int(sum(
            r["flagship_db"] > r["identity_db"] for r in rows)),
        "driver_s_per_pair": round(t_total / max(len(rows), 1), 2),
    }
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
