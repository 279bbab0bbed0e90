"""Per-frame pipeline orchestrator — Scratch_MeaningfulMotion re-designed.

Parity with ``Scratch_MeaningfulMotion.cpp:12-623`` (SURVEY.md §2.2 #21):

- printf-pattern filename expansion over [start, end] (:84-122);
- image read (PNM/PNG), size-consistency check across frames (:151-154),
  optional resample before processing (:156-209), RGB->gray (:235-264);
- <= 4-frame RGB/gray history;
- mode dispatch (:315-522): filtered image / binary scratch map /
  meaningful alignments (+ exclusive principle, plot, superimpose) /
  global affine / BM flow (gradient or affine refinement) / HOG family;
- per-mode writers mirroring the reference's output formats (§2.5) and
  side-output filenames;
- 3-D viewer: instead of the X11 window, ``x11_plot`` renders the scene
  to ``<output>_3d.png`` (:mod:`tpuflow.viz.plot3d`).

The per-frame state (history frames, BM state, HOG of the previous
frame, cached Pr tables) lives in :class:`PipelineState` — explicit and
serializable (checkpoint/resume, SURVEY.md §5.4) instead of the
reference's function-local statics.
"""

from __future__ import annotations

import dataclasses
import pickle
from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from tpuflow.core import io as tio
from tpuflow.core.color import rgb_to_gray
from tpuflow.core.config import (
    MODE_OUTPUT_AFFINE_BLOCKMATCHING,
    MODE_OUTPUT_BINARY_IMAGE,
    MODE_OUTPUT_FILTERED_IMAGE,
    MODE_OUTPUT_HOG,
    MODE_OUTPUT_HOG_MATCHING_VECTOR,
    MODE_OUTPUT_HOG_RAW,
    MODE_OUTPUT_MULTIPLE_MOTIONS_AFFINE,
    MODE_OUTPUT_OPTICALFLOW,
    MODE_OUTPUT_OPTICALFLOW_BLOCKMATCHING,
    PLOT_AS_RESAMPLED,
    PLOT_NEGATE,
    PLOT_RESAMPLED_IMG_ONLY,
    Options,
)
from tpuflow.core.resample import resample
from tpuflow.utils.telemetry import get_telemetry, trace_span


@dataclass
class PipelineState:
    """Cross-frame state (the reference's statics made explicit)."""

    prev_rgb: np.ndarray | None = None
    prev_gray: np.ndarray | None = None
    prev_gray2: np.ndarray | None = None   # prev-of-prev (bidirectional MC)
    prev_out_name: str | None = None       # OutputNameNums_prev
    bm_state: object | None = None
    hog_prev: np.ndarray | None = None
    hog_raw_prev: np.ndarray | None = None
    pr_table: np.ndarray | None = None
    k_list: np.ndarray | None = None
    l_min: int | None = None
    frame_size: tuple[int, int] | None = None

    def save(self, path: str | Path) -> None:
        """Checkpoint for restart (SURVEY.md §5.3/§5.4)."""
        with open(path, "wb") as f:
            pickle.dump(dataclasses.asdict(self), f)

    @classmethod
    def load(cls, path: str | Path) -> "PipelineState":
        with open(path, "rb") as f:
            return cls(**pickle.load(f))


def _dump_pyramid(proc: np.ndarray, maxint: int, max_level: int,
                  out_name: str) -> None:
    """The DEBUG_PYRAMID dump: every Gaussian pyramid level as
    Pyramid_%04d.pgm, values x256 of the MaxInt-normalized image
    (MultiResolution.cpp:86-94). Written next to the output file."""
    from tpuflow.pyramid import pyramider

    levels = pyramider(jnp.asarray(proc, jnp.float64) / maxint, max_level)
    out_dir = Path(out_name).parent
    for l, img in enumerate(levels):
        tio.write_image(out_dir / f"Pyramid_{l:04d}.pgm",
                        np.clip(np.asarray(img) * 256.0, 0, 255), 255)


def _hog_compensated(cur_gray: np.ndarray, u: np.ndarray, v: np.ndarray,
                     dense: bool) -> np.ndarray:
    """Compensated image from HOG matching vectors
    (HOG_vector_compensated_write, HOG_match.cpp:125-145; the
    MotionCompensation class lives in the absent pnm_lib_cpp submodule —
    reconstruction: grid vectors are scaled to pixel units (x cell size
    when the grid is one site per 7x7 cell), nearest-upsampled to the
    frame, and the current frame is warped back through them to predict
    the previous frame)."""
    from tpuflow.core.resample import resize_zero_order_hold
    from tpuflow.features.hog import CELL
    from tpuflow.pipeline.motion_compensation import compensate

    scale = 1.0 if dense else float(CELL[0])
    h, w = cur_gray.shape
    uu = resize_zero_order_hold(jnp.asarray(u * scale, jnp.float64), (w, h))
    vv = resize_zero_order_hold(jnp.asarray(v * scale, jnp.float64), (w, h))
    return np.asarray(compensate(jnp.asarray(cur_gray, jnp.float64), uu, vv))


def _insert_tag(name: str, tag: str) -> str:
    """The reference's side-output naming: insert the tag before the
    trailing digit run (OpticalFlow_BlockMatching.cpp:137-143)."""
    stem = Path(name)
    s = str(stem)
    i = len(s)
    while i > 0 and s[i - 1].isdigit():
        i -= 1
    j = i
    if j == len(s):  # no digits: before the extension
        j = s.rfind(".")
        if j < 0:
            j = len(s)
    return s[:j] + tag + s[j:]


def process_frame(
    frame_rgb: np.ndarray,
    maxint: int,
    opts: Options,
    out_name: str,
    state: PipelineState,
    write_outputs: bool = True,
) -> tuple[dict, PipelineState]:
    """One iteration of the frame loop. Returns (results dict, state)."""
    results: dict = {}
    tel = get_telemetry()

    orig = frame_rgb
    gray = frame_rgb if frame_rgb.ndim == 2 else np.asarray(
        rgb_to_gray(jnp.asarray(frame_rgb, jnp.float64)))

    # Resample before processing (--resample).
    rw, rh = opts.resample_size
    if rw > 0 and rh > 0:
        proc = np.asarray(resample(jnp.asarray(gray, jnp.float64), (rw, rh),
                                   opts.resample_method))
        proc_rgb = np.asarray(resample(
            jnp.asarray(frame_rgb, jnp.float64), (rw, rh),
            opts.resample_method)) if frame_rgb.ndim == 3 else proc
        if opts.plot_options & PLOT_RESAMPLED_IMG_ONLY and write_outputs:
            tio.write_image(out_name, proc, maxint)
            return {"resampled": proc}, state
    else:
        proc = gray.astype(np.float64)
        proc_rgb = frame_rgb

    if state.frame_size is not None and state.frame_size != proc.shape:
        raise ValueError(
            f"frame size changed: {state.frame_size} -> {proc.shape} "
            "(Scratch_MeaningfulMotion.cpp:151-154)")
    state.frame_size = proc.shape

    mode = opts.mode
    mm = opts.multiple_motion_param

    if mode & MODE_OUTPUT_FILTERED_IMAGE:
        from tpuflow.detection import detect_scratch

        with trace_span("pipeline.filtered"):
            _, filtered = detect_scratch(jnp.asarray(proc), opts.s_med,
                                         opts.s_avg, opts.filter_param,
                                         do_detection=False)
        results["filtered"] = np.asarray(filtered)
        if write_outputs:
            tio.write_image(out_name, results["filtered"], maxint)

    elif mode & MODE_OUTPUT_MULTIPLE_MOTIONS_AFFINE:
        if state.prev_gray is None:
            tel.event("pipeline.skip", reason="no previous frame")
        else:
            from tpuflow.solvers import multiple_motion_affine

            with trace_span("pipeline.affine"):
                a = multiple_motion_affine(
                    jnp.asarray(state.prev_gray), jnp.asarray(proc),
                    float(maxint), mm)
            results["affine"] = np.asarray(a)
            if write_outputs:
                tio.write_affine(out_name, results["affine"])
                if opts.debug_dumps:
                    _dump_pyramid(proc, maxint, mm.level, out_name)

    elif mode & (MODE_OUTPUT_OPTICALFLOW_BLOCKMATCHING
                 | MODE_OUTPUT_AFFINE_BLOCKMATCHING
                 | MODE_OUTPUT_OPTICALFLOW):
        if state.prev_rgb is None:
            tel.event("pipeline.skip", reason="no previous frame")
        else:
            from tpuflow.solvers.bm_flow import optical_flow_block_matching

            bm_mode = (MODE_OUTPUT_AFFINE_BLOCKMATCHING
                       if mode & MODE_OUTPUT_AFFINE_BLOCKMATCHING else 0)
            mesh = None
            if getattr(opts, "devices", 0):
                from tpuflow.dist import make_mesh

                mesh = make_mesh(int(opts.devices))
            with trace_span("pipeline.bm_flow"):
                out, state.bm_state = optical_flow_block_matching(
                    state.prev_rgb, proc_rgb, float(maxint), mm,
                    mode=bm_mode, iter_max=mm.irls_iter_max,
                    state=state.bm_state,
                    search_range=mm.bm_search_range,
                    kernel_spatial=mm.bm_kernel_spatial,
                    kernel_intensity=mm.bm_kernel_intensity,
                    subpixel_scale=mm.bm_subpixel_scale,
                    mesh=mesh, bm_method=mm.bm_method,
                    refine_warp=mm.bm_refine_warp,
                    profile=mm.bm_profile)
            results["flow"] = out
            if write_outputs:
                from tpuflow.pipeline.motion_compensation import compensate

                # Bidirectional estimation is for the *middle* frame, so
                # flow + compensated image go under the previous frame's
                # output name (OutputNameNums_prev,
                # Scratch_MeaningfulMotion.cpp:544-552); the segmentation
                # side outputs always use the newest frame's name
                # (newest_filename, OpticalFlow_BlockMatching.cpp:137-196).
                flow_name = out_name
                u_j = jnp.asarray(out.u)
                v_j = jnp.asarray(out.v)
                if out.bidirectional and state.prev_out_name \
                        and state.prev_gray2 is not None:
                    flow_name = state.prev_out_name
                    # Predict the middle frame from the per-pixel matching
                    # direction: prev-of-prev where t < 0, current where
                    # t > 0 (the 3-frame MotionCompensation,
                    # OpticalFlow_BlockMatching.cpp:702-752).
                    comp_p = compensate(jnp.asarray(state.prev_gray2),
                                        u_j, v_j)
                    comp_n = compensate(jnp.asarray(proc), u_j, v_j)
                    comp = np.where(out.t < 0, np.asarray(comp_p),
                                    np.asarray(comp_n))
                else:
                    comp = np.asarray(compensate(
                        jnp.asarray(state.prev_gray), u_j, v_j))
                tio.write_flow(flow_name, out.u, out.v)
                comp_name = str(Path(flow_name).with_name(
                    "compensated_" + Path(flow_name).name)) + ".pgm"
                tio.write_image(comp_name, comp, maxint)
                tio.write_image(_insert_tag(out_name, "segmentation_") + ".pgm",
                                out.segmentation.labels.astype(np.float64),
                                max(out.segmentation.n_regions - 1, 1))
                tio.write_image(_insert_tag(out_name, "color-quantized_")
                                + ".ppm", out.quantized_rgb, 255)
                tio.write_flow(_insert_tag(out_name, "shift-vector_"),
                               out.shift_vector[..., 0],
                               out.shift_vector[..., 1])
                if opts.debug_dumps:
                    _dump_pyramid(proc, maxint, mm.level, out_name)

    elif mode & (MODE_OUTPUT_HOG | MODE_OUTPUT_HOG_RAW
                 | MODE_OUTPUT_HOG_MATCHING_VECTOR):
        from tpuflow.features import hog_descriptor, hog_matching

        hp = opts.hog_param
        with trace_span("pipeline.hog"):
            raw, block = hog_descriptor(
                jnp.asarray(proc / maxint), bins=hp.bins,
                signed=hp.signed_orientation, dense=hp.dense)
        raw = np.asarray(raw)
        block = np.asarray(block)
        results["hog_raw"] = raw
        results["hog"] = block
        if mode & MODE_OUTPUT_HOG_MATCHING_VECTOR:
            if state.hog_prev is not None \
                    and state.hog_prev.shape == block.shape:
                with trace_span("pipeline.hog_match"):
                    u, v, score = hog_matching(jnp.asarray(state.hog_prev),
                                               jnp.asarray(block))
                results["hog_vector"] = (np.asarray(u), np.asarray(v),
                                         np.asarray(score))
                comp = _hog_compensated(proc, np.asarray(u), np.asarray(v),
                                        hp.dense)
                results["hog_compensated"] = comp
                if write_outputs:
                    tio.write_flow(out_name, np.asarray(u), np.asarray(v),
                                   np.asarray(score))
                    # HOG_vector_compensated_write (HOG_match.cpp:125-145):
                    # "compensated" inserted before the extension, PNM
                    # bytes regardless of the extension (pnm.write).
                    stem = Path(out_name)
                    comp_name = str(stem.with_name(
                        stem.stem + "compensated" + (stem.suffix or ".pgm")))
                    tio.write_pnm(comp_name, comp, maxint)
            else:
                tel.event("pipeline.skip", reason="no previous HOG")
        elif write_outputs:
            if mode & MODE_OUTPUT_HOG_RAW:
                tio.write_hog(out_name, raw, hp.signed_orientation)
            else:
                tio.write_hog(out_name, block, hp.signed_orientation)
        state.hog_prev = block
        state.hog_raw_prev = raw

    else:
        # Scratch detection (+ optional meaningful alignments).
        from tpuflow.detection import detect_scratch

        with trace_span("pipeline.scratch"):
            smap, filtered = detect_scratch(jnp.asarray(proc), opts.s_med,
                                            opts.s_avg, opts.filter_param)
        smap = np.asarray(smap)
        results["scratch_map"] = smap
        if opts.debug_dumps and write_outputs:
            # Detection.cpp:67-79 writes the prefiltered image to
            # "filtered.pgm" in cwd; written next to the output here.
            tio.write_image(Path(out_name).parent / "filtered.pgm",
                            np.asarray(filtered), maxint)
        if mode & MODE_OUTPUT_BINARY_IMAGE:
            if write_outputs:
                tio.write_image(out_name, smap, maxint)
        else:
            from tpuflow.detection import (
                aligned_segments_vertical,
                calc_k_l,
                exclusive_principle,
                l_min_for,
                pr_table,
            )
            from tpuflow.ops import derivative_angler
            from tpuflow.viz.plot2d import plot_segments, superimpose

            h, w = smap.shape
            if state.pr_table is None:
                with trace_span("pipeline.pr_table"):
                    state.pr_table = pr_table(max(w, h), opts.p)
                    state.k_list = calc_k_l(w, h, opts.p, opts.ep,
                                            state.pr_table)
                    state.l_min = l_min_for(w, h, opts.p, opts.ep)
            angles = np.asarray(derivative_angler(jnp.asarray(smap)))
            with trace_span("pipeline.alignments"):
                segs = aligned_segments_vertical(
                    angles, state.k_list, state.l_min, state.pr_table,
                    opts.max_length, opts.max_output_length, opts.p, opts.ep)
            tel.event("pipeline.segments", count=len(segs))
            if opts.exclusive_principle and segs:
                with trace_span("pipeline.exclusive"):
                    segs, index_map = exclusive_principle(
                        angles, segs, state.k_list, state.pr_table,
                        opts.exclusive_max_radius)
                tel.event("pipeline.segments_ep", count=len(segs))
                if opts.debug_dumps and write_outputs:
                    # Exclusive.cpp:27-31 (unowned -1 clipped to 0).
                    tio.write_image(
                        Path(out_name).parent / "IndexMap.pgm",
                        np.maximum(index_map, 0).astype(np.float64),
                        max(len(segs), 1))
            results["segments"] = segs

            negate = bool(opts.plot_options & PLOT_NEGATE)
            as_res = bool(opts.plot_options & PLOT_AS_RESAMPLED)
            size_out = (w, h) if as_res else (
                gray.shape[1], gray.shape[0])
            plot = plot_segments(segs, (w, h), size_out, negate)
            results["plot"] = plot
            if opts.superimpose:
                base = proc if as_res else (orig if orig.ndim == 3 else gray)
                over = superimpose(base, plot, opts.superimpose, negate,
                                   maxint)
                results["superimposed"] = over
                if write_outputs:
                    tio.write_image(out_name, over, maxint)
            elif write_outputs:
                tio.write_image(out_name, plot.astype(np.float64), maxint)
            if opts.x11_plot and write_outputs:
                from tpuflow.viz.plot3d import render_scene

                scene = render_scene(proc, None, segs, float(maxint))
                tio.write_image(str(Path(out_name).with_suffix("")) +
                                "_3d.png", scene, 255)

    state.prev_gray2 = state.prev_gray
    state.prev_rgb = proc_rgb
    state.prev_gray = proc
    state.prev_out_name = out_name
    return results, state


def run_pipeline(
    input_pattern: str,
    output_pattern: str,
    start: int,
    end: int,
    opts: Options | None = None,
    state: PipelineState | None = None,
    checkpoint_path: str | None = None,
) -> PipelineState:
    """The frame loop (Scratch_MeaningfulMotion.cpp:79-599).

    Binary-PNM sequences decode on the native prefetcher's worker
    threads (tpuflow.native.FramePrefetcher) so frame N+1's read/parse
    overlaps frame N's device work; other formats read synchronously."""
    if opts is None:
        opts = Options()
    if state is None:
        state = PipelineState()
    tel = get_telemetry()
    in_names = [tio.expand_frame_pattern(input_pattern, num)
                for num in range(start, end + 1)]

    def frames():
        if all(str(p).lower().endswith((".pgm", ".ppm")) for p in in_names):
            try:
                from tpuflow.native import FramePrefetcher

                with FramePrefetcher(in_names, threads=2) as pf:
                    yield from pf
                return
            except Exception:
                pass  # fall back to synchronous reads
        for p in in_names:
            yield tio.read_image(p)

    for num, (frame, maxint) in zip(range(start, end + 1), frames()):
        in_name = tio.expand_frame_pattern(input_pattern, num)
        out_name = tio.expand_frame_pattern(output_pattern, num)
        tel.event("pipeline.frame", num=num, input=in_name, output=out_name)
        with trace_span("pipeline.process", frame=num):
            _, state = process_frame(frame.astype(np.float64), maxint, opts,
                                     out_name, state)
        if checkpoint_path:
            state.save(checkpoint_path)
    return state
