"""Pipeline orchestrator, CLI surface, resampling, viz overlays."""

import numpy as np
import pytest


def _write_frames(tmp_path, n=2, h=40, w=56, scratch_col=28):
    from tpuflow.core.io import write_pnm

    rng = np.random.default_rng(0)
    for i in range(n):
        img = np.full((h, w), 100.0) + rng.normal(0, 0.5, (h, w))
        img[:, scratch_col] += 40
        write_pnm(tmp_path / f"in_{i:04d}.pgm", img.astype(np.uint8))
    return str(tmp_path / "in_%04d.pgm")


class TestResample:
    def test_zero_order_hold(self):
        import jax.numpy as jnp

        from tpuflow.core.resample import resize_zero_order_hold

        img = jnp.asarray(np.arange(16.0).reshape(4, 4))
        out = np.asarray(resize_zero_order_hold(img, (2, 2)))
        np.testing.assert_allclose(out, [[0, 2], [8, 10]])

    def test_bicubic_preserves_constant_and_interpolates(self):
        import jax.numpy as jnp

        from tpuflow.core.resample import resize_bicubic

        img = jnp.full((8, 8), 5.0)
        out = np.asarray(resize_bicubic(img, (16, 16)))
        np.testing.assert_allclose(out, 5.0, atol=1e-9)
        ramp = jnp.asarray(np.tile(np.arange(8.0), (8, 1)))
        up = np.asarray(resize_bicubic(ramp, (16, 16)))
        assert (np.diff(up[4, 2:-2]) > 0).all()


class TestViz2D:
    def test_plot_segments_rasterizes(self):
        from tpuflow.detection import Segment
        from tpuflow.viz.plot2d import plot_segments

        seg = Segment(n=5, m=0, x=5, y=19, pr=1e-9)
        buf = plot_segments([seg], (30, 20))
        assert (buf[:, 5] == 255).all()
        assert buf.sum() == 20 * 255

    def test_plot_negate(self):
        from tpuflow.detection import Segment
        from tpuflow.viz.plot2d import plot_segments

        seg = Segment(n=5, m=0, x=5, y=19, pr=1e-9)
        buf = plot_segments([seg], (30, 20), negate=True)
        assert (buf[:, 5] == 0).all()
        assert (buf[:, 6] == 255).all()

    def test_superimpose_red(self):
        from tpuflow.core.config import RED
        from tpuflow.viz.plot2d import superimpose

        img = np.full((10, 10), 100.0)
        plot = np.zeros((10, 10))
        plot[:, 3] = 255
        out = superimpose(img, plot, RED)
        assert (out[:, 3, 0] == 255).all()  # clipped red boost
        assert (out[:, 3, 1] == 50).all()   # halved
        assert (out[:, 4, 0] == 100).all()  # untouched

    def test_render_scene_3d(self):
        from tpuflow.viz.plot3d import render_scene

        img = np.zeros((20, 30))
        img[10, 15] = 255.0
        scene = render_scene(img, window=(200, 200))
        assert scene.shape == (200, 200, 3)
        assert scene.max() > 0

    def test_particle_steps(self):
        from tpuflow.viz.plot3d import ParticleState, galaxy_step, gravity_step

        img = np.zeros((6, 6))
        img[3, 3] = 255.0
        st = ParticleState.from_image(img)
        st = galaxy_step(st, center=(3.0, 3.0, 0.0))
        assert np.isfinite(st.coord).all()
        st2 = ParticleState.from_image(img)
        st2 = gravity_step(st2)
        # Particles accelerate toward the bright core at (3, 3).
        assert np.isfinite(st2.coord).all()
        v = st2.vel[0]  # particle at (0,0)
        assert v[0] > 0 and v[1] > 0


class TestOrchestrator:
    def test_scratch_pipeline_end_to_end(self, tmp_path):
        from tpuflow.core.config import Options
        from tpuflow.pipeline.orchestrator import run_pipeline

        pattern = _write_frames(tmp_path)
        out_pattern = str(tmp_path / "out_%04d.pgm")
        state = run_pipeline(pattern, out_pattern, 0, 1, Options(),
                             checkpoint_path=str(tmp_path / "ckpt.pkl"))
        assert (tmp_path / "out_0000.pgm").exists()
        assert (tmp_path / "out_0001.pgm").exists()
        assert (tmp_path / "ckpt.pkl").exists()
        # Segment plot marks the scratch column.
        from tpuflow.core.io import read_pnm

        out, _ = read_pnm(tmp_path / "out_0000.pgm")
        # The binary scratch column's *edges* (cols 27/29) carry the
        # aligned gradients, so segments land there.
        assert out[:, 26:31].max() == 255

    def test_binary_mode(self, tmp_path):
        from tpuflow.core.config import MODE_OUTPUT_BINARY_IMAGE, Options
        from tpuflow.pipeline.orchestrator import run_pipeline

        pattern = _write_frames(tmp_path, n=1)
        out_pattern = str(tmp_path / "bin_%04d.pgm")
        opts = Options()
        opts.mode = MODE_OUTPUT_BINARY_IMAGE
        run_pipeline(pattern, out_pattern, 0, 0, opts)
        from tpuflow.core.io import read_pnm

        out, _ = read_pnm(tmp_path / "bin_0000.pgm")
        assert set(np.unique(out)).issubset({0, 255})
        assert (out[:, 28] == 255).all()

    def test_affine_mode_skips_first_frame(self, tmp_path):
        from tpuflow.core.config import (
            MODE_OUTPUT_MULTIPLE_MOTIONS_AFFINE,
            Options,
        )
        from tpuflow.pipeline.orchestrator import run_pipeline

        pattern = _write_frames(tmp_path)
        out_pattern = str(tmp_path / "aff_%04d.txt")
        opts = Options()
        opts.mode = MODE_OUTPUT_MULTIPLE_MOTIONS_AFFINE
        opts.multiple_motion_param.level = 2
        run_pipeline(pattern, out_pattern, 0, 1, opts)
        assert not (tmp_path / "aff_0000.txt").exists()  # no prev frame
        assert (tmp_path / "aff_0001.txt").exists()
        from tpuflow.core.io import read_affine

        assert read_affine(tmp_path / "aff_0001.txt").shape == (6,)

    def test_hog_mode(self, tmp_path):
        from tpuflow.core.config import MODE_OUTPUT_HOG, Options
        from tpuflow.pipeline.orchestrator import run_pipeline

        pattern = _write_frames(tmp_path, n=1)
        out_pattern = str(tmp_path / "hog_%04d.bin")
        opts = Options()
        opts.mode = MODE_OUTPUT_HOG
        run_pipeline(pattern, out_pattern, 0, 0, opts)
        from tpuflow.core.io import read_hog

        hog, signed = read_hog(tmp_path / "hog_0000.bin")
        assert hog.ndim == 3 and signed

    def test_size_change_rejected(self, tmp_path):
        from tpuflow.core.config import Options
        from tpuflow.core.io import write_pnm
        from tpuflow.pipeline.orchestrator import run_pipeline

        write_pnm(tmp_path / "a_0000.pgm", np.full((20, 30), 7, np.uint8))
        write_pnm(tmp_path / "a_0001.pgm", np.full((24, 30), 7, np.uint8))
        with pytest.raises(ValueError, match="frame size changed"):
            run_pipeline(str(tmp_path / "a_%04d.pgm"),
                         str(tmp_path / "o_%04d.pgm"), 0, 1, Options())

    def test_state_checkpoint_roundtrip(self, tmp_path):
        from tpuflow.pipeline.orchestrator import PipelineState

        st = PipelineState(prev_gray=np.ones((4, 5)), l_min=7)
        st.save(tmp_path / "s.pkl")
        back = PipelineState.load(tmp_path / "s.pkl")
        assert back.l_min == 7
        np.testing.assert_array_equal(back.prev_gray, st.prev_gray)


class TestCli:
    def test_cli_scratch_run(self, tmp_path):
        from tpuflow.cli.parser import main

        pattern = _write_frames(tmp_path, n=1)
        rc = main(["-i", pattern, "-o", str(tmp_path / "c_%04d.pgm"),
                   "-s", "0", "-e", "0"])
        assert rc == 0
        assert (tmp_path / "c_0000.pgm").exists()

    def test_cli_option_mapping(self):
        from tpuflow.cli.parser import build_parser, parse_args_to_options
        from tpuflow.core.config import (
            FILTER_ID_GAUSSIAN,
            MODE_OUTPUT_OPTICALFLOW_BLOCKMATCHING,
            PLOT_NEGATE,
            RED,
        )

        args = build_parser().parse_args([
            "-i", "x", "-o", "y", "--opticalflow_blockmatching",
            "--mm_level", "3", "--filter_type", "gaussian",
            "--gauss_var", "2.5", "-n", "--exclusive",
            "--superimpose", "red", "--epsilon", "0.5", "-l", "9",
            "--resample", "64x48", "--resample_method", "bicubic",
            "--HOG_bins", "8", "--HOG_unsigned"])
        opts = parse_args_to_options(args)
        assert opts.mode == MODE_OUTPUT_OPTICALFLOW_BLOCKMATCHING
        assert opts.multiple_motion_param.level == 3
        assert opts.filter_param.type == FILTER_ID_GAUSSIAN
        assert opts.filter_param.std_deviation == 2.5
        assert opts.plot_options & PLOT_NEGATE
        assert opts.exclusive_principle
        assert opts.superimpose == RED
        assert opts.ep == 0.5
        assert opts.max_length == 9
        assert opts.resample_size == (64, 48)
        assert opts.resample_method == 1
        assert opts.hog_param.bins == 8
        assert not opts.hog_param.signed_orientation


def _write_motion_frames(tmp_path, n=3, h=36, w=48, step=2):
    """Smooth textured frames translating by (step, step) per frame."""
    from scipy.ndimage import gaussian_filter as gf

    from tpuflow.core.io import write_pnm

    rng = np.random.default_rng(11)
    pad = step * n
    base = gf(rng.uniform(0, 255, (h + 2 * pad, w + 2 * pad)), 2.5)
    base = 40 + (base - base.min()) / (np.ptp(base) + 1e-9) * 175
    for i in range(n):
        o = step * i
        write_pnm(tmp_path / f"in_{i:04d}.pgm",
                  base[o : o + h, o : o + w].astype(np.uint8))
    return str(tmp_path / "in_%04d.pgm")


class TestFlagshipOrchestrator:
    """End-to-end coverage of the --opticalflow_blockmatching /
    --affine_blockmatching pipeline branches: bidirectional output naming
    (Scratch_MeaningfulMotion.cpp:544-552), the full side-output file set
    (OpticalFlow_BlockMatching.cpp:137-196, 595-830) and debug dumps."""

    def _bm_opts(self, mode):
        from tpuflow.core.config import Options

        opts = Options()
        opts.mode = mode
        mm = opts.multiple_motion_param
        mm.irls_iter_max = 40
        mm.bm_search_range = 7
        mm.bm_kernel_spatial = 5
        return opts

    def test_opticalflow_blockmatching_pipeline(self, tmp_path):
        from tpuflow.core.config import MODE_OUTPUT_OPTICALFLOW_BLOCKMATCHING
        from tpuflow.core.io import read_flow, read_pnm
        from tpuflow.pipeline.orchestrator import _insert_tag, run_pipeline

        pattern = _write_motion_frames(tmp_path)
        out_pattern = str(tmp_path / "of_%04d.dat")
        opts = self._bm_opts(MODE_OUTPUT_OPTICALFLOW_BLOCKMATCHING)
        run_pipeline(pattern, out_pattern, 0, 2, opts)

        # Frame 0: no previous frame, nothing written.
        assert not (tmp_path / "of_0000.dat").exists()
        # Frame 1 writes under its own name (2-frame sequence); frame 2 is
        # bidirectional -> the middle frame's motion is (re)written under
        # the PREVIOUS name, so of_0002 must not exist.
        assert (tmp_path / "of_0001.dat").exists()
        assert not (tmp_path / "of_0002.dat").exists()
        u, v = read_flow(tmp_path / "of_0001.dat")
        assert u.shape == (36, 48) and np.isfinite(u).all()
        # Compensated image follows the flow's name.
        comp, _ = read_pnm(tmp_path / "compensated_of_0001.dat.pgm")
        assert comp.shape == (36, 48)
        assert not (tmp_path / "compensated_of_0002.dat.pgm").exists()
        # Segmentation side outputs always use the newest frame's name.
        for num in (1, 2):
            name = f"of_{num:04d}.dat"
            assert (tmp_path / (_insert_tag(name, "segmentation_")
                                + ".pgm")).exists()
            assert (tmp_path / (_insert_tag(name, "color-quantized_")
                                + ".ppm")).exists()
            sv = tmp_path / _insert_tag(name, "shift-vector_")
            su, sS = read_flow(sv)
            assert su.shape == (36, 48)

    def test_affine_blockmatching_pipeline(self, tmp_path):
        from tpuflow.core.config import MODE_OUTPUT_AFFINE_BLOCKMATCHING
        from tpuflow.core.io import read_flow
        from tpuflow.pipeline.orchestrator import _insert_tag, run_pipeline

        pattern = _write_motion_frames(tmp_path, n=2)
        out_pattern = str(tmp_path / "af_%04d.dat")
        opts = self._bm_opts(MODE_OUTPUT_AFFINE_BLOCKMATCHING)
        opts.debug_dumps = True
        run_pipeline(pattern, out_pattern, 0, 1, opts)
        u, v = read_flow(tmp_path / "af_0001.dat")
        assert np.isfinite(u).all() and np.isfinite(v).all()
        assert (tmp_path / (_insert_tag("af_0001.dat", "segmentation_")
                            + ".pgm")).exists()
        # DEBUG_PYRAMID dump: one PGM per level (MultiResolution.cpp:86-94).
        for l in range(opts.multiple_motion_param.level + 1):
            assert (tmp_path / f"Pyramid_{l:04d}.pgm").exists()

    def test_debug_dumps_scratch_and_exclusive(self, tmp_path):
        from tpuflow.core.config import Options
        from tpuflow.pipeline.orchestrator import run_pipeline

        pattern = _write_frames(tmp_path, n=1)
        opts = Options()
        opts.debug_dumps = True
        opts.exclusive_principle = True
        run_pipeline(pattern, str(tmp_path / "dbg_%04d.pgm"), 0, 0, opts)
        assert (tmp_path / "filtered.pgm").exists()
        assert (tmp_path / "IndexMap.pgm").exists()

    def test_hog_matching_writes_compensated(self, tmp_path):
        from tpuflow.core.config import MODE_OUTPUT_HOG_MATCHING_VECTOR, Options
        from tpuflow.core.io import read_pnm
        from tpuflow.pipeline.orchestrator import run_pipeline

        pattern = _write_motion_frames(tmp_path, n=2, h=30, w=40)
        opts = Options()
        opts.mode = MODE_OUTPUT_HOG_MATCHING_VECTOR
        run_pipeline(pattern, str(tmp_path / "hv_%04d.bin"), 0, 1, opts)
        assert (tmp_path / "hv_0001.bin").exists()
        # HOG_vector_compensated_write (HOG_match.cpp:125-145): the
        # compensated image goes to <name>compensated<ext>.
        comp, _ = read_pnm(tmp_path / "hv_0001compensated.bin")
        assert comp.shape == (30, 40)

    def test_gauss_stddev_alias(self):
        from tpuflow.cli.parser import build_parser, parse_args_to_options

        args = build_parser().parse_args([
            "-i", "x", "-o", "y", "--filter_type", "gaussian",
            "--gauss_stddev", "7.5", "--debug_dumps"])
        opts = parse_args_to_options(args)
        assert opts.filter_param.std_deviation == 7.5
        assert opts.debug_dumps


class TestMeshPipeline:
    def test_devices_option_matches_single_chip(self, tmp_path):
        """Options.devices (CLI --devices) routes the flagship branch
        through the mesh path and produces the same flow files as the
        single-chip run (frame dims must divide the mesh)."""
        from tpuflow.cli.parser import build_parser, parse_args_to_options
        from tpuflow.core.config import (
            MODE_OUTPUT_OPTICALFLOW_BLOCKMATCHING,
            Options,
        )
        from tpuflow.core.io import read_flow
        from tpuflow.pipeline.orchestrator import run_pipeline

        # The CLI flag lands in Options.devices.
        args = build_parser().parse_args(
            ["-i", "x", "-o", "y", "--devices", "8"])
        assert parse_args_to_options(args).devices == 8

        pattern = _write_motion_frames(tmp_path)
        outs = {}
        for tag, n_dev in (("one", 0), ("mesh", 8)):
            out_pattern = str(tmp_path / (tag + "_%04d.dat"))
            opts = Options()
            opts.mode = MODE_OUTPUT_OPTICALFLOW_BLOCKMATCHING
            opts.devices = n_dev
            mm = opts.multiple_motion_param
            mm.irls_iter_max = 40
            mm.bm_search_range = 7
            mm.bm_kernel_spatial = 5
            run_pipeline(pattern, out_pattern, 0, 2, opts)
            outs[tag] = read_flow(tmp_path / (tag + "_0001.dat"))
        np.testing.assert_allclose(outs["mesh"][0], outs["one"][0],
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(outs["mesh"][1], outs["one"][1],
                                   rtol=0, atol=1e-4)


def test_cli_refine_warp_flag_maps_to_param():
    """--refine_warp (tpuflow extension) sets bm_refine_warp on the
    multiple-motion param (docs/MIGRATION.md lever)."""
    from tpuflow.cli.parser import build_parser, parse_args_to_options

    p = build_parser()
    opts = parse_args_to_options(p.parse_args(
        ["-i", "a_%04d.pgm", "-o", "b_%04d.pgm",
         "--opticalflow_blockmatching", "--refine_warp"]))
    assert opts.multiple_motion_param.bm_refine_warp is True
    opts2 = parse_args_to_options(p.parse_args(
        ["-i", "a_%04d.pgm", "-o", "b_%04d.pgm",
         "--opticalflow_blockmatching"]))
    assert opts2.multiple_motion_param.bm_refine_warp is False


def test_cli_bm_profile_flag_runs_pipeline(tmp_path):
    """--bm_profile maps through config into the flagship driver and the
    pipeline runs end-to-end under the turbo profile."""
    from tpuflow.cli.parser import build_parser, parse_args_to_options
    from tpuflow.core.io import read_flow
    from tpuflow.pipeline.orchestrator import run_pipeline

    pattern = _write_motion_frames(tmp_path)
    out_pattern = str(tmp_path / "tp_%04d.dat")
    args = build_parser().parse_args(
        ["-i", pattern, "-o", out_pattern, "-s", "0", "-e", "2",
         "--opticalflow_blockmatching", "--bm_profile", "turbo"])
    opts = parse_args_to_options(args)
    assert opts.multiple_motion_param.bm_profile == "turbo"
    mm = opts.multiple_motion_param
    mm.irls_iter_max = 40
    mm.bm_search_range = 7
    mm.bm_kernel_spatial = 5
    run_pipeline(pattern, out_pattern, 0, 2, opts)
    u, v = read_flow(tmp_path / "tp_0001.dat")
    assert np.isfinite(u).all() and np.isfinite(v).all()
