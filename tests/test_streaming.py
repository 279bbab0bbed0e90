"""Streaming drivers (VideoDenseOF / VideoFeaturesOF equivalents)."""

import numpy as np
import pytest


class TestSources:
    def test_synthetic_source_motion(self):
        from tpuflow.pipeline.streaming import SyntheticSource

        frames = list(SyntheticSource(n_frames=3, h=40, w=50, dx=2.0))
        assert len(frames) == 3
        assert frames[0].shape == (40, 50)
        # frame k+1 content equals frame k shifted left by dx
        np.testing.assert_allclose(frames[1][:, :-4], frames[0][:, 2:-2],
                                   atol=1e-6)

    def test_image_sequence_source(self, tmp_path):
        from tpuflow.core.io import write_pnm
        from tpuflow.pipeline.streaming import ImageSequenceSource

        for i in range(3):
            write_pnm(tmp_path / f"f_{i:03d}.pgm",
                      np.full((8, 10), i, np.uint8))
        frames = list(ImageSequenceSource(str(tmp_path / "f_%03d.pgm"), 0, 2))
        assert len(frames) == 3
        assert frames[2][0, 0] == 2


class TestDenseStream:
    def test_recovers_constant_motion(self):
        from tpuflow.pipeline.streaming import SyntheticSource, dense_flow_stream

        src = SyntheticSource(n_frames=4, h=100, w=140, dx=2.0, dy=0.0)
        outs = list(dense_flow_stream(
            src, working_size=None, pyr_scale=0.5, levels=2, winsize=15,
            iterations=3, poly_n=5, poly_sigma=1.2))
        assert len(outs) == 3  # first frame only primes the state
        for gray, u, v in outs:
            # content moves by -dx per frame (the source pans right)
            assert abs(np.median(u[20:-20, 20:-20]) + 2.0) < 0.3
            assert abs(np.median(v[20:-20, 20:-20])) < 0.3

    def test_batched_scan_matches_generator(self):
        """The device-scanned clip API == the per-frame generator
        (same pairs, same config, flags=0). Tolerance 3e-5: the two
        compile separately, and XLA's fusion reassociates the dense
        adaptive warp's (2D+2)^2-term accumulation (_warp_dense)
        differently per compilation — measured max drift ~1e-5 f32."""
        from tpuflow.pipeline.streaming import (
            SyntheticSource,
            dense_flow_stream,
            dense_flow_stream_batched,
        )

        src = SyntheticSource(n_frames=4, h=60, w=100, dx=1.0, dy=0.0)
        frames = [np.asarray(f, np.float32) for f in src]
        outs = list(dense_flow_stream(
            iter(frames), working_size=None, pyr_scale=0.5, levels=1,
            winsize=9, iterations=2, poly_n=5, poly_sigma=1.1))
        us, vs = dense_flow_stream_batched(
            np.stack(frames), pyr_scale=0.5, levels=1, winsize=9,
            iterations=2, poly_n=5, poly_sigma=1.1)
        assert us.shape == (3, 60, 100)
        for k, (gray, u, v) in enumerate(outs):
            np.testing.assert_allclose(np.asarray(us[k]), u,
                                       rtol=0, atol=3e-5)
            np.testing.assert_allclose(np.asarray(vs[k]), v,
                                       rtol=0, atol=3e-5)

    def test_warm_start_carries_flow(self):
        from tpuflow.pipeline.streaming import (
            DenseStreamState,
            SyntheticSource,
            dense_flow_stream,
        )

        src = SyntheticSource(n_frames=3, h=80, w=100, dx=1.0)
        state = DenseStreamState()
        outs = list(dense_flow_stream(
            src, working_size=None, levels=1, winsize=15, iterations=2,
            poly_n=5, poly_sigma=1.2, warm_start_flow=True, state=state))
        assert state.prev_flow is not None
        assert len(outs) == 2

    def test_working_size_resize(self):
        from tpuflow.pipeline.streaming import SyntheticSource, dense_flow_stream

        src = SyntheticSource(n_frames=2, h=90, w=120, dx=1.0)
        outs = list(dense_flow_stream(src, working_size=(64, 48),
                                      winsize=15, poly_n=5))
        gray, u, v = outs[0]
        assert gray.shape == (48, 64)
        assert u.shape == (48, 64)


class TestFeatureTracking:
    def test_tracks_constant_motion(self):
        from tpuflow.pipeline.streaming import (
            SyntheticSource,
            feature_tracking_stream,
        )

        src = SyntheticSource(n_frames=3, h=100, w=140, dx=3.0, seed=2)
        outs = list(feature_tracking_stream(src, max_count=80))
        assert len(outs) == 2
        gray, pts, prev_pts, accept = outs[-1]
        assert len(pts) > 10
        d = pts - prev_pts
        # content moves left by 3 -> tracked points move by dx = -3
        assert abs(np.median(d[:, 0]) + 3.0) < 0.3
        assert abs(np.median(d[:, 1])) < 0.3

    def test_reseeds_when_few_tracks(self):
        from tpuflow.pipeline.streaming import (
            SyntheticSource,
            TrackingState,
            feature_tracking_stream,
        )

        # dx=0 -> all tracks rejected by the |dx|+|dy| > 2 rule -> the
        # tracker must re-seed every frame instead of dying.
        src = SyntheticSource(n_frames=3, h=80, w=100, dx=0.0, seed=3)
        state = TrackingState()
        outs = list(feature_tracking_stream(src, max_count=50, state=state))
        assert len(outs) == 2
        for gray, pts, prev_pts, accept in outs:
            assert len(pts) == 0  # static scene: nothing passes the rule
        assert state.prev_gray is not None


class TestBMFlowStream:
    def test_matches_sequential_driver(self):
        """The pipelined flagship stream == the sequential sync driver
        over the same frames, bitwise (dispatch-ahead must not change
        results), and the third output onward is bidirectional."""
        import numpy as np
        from scipy.ndimage import gaussian_filter

        from tpuflow.pipeline.streaming import bm_flow_stream
        from tpuflow.solvers.bm_flow import optical_flow_block_matching

        rng = np.random.default_rng(3)
        base = gaussian_filter(rng.uniform(0, 255, (44, 72, 3)), (2, 2, 0))
        frames = [base[4 * i : 4 * i + 32, 2 * i : 2 * i + 56]
                  for i in range(4)]
        kw = dict(iter_max=32, search_range=9, kernel_spatial=4,
                  kernel_intensity=0.12)

        stream_outs = list(bm_flow_stream(iter(frames), 255.0, **kw))

        state = None
        seq_outs = []
        for a, b in zip(frames[:-1], frames[1:]):
            out, state = optical_flow_block_matching(a, b, 255.0,
                                                     state=state, **kw)
            seq_outs.append(out)

        assert len(stream_outs) == len(seq_outs) == 3
        assert not stream_outs[0].bidirectional
        assert stream_outs[1].bidirectional
        for o_s, o_q in zip(stream_outs, seq_outs):
            np.testing.assert_array_equal(o_s.u, o_q.u)
            np.testing.assert_array_equal(o_s.v, o_q.v)
            np.testing.assert_array_equal(o_s.t, o_q.t)


class TestBucketPrewarm:
    """Region-bucket ladder pre-warming (r5): the warmed jit signatures
    must be EXACTLY what the streaming driver requests — a signature
    mismatch would silently compile twice and the mid-stream recompile
    tail would return."""

    def test_neighbor_buckets_ladder(self):
        from tpuflow.blockmatching.prewarm import neighbor_buckets

        assert neighbor_buckets(300) == [256, 384, 512]
        assert neighbor_buckets(100) == [128, 256]  # ladder floor
        assert neighbor_buckets(1796) == [1536, 2048, 3072]
        assert neighbor_buckets(300, include_current=False) == [256, 512]

    def test_warm_primes_the_driver_signature(self):
        """prewarm_flagship(background=False) then the real
        driver-path bidirectional dispatch: the jit cache must not
        grow (the warm compiled the exact program)."""
        import jax.numpy as jnp

        from tpuflow.blockmatching import prewarm as pw
        from tpuflow.blockmatching.matcher import (
            _match_device_bidirectional,
            _match_two_directions,
        )

        h, w = 32, 48
        pw.prewarm_flagship((h, w), 100, background=False,
                            search_range=9, subpixel_scale=2,
                            include_refine=False)
        n0 = _match_two_directions._cache_size()
        rng = np.random.default_rng(0)
        cur = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        refp = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        refn = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        labels = np.zeros((h, w), np.int32)
        labels[:2, :20] = np.arange(40).reshape(2, 20)
        _match_device_bidirectional(
            jnp.asarray(cur), jnp.asarray(refp), jnp.asarray(refn),
            labels, 41, 9, 1.0, 0.5, 2, 16, "matmul")
        assert _match_two_directions._cache_size() == n0

    def test_synthetic_labels_exact_count(self):
        from tpuflow.blockmatching.prewarm import _synthetic_labels

        lab = _synthetic_labels(16, 32, 128)
        assert lab.shape == (16, 32)
        assert len(np.unique(lab)) == 128
        with np.testing.assert_raises(ValueError):
            _synthetic_labels(8, 8, 128)


def test_bm_stream_turbo_profile_matches_sequential():
    """bm_flow_stream under profile="turbo" (half-res segmentation +
    coarse search + plateau refine) == the sequential driver calls with
    the same profile, bitwise."""
    import numpy as np
    from scipy.ndimage import gaussian_filter

    from tpuflow.pipeline.streaming import bm_flow_stream
    from tpuflow.solvers.bm_flow import optical_flow_block_matching

    rng = np.random.default_rng(9)
    base = gaussian_filter(rng.uniform(0, 255, (44, 72, 3)), (2, 2, 0))
    frames = [base[4 * i : 4 * i + 32, 2 * i : 2 * i + 56]
              for i in range(4)]
    kw = dict(iter_max=64, search_range=9, kernel_spatial=4,
              kernel_intensity=0.12, profile="turbo")

    stream_outs = list(bm_flow_stream(iter(frames), 255.0, **kw))
    state = None
    seq_outs = []
    for a, b in zip(frames[:-1], frames[1:]):
        out, state = optical_flow_block_matching(a, b, 255.0,
                                                 state=state, **kw)
        seq_outs.append(out)
    assert len(stream_outs) == len(seq_outs) == 3
    for o_s, o_q in zip(stream_outs, seq_outs):
        np.testing.assert_array_equal(o_s.u, o_q.u)
        np.testing.assert_array_equal(o_s.v, o_q.v)
