"""Colorwheel + motion compensation coverage."""

import numpy as np


class TestColorwheel:
    def test_flow_to_color_shape_and_neutrality(self):
        import jax.numpy as jnp

        from tpuflow.viz import flow_to_color

        u = jnp.zeros((12, 16))
        v = jnp.zeros((12, 16))
        img = np.asarray(flow_to_color(u, v))
        assert img.shape == (12, 16, 3)
        # Zero flow maps to (near-)white in the Middlebury wheel.
        assert img.min() >= 240

    def test_direction_changes_hue(self):
        import jax.numpy as jnp

        from tpuflow.viz import flow_to_color

        right = np.asarray(flow_to_color(jnp.full((4, 4), 5.0),
                                         jnp.zeros((4, 4))))
        up = np.asarray(flow_to_color(jnp.zeros((4, 4)),
                                      jnp.full((4, 4), 5.0)))
        assert not np.array_equal(right, up)


class TestMotionCompensation:
    def test_integer_shift_compensates(self):
        """MotionCompensation contract (SURVEY.md §2.4): warping next by
        the (inverse) flow reconstructs the current frame."""
        import jax.numpy as jnp

        from tpuflow.pipeline.motion_compensation import compensate

        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, (30, 40))
        nxt = np.roll(base, -3, axis=1)  # content moved 3 px left
        # current(x) = next(x - (-3)) => flow u = +3 points to the source
        u = jnp.full((30, 40), -3.0)
        comp = np.asarray(compensate(jnp.asarray(nxt), u,
                                     jnp.zeros((30, 40))))
        np.testing.assert_allclose(comp[:, 5:-5], base[:, 5:-5], atol=1e-9)


class TestCvPrimitives:
    """The from-scratch OpenCV drawing primitives in viz.quiver are
    pinned pixel-for-pixel against the in-environment OpenCV build —
    they are what lets the demo renders reproduce the reference
    repository's committed result images bit-exactly."""

    def test_line_cv8_matches_opencv(self):
        import pytest

        cv2 = pytest.importorskip("cv2")
        from tpuflow.viz.quiver import _draw_line_cv8

        rng = np.random.default_rng(3)
        for _ in range(400):
            x0, y0, x1, y1 = (int(t) for t in rng.integers(-200, 400, 4))
            ref = np.zeros((48, 64, 3), np.uint8)
            cv2.line(ref, (x0, y0), (x1, y1), (255, 255, 255))
            ours = np.zeros((48, 64, 3), np.uint8)
            _draw_line_cv8(ours, x0, y0, x1, y1, (255, 255, 255))
            np.testing.assert_array_equal(ours, ref)

    def test_disc_footprints_match_opencv_circle(self):
        import pytest

        cv2 = pytest.importorskip("cv2")
        from tpuflow.viz.quiver import _cv_disc

        for r in (0, 1, 2, 3):
            ref = np.zeros((15, 15, 3), np.uint8)
            cv2.circle(ref, (7, 7), r, (255, 255, 255), -1)
            ours = np.zeros((15, 15, 3), np.uint8)
            for dx, dy in _cv_disc(r):
                ours[7 + dy, 7 + dx] = 255
            np.testing.assert_array_equal(ours, ref)

    def test_draw_tracks_matches_opencv(self):
        """draw_tracks_cv == the reference LK overlay loop
        (LucasKanadeOF.cpp:83-87) rendered with OpenCV itself."""
        import pytest

        cv2 = pytest.importorskip("cv2")
        from tpuflow.viz.quiver import draw_tracks_cv

        rng = np.random.default_rng(9)
        base = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        p0 = rng.uniform(-10, 90, (25, 2)).astype(np.float32)
        p1 = (p0 + rng.uniform(-15, 15, (25, 2))).astype(np.float32)
        ref = np.ascontiguousarray(base[..., ::-1].copy())  # BGR canvas
        for a, b in zip(p0, p1):
            cv2.line(ref, (int(np.rint(a[0])), int(np.rint(a[1]))),
                     (int(np.rint(b[0])), int(np.rint(b[1]))), (0, 0, 255))
            cv2.circle(ref, (int(np.rint(b[0])), int(np.rint(b[1]))), 3,
                       (0, 255, 0), -1)
        ours = draw_tracks_cv(base, p0, p1)
        np.testing.assert_array_equal(ours, ref[..., ::-1])


def test_plot_quiver_cv_rejects_shape_mismatch():
    """Canvas bounds come from the flow shape; a mismatched image would
    IndexError (smaller) or silently suppress edge dots (larger) —
    reject up front (ADVICE r3)."""
    import pytest as _pytest

    from tpuflow.viz.quiver import plot_quiver_cv

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    u = np.zeros((16, 16))
    with _pytest.raises(ValueError, match="must agree"):
        plot_quiver_cv(img, u, u)
