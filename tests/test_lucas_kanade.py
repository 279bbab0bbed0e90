"""Pyramidal LK tracker validated against OpenCV's calcOpticalFlowPyrLK.

The reference demos (LucasKanadeOF/LucasKanadeOF.cpp:50-114,
VideoFeaturesOF/FeaturesOpticalFlow.cpp:85-130) seed with
goodFeaturesToTrack(500, 0.01, 10) and track with calcOpticalFlowPyrLK.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def textured_pair():
    rng = np.random.default_rng(7)
    base = rng.uniform(0, 255, (160, 200))
    base = cv2.GaussianBlur(base, (0, 0), 2.0)
    prev = base[6:-6, 6:-6]
    nxt = base[9:-3, 4:-8]  # point motion: (+2, -3) in (x, y)
    return prev.astype(np.float64), nxt.astype(np.float64)


def test_good_features_spacing_and_count(textured_pair):
    from tpuflow.solvers import good_features_to_track

    prev, _ = textured_pair
    pts = good_features_to_track(prev, max_corners=100, quality_level=0.01,
                                 min_distance=10)
    assert 10 < len(pts) <= 100
    # min-distance suppression holds
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    assert d2.min() >= 10.0**2


def test_track_points_recovers_shift(textured_pair):
    from tpuflow.solvers import track_points

    prev, nxt = textured_pair
    pts = np.stack(np.meshgrid(np.arange(40, 160, 20),
                               np.arange(40, 120, 20)), -1).reshape(-1, 2)
    pts = pts.astype(np.float64)
    new_pts, status = track_points(prev, nxt, pts, win=21, max_level=3)
    new_pts = np.asarray(new_pts)
    status = np.asarray(status)
    assert status.all()
    d = new_pts - pts
    assert np.allclose(d[:, 0], 2.0, atol=0.2)
    assert np.allclose(d[:, 1], -3.0, atol=0.2)


def test_track_points_matches_opencv(textured_pair):
    from tpuflow.solvers import track_points

    prev, nxt = textured_pair
    pts = cv2.goodFeaturesToTrack(prev.astype(np.uint8), 60, 0.01, 10)
    pts = pts.reshape(-1, 2).astype(np.float64)
    ref, ref_st, _ = cv2.calcOpticalFlowPyrLK(
        prev.astype(np.uint8), nxt.astype(np.uint8),
        pts.astype(np.float32), None, winSize=(21, 21), maxLevel=3)
    ours, st = track_points(prev, nxt, pts, win=21, max_level=3)
    ours = np.asarray(ours)
    both = np.asarray(st) & (ref_st.reshape(-1) == 1)
    assert both.sum() >= len(pts) * 0.8
    err = np.hypot(*(ours[both] - ref.reshape(-1, 2)[both]).T)
    assert np.median(err) < 0.5


def test_accept_tracked_point():
    from tpuflow.solvers import accept_tracked_point

    old = np.array([[0.0, 0.0], [10.0, 10.0], [5.0, 5.0]])
    new = np.array([[3.0, 0.0], [10.5, 10.5], [5.0, 5.0]])
    st = np.array([True, True, True])
    acc = np.asarray(accept_tracked_point(old, new, st))
    # rule: status && |dx|+|dy| > 2 (LucasKanadeOF.cpp:104-114)
    assert list(acc) == [True, False, False]


def test_dense_lk_recovers_shift(textured_pair):
    from tpuflow.solvers import dense_lucas_kanade

    prev, nxt = textured_pair
    u, v = dense_lucas_kanade(prev, nxt, win=15, levels=3, iters=3)
    ui = np.asarray(u)[30:-30, 30:-30]
    vi = np.asarray(v)[30:-30, 30:-30]
    assert abs(np.median(ui) - 2.0) < 0.2
    assert abs(np.median(vi) - (-3.0)) < 0.2
