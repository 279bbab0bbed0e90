"""Scratch detection + a-contrario meaningful alignments + exclusive
principle (MeaningfulAlignments/, lib/Library.cpp parity)."""

import math

import numpy as np
import pytest


def _scratch_image(h=60, w=80, col=40, depth=30.0):
    """Flat background with a 1-px vertical bright scratch."""
    img = np.full((h, w), 100.0)
    img[:, col] += depth
    return img


class TestDetectScratch:
    def test_detects_vertical_scratch(self):
        import jax.numpy as jnp

        from tpuflow.detection import detect_scratch

        img = _scratch_image()
        smap, _ = detect_scratch(jnp.asarray(img), s_med=3.0, s_avg=20.0)
        smap = np.asarray(smap)
        # The scratch column is flagged at 255; background is 0.
        assert (smap[:, 40] == 255).all()
        assert smap[:, :38].max() == 0
        assert smap[:, 43:].max() == 0

    def test_side_average_rejects_edges(self):
        """A brightness step is not a scratch: side averages differ."""
        import jax.numpy as jnp

        from tpuflow.detection import detect_scratch

        img = np.full((40, 60), 100.0)
        img[:, 30:] = 200.0
        smap, _ = detect_scratch(jnp.asarray(img), s_med=3.0, s_avg=20.0)
        assert np.asarray(smap).max() == 0

    def test_gaussian_prefilter_runs(self):
        import jax.numpy as jnp

        from tpuflow.core.config import FilterParam
        from tpuflow.detection import detect_scratch

        img = _scratch_image()
        fp = FilterParam().change_filter("gaussian")
        smap, filtered = detect_scratch(jnp.asarray(img), 3.0, 20.0, fp)
        assert np.asarray(filtered).shape == img.shape
        # 21x21 sigma-5 blur smears the scratch below s_med -> no detection
        assert np.asarray(smap)[:, 40].max() == 0


class TestPrTables:
    def test_pr_is_binomial_tail(self):
        from tpuflow.detection import pr_table

        p = 1.0 / 16.0
        t = pr_table(20, p)
        # P[X >= 0] = 1, P[X >= l] = p^l, monotone in k.
        assert t[0, 10] == pytest.approx(1.0)
        assert t[10, 10] == pytest.approx(p**10)
        assert (np.diff(t[: 11, 10]) <= 1e-15).all()
        # Exact small case: l=2, k=1 -> 1 - (1-p)^2
        assert t[1, 2] == pytest.approx(1.0 - (1.0 - p) ** 2)

    def test_calc_k_l_threshold(self):
        from tpuflow.core.config import DIV_ANGLE
        from tpuflow.detection import calc_k_l, pr_table

        w, h, p, ep = 40, 30, 1.0 / 16.0, 1.0
        table = pr_table(max(w, h), p)
        k_list = calc_k_l(w, h, p, ep, table)
        thresh = ep / (w * w * h * DIV_ANGLE)
        for l in (5, 17, 40):
            k = k_list[l]
            assert table[k, l] <= thresh
            if k > 0:
                assert table[k - 1, l] > thresh

    def test_l_min(self):
        from tpuflow.detection import l_min_for

        # log(ep=1)=0 -> l_min = ceil(-(log 40 + log h + 2 log w)/log p)
        l = l_min_for(100, 50)
        expected = math.ceil(
            -(math.log(40) + math.log(50) + 2 * math.log(100))
            / math.log(1 / 16))
        assert l == max(expected, 1)


class TestAlignments:
    def _angles_with_vertical_line(self, h=50, w=60, col=25):
        """Orientation field: flat sentinel everywhere except a vertical
        aligned line at x=col. Vertical ray direction = atan2(dy,0)/pi =
        0.5 (pointing down)."""
        from tpuflow.core.config import ANGLE_MAX

        ang = np.full((h, w), -2.0 * ANGLE_MAX)
        ang[:, col] = 0.5
        return ang

    def test_finds_vertical_segment(self):
        from tpuflow.detection import aligned_segments_vertical

        ang = self._angles_with_vertical_line()
        segs = aligned_segments_vertical(ang)
        assert len(segs) >= 1
        best = min(segs, key=lambda s: s.pr)
        assert best.n == best.x == 25
        assert abs(best.m - 0) <= 1 and abs(best.y - 49) <= 1
        assert best.pr < 1e-12

    def test_no_segments_on_flat_field(self):
        from tpuflow.core.config import ANGLE_MAX
        from tpuflow.detection import aligned_segments_vertical

        ang = np.full((40, 40), -2.0 * ANGLE_MAX)
        assert aligned_segments_vertical(ang) == []

    def test_max_output_length_filters(self):
        from tpuflow.detection import aligned_segments_vertical

        ang = self._angles_with_vertical_line()
        segs = aligned_segments_vertical(ang, max_output_length=10)
        assert all(max(abs(s.y - s.m), abs(s.x - s.n)) + 1 <= 10
                   for s in segs)


class TestExclusive:
    def test_index_map_prefers_lower_pr(self):
        from tpuflow.detection import Segment, exclusive_index_map

        s1 = Segment(n=10, m=0, x=10, y=29, pr=1e-6)
        s2 = Segment(n=10, m=0, x=10, y=29, pr=1e-3)  # duplicate, worse
        idx = exclusive_index_map(40, 30, [s2, s1])
        assert (idx[:, 10] == 1).all()  # the better segment owns the line
        assert (idx[:, 20] == -1).all()

    def test_exclusive_drops_duplicate(self):
        from tpuflow.detection import (
            Segment,
            calc_k_l,
            exclusive_principle,
            pr_table,
        )

        ang = TestAlignments()._angles_with_vertical_line(50, 60, 25)
        table = pr_table(60)
        k_list = calc_k_l(60, 50, table=table)
        good = Segment(n=25, m=0, x=25, y=49, pr=1e-20)
        dup = Segment(n=25, m=2, x=25, y=47, pr=1e-10)
        survivors, idx = exclusive_principle(ang, [good, dup], k_list, table)
        # The duplicate owns no pixels -> only the best survives.
        assert len(survivors) == 1
        assert survivors[0].m == 0 and survivors[0].y == 49


class TestEndToEnd:
    def test_scratch_to_segments(self):
        """Full §3.x path: scratch image -> angles -> segments."""
        import jax.numpy as jnp

        from tpuflow.detection import aligned_segments_vertical, detect_scratch
        from tpuflow.ops import derivative_angler

        img = _scratch_image(h=48, w=64, col=30)
        rng = np.random.default_rng(0)
        img += rng.normal(0, 0.5, img.shape)
        smap, _ = detect_scratch(jnp.asarray(img), 3.0, 20.0)
        ang = np.asarray(derivative_angler(jnp.asarray(img)))
        segs = aligned_segments_vertical(ang)
        assert any(abs(s.n - 30) <= 2 and abs(s.x - 30) <= 2
                   and abs(s.y - s.m) > 30 for s in segs)
