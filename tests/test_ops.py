"""Unit tests for the L0/L1 layers: borders, filters, derivatives, io."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import convolve as nd_convolve

from tpuflow.core import borders as bd
from tpuflow.core.io import (
    expand_frame_pattern,
    read_flow,
    read_pnm,
    write_flow,
    write_pnm,
)
from tpuflow.ops import (
    box_filter,
    conv2d,
    epsilon_filter,
    filterer,
    gaussian_filter,
    gaussian_kernel,
    horizontal_median,
)
from tpuflow.ops.derivatives import derivator, sobel_opencv

rng = np.random.default_rng(0)


class TestBorders:
    def test_mirror_index(self):
        idx = bd.mirror_index(jnp.array([-2, -1, 0, 1, 4, 5, 6]), 5)
        np.testing.assert_array_equal(idx, [1, 0, 0, 1, 4, 4, 3])

    def test_reflect101_index(self):
        idx = bd.reflect101_index(jnp.array([-2, -1, 0, 1, 4, 5, 6]), 5)
        np.testing.assert_array_equal(idx, [2, 1, 0, 1, 4, 3, 2])

    def test_gather2d_zero(self):
        img = jnp.arange(12.0).reshape(3, 4)
        x = jnp.array([-1, 0, 3, 4])
        y = jnp.array([0, 0, 2, 2])
        out = bd.gather2d(img, x, y, bd.ZERO)
        np.testing.assert_array_equal(out, [0.0, 0.0, 11.0, 0.0])


class TestConv:
    def test_conv2d_matches_scipy_zero(self):
        img = jnp.asarray(rng.normal(size=(17, 23)))
        k = jnp.asarray(rng.normal(size=(3, 5)))
        got = conv2d(img, k, border=bd.ZERO, flip=False)
        want = nd_convolve(np.asarray(img), np.asarray(k)[::-1, ::-1],
                           mode="constant", cval=0.0)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_filterer_is_convolution(self):
        """Filterer reads Image(x+cx-n, y+cy-m): true convolution."""
        img = np.zeros((7, 7))
        img[3, 3] = 1.0
        k = np.arange(9.0).reshape(3, 3)
        got = np.asarray(filterer(jnp.asarray(img), jnp.asarray(k)))
        # Convolving a delta reproduces the (unflipped) kernel around center.
        np.testing.assert_allclose(got[2:5, 2:5], k)

    def test_filterer_2x2_anchor(self):
        """2x2 filter center (1,1): out(x,y) = sum I(x+1-n, y+1-m) F(n,m)."""
        img = np.asarray(rng.normal(size=(6, 6)))
        k = np.asarray(rng.normal(size=(2, 2)))
        got = np.asarray(filterer(jnp.asarray(img), jnp.asarray(k)))

        def ref(x, y):
            s = 0.0
            for m in range(2):
                for n in range(2):
                    xi, yi = x + 1 - n, y + 1 - m
                    if 0 <= xi < 6 and 0 <= yi < 6:
                        s += img[yi, xi] * k[m, n]
            return s

        for y in (0, 3, 5):
            for x in (0, 2, 5):
                assert got[y, x] == pytest.approx(ref(x, y), abs=1e-12)

    def test_box_filter(self):
        img = jnp.ones((10, 10))
        out = box_filter(img, 3, border=bd.ZERO)
        assert out[5, 5] == pytest.approx(1.0)
        assert out[0, 0] == pytest.approx(4.0 / 9.0)


class TestSobel:
    def test_sobel_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        img = rng.normal(size=(20, 30))
        want_x = cv2.Sobel(img, -1, 1, 0, ksize=3)
        want_y = cv2.Sobel(img, -1, 0, 1, ksize=3)
        np.testing.assert_allclose(sobel_opencv(jnp.asarray(img), "x"),
                                   want_x, rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(sobel_opencv(jnp.asarray(img), "y"),
                                   want_y, rtol=1e-10, atol=1e-10)

    def test_derivator_normal_on_ramp(self):
        """On a linear ramp I=x the conv-orientation diff filter gives -1."""
        x = np.tile(np.arange(8.0), (8, 1))
        dx, dy = derivator(jnp.asarray(x), "Normal")
        # Interior: convolution flips the forward-difference sign.
        np.testing.assert_allclose(np.asarray(dx)[2:-2, 2:-2], -1.0)
        np.testing.assert_allclose(np.asarray(dy)[2:-2, 2:-2], 0.0, atol=1e-12)


class TestFilters:
    def test_gaussian_kernel_diamond_on_even(self):
        k = gaussian_kernel((4, 4), 1.0)
        assert k.shape == (5, 5)  # bumped to odd
        assert k[0, 0] == 0.0  # diamond mask kills corners
        assert float(jnp.sum(k)) == pytest.approx(1.0)

    def test_gaussian_filter_preserves_dc_interior(self):
        img = jnp.ones((31, 31))
        out = gaussian_filter(img, (5, 5), 1.0)
        assert out[15, 15] == pytest.approx(1.0, abs=1e-6)

    def test_epsilon_filter_flat_and_edge(self):
        # A step edge with eps smaller than the step: edge is preserved.
        img = np.zeros((9, 9))
        img[:, 5:] = 100.0
        out = np.asarray(epsilon_filter(jnp.asarray(img), (3, 3), 10.0))
        assert out[4, 2] == pytest.approx(0.0, abs=1e-9)
        assert out[4, 7] == pytest.approx(100.0, abs=1e-9)

    def test_horizontal_median_interior(self):
        img = np.asarray(rng.normal(size=(5, 11)))
        out = np.asarray(horizontal_median(jnp.asarray(img), 3))
        for y in range(5):
            for x in range(1, 10):
                assert out[y, x] == pytest.approx(np.median(img[y, x - 1 : x + 2]))

    def test_horizontal_median_borders(self):
        img = np.asarray(rng.normal(size=(2, 7)))
        out = np.asarray(horizontal_median(jnp.asarray(img), 3))
        # Left border: window [0, w/2] inclusive -> 2 samples -> mean.
        assert out[0, 0] == pytest.approx(np.mean(np.sort(img[0, :2])))
        assert out[1, 6] == pytest.approx(np.mean(np.sort(img[1, 5:])))


class TestIO(object):
    def test_pnm_roundtrip_binary(self, tmp_path):
        img = rng.integers(0, 256, size=(7, 9), dtype=np.uint8)
        p = tmp_path / "t.pgm"
        write_pnm(p, img)
        back, maxv = read_pnm(p)
        assert maxv == 255
        np.testing.assert_array_equal(back, img)

    def test_ppm_roundtrip_ascii(self, tmp_path):
        img = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
        p = tmp_path / "t.ppm"
        write_pnm(p, img, binary=False)
        back, _ = read_pnm(p)
        np.testing.assert_array_equal(back, img)

    def test_flow_roundtrip(self, tmp_path):
        u = rng.normal(size=(6, 8))
        v = rng.normal(size=(6, 8))
        p = tmp_path / "flow.bin"
        write_flow(p, u, v)
        # Verify exact reference layout: header then interleaved doubles.
        raw = p.read_bytes()
        assert raw.startswith(b"8 6\n")
        u2, v2 = read_flow(p)
        np.testing.assert_array_equal(u2, u)
        np.testing.assert_array_equal(v2, v)

    def test_flow_with_score(self, tmp_path):
        u = rng.normal(size=(3, 4))
        p = tmp_path / "flow3.bin"
        write_flow(p, u, u, score=u)
        a, b, c = read_flow(p, components=3)
        np.testing.assert_array_equal(a, u)
        np.testing.assert_array_equal(c, u)

    def test_frame_pattern(self):
        assert expand_frame_pattern("img_%06d.png", 50) == "img_000050.png"
        assert expand_frame_pattern("plain.png", 50) == "plain.png"
