"""Native C++ I/O runtime (PNM/flow codecs + prefetcher) vs the Python
implementations."""

import numpy as np
import pytest

native = pytest.importorskip("tpuflow.native")

try:
    native.load_library()
except Exception as e:  # pragma: no cover - toolchain missing
    pytest.skip(f"native build unavailable: {e}", allow_module_level=True)


class TestNativeCodecs:
    def test_pnm_roundtrip_gray(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (30, 40)).astype(np.float64)
        native.write_pnm(tmp_path / "g.pgm", img)
        back, maxval = native.read_pnm(tmp_path / "g.pgm")
        assert maxval == 255
        np.testing.assert_array_equal(back, img)

    def test_pnm_roundtrip_rgb_16bit(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 60000, (12, 17, 3)).astype(np.float64)
        native.write_pnm(tmp_path / "c.ppm", img, maxval=65535)
        back, maxval = native.read_pnm(tmp_path / "c.ppm")
        assert maxval == 65535
        np.testing.assert_array_equal(back, img)

    def test_cross_compatible_with_python_codec(self, tmp_path):
        from tpuflow.core.io import read_pnm as py_read
        from tpuflow.core.io import write_pnm as py_write

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (20, 25)).astype(np.uint8)
        py_write(tmp_path / "p.pgm", img)
        nat, _ = native.read_pnm(tmp_path / "p.pgm")
        np.testing.assert_array_equal(nat, img.astype(np.float64))

        native.write_pnm(tmp_path / "n.pgm", img.astype(np.float64))
        py, _ = py_read(tmp_path / "n.pgm")
        np.testing.assert_array_equal(py, img)

    def test_flow_roundtrip_and_cross(self, tmp_path):
        from tpuflow.core.io import read_flow as py_read_flow

        rng = np.random.default_rng(3)
        u = rng.normal(size=(9, 13))
        v = rng.normal(size=(9, 13))
        native.write_flow(tmp_path / "f.flow", u, v)
        bu, bv = native.read_flow(tmp_path / "f.flow")
        np.testing.assert_array_equal(bu, u)
        np.testing.assert_array_equal(bv, v)
        pu, pv = py_read_flow(tmp_path / "f.flow")
        np.testing.assert_array_equal(pu, u)

    def test_flow_with_score(self, tmp_path):
        rng = np.random.default_rng(4)
        u = rng.normal(size=(5, 6))
        v = rng.normal(size=(5, 6))
        s = rng.normal(size=(5, 6))
        native.write_flow(tmp_path / "s.flow", u, v, s)
        bu, bv, bs = native.read_flow(tmp_path / "s.flow", components=3)
        np.testing.assert_array_equal(bs, s)


class TestPrefetcher:
    def test_ordered_delivery(self, tmp_path):
        paths = []
        for i in range(12):
            img = np.full((16, 20), i, np.float64)
            p = tmp_path / f"f_{i:03d}.pgm"
            native.write_pnm(p, img)
            paths.append(p)
        with native.FramePrefetcher(paths, threads=4, capacity=3) as pf:
            frames = [(f, m) for f, m in pf]
        assert len(frames) == 12
        for i, (f, m) in enumerate(frames):
            assert f[0, 0] == i, f"frame {i} out of order"

    def test_context_cleanup(self, tmp_path):
        img = np.zeros((8, 8))
        p = tmp_path / "one.pgm"
        native.write_pnm(p, img)
        pf = native.FramePrefetcher([p, p], threads=2)
        next(iter(pf))
        pf.close()  # early close with frames outstanding must not hang


class TestNativeQuiver:
    def test_matches_python_rasterizer(self):
        import tpuflow.viz.quiver as q

        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
        u = rng.normal(scale=3, size=(60, 80))
        v = rng.normal(scale=3, size=(60, 80))

        nat = native.draw_quiver(img, u, v, delta=10, scale=2.0, outlier=5.0)

        # Pure-Python reference path (bypass the native dispatch).
        out = np.ascontiguousarray(img.copy())
        h, w = u.shape
        for y0 in range(0, h, 10):
            for x0 in range(0, w, 10):
                du, dv = u[y0, x0], v[y0, x0]
                x1 = int(x0 + du * 2.0)
                y1 = int(y0 + dv * 2.0)
                if abs(du) < 5.0 and abs(dv) < 5.0:
                    q._draw_line(out, x0, y0, x1, y1, (0, 255, 0))
                if 0 <= x1 < w - 1 and 0 <= y1 < h - 1:
                    out[y1, x1] = (255, 0, 0)
        np.testing.assert_array_equal(nat, out)


class TestLabelRegionsNative:
    def test_bitwise_vs_python(self):
        from scipy.ndimage import gaussian_filter

        from tpuflow.native import label_regions
        from tpuflow.segmentation.meanshift import _merge_labels_py

        rng = np.random.default_rng(41)
        h, w = 60, 90
        pos = np.stack(np.meshgrid(np.arange(w), np.arange(h))[::1],
                       axis=-1).astype(np.float64)[..., ::-1]
        pos = np.ascontiguousarray(pos)
        pos += gaussian_filter(rng.normal(0, 3, (h, w, 2)), (4, 4, 0))
        col = gaussian_filter(rng.uniform(0, 1, (h, w, 3)), (5, 5, 0))
        for ks, ki, ms in ((6.0, 0.12, 1), (6.0, 0.12, 16),
                           (3.0, 0.05, 8)):
            lab_n, n_n = label_regions(pos, col, ks, ki, ms)
            lab_p, n_p = _merge_labels_py(pos, col, ks, ki, ms)
            assert n_n == n_p
            np.testing.assert_array_equal(lab_n, lab_p)

    def test_on_mean_shift_output(self):
        import jax.numpy as jnp
        from scipy.ndimage import gaussian_filter

        from tpuflow.native import label_regions
        from tpuflow.segmentation.meanshift import (
            _merge_labels_py,
            mean_shift_filter,
        )

        rng = np.random.default_rng(43)
        lab = gaussian_filter(rng.uniform(0, 1, (48, 64, 3)), (3, 3, 0))
        pos, col = mean_shift_filter(jnp.asarray(lab), 6, 0.12, iters=4)
        pos = np.asarray(pos)
        col = np.asarray(col)
        lab_n, n_n = label_regions(pos, col, 6.0, 0.12, 16)
        lab_p, n_p = _merge_labels_py(pos, col, 6.0, 0.12, 16)
        assert n_n == n_p
        np.testing.assert_array_equal(lab_n, lab_p)
