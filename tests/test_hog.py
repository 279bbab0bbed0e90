"""HOG features + matching (HOG/HOG.cpp, HOG/HOG_match.cpp parity)."""

import numpy as np
import pytest


class TestOrientation:
    def test_bins_and_magnitude(self):
        import jax.numpy as jnp

        from tpuflow.features import orientation

        # Horizontal ramp: gx = 2, gy = 0 -> angle 0 -> bin 0.
        img = jnp.asarray(np.tile(np.arange(16.0), (12, 1)))
        mag, orient = orientation(img, bins=16, signed=False)
        assert int(orient[6, 8]) == 0
        assert float(mag[6, 8]) == pytest.approx(2.0)

    def test_unsigned_folds_opposite_gradients(self):
        import jax.numpy as jnp

        from tpuflow.features import orientation

        up_ramp = jnp.asarray(np.tile(np.arange(16.0), (12, 1)))
        down_ramp = -up_ramp
        _, o1 = orientation(up_ramp, 16, signed=False)
        _, o2 = orientation(down_ramp, 16, signed=False)
        # gradient pointing left: atan2(0,-2)/pi = 1 -> folds to bin 0
        assert int(o1[6, 8]) == int(o2[6, 8]) == 0

    def test_signed_distinguishes(self):
        import jax.numpy as jnp

        from tpuflow.features import orientation

        up_ramp = jnp.asarray(np.tile(np.arange(16.0), (12, 1)))
        _, o1 = orientation(up_ramp, 16, signed=True)
        _, o2 = orientation(-up_ramp, 16, signed=True)
        assert int(o1[6, 8]) != int(o2[6, 8])


class TestComputeHog:
    def test_cell_tiling_floor_division(self):
        import jax.numpy as jnp

        from tpuflow.features import compute_hog, orientation

        img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (30, 40)))
        mag, orient = orientation(img, 8)
        hog = compute_hog(mag, orient, bins=8)
        # floor(30/7) x floor(40/7) cells (the reference's int division)
        assert hog.shape == (4, 5, 8)

    def test_cell_sums_match_manual(self):
        import jax.numpy as jnp

        from tpuflow.features import compute_hog, orientation

        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(0, 255, (14, 14)))
        mag, orient = orientation(img, 8)
        hog = np.asarray(compute_hog(mag, orient, bins=8))
        mag_n = np.asarray(mag)
        or_n = np.asarray(orient)
        manual = np.zeros(8)
        for m in range(7):
            for n in range(7):
                manual[or_n[7 + m, n]] += mag_n[7 + m, n]
        np.testing.assert_allclose(hog[1, 0], manual, rtol=1e-12)

    def test_dense_shape_and_consistency(self):
        import jax.numpy as jnp

        from tpuflow.features import compute_hog, orientation

        img = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (20, 24)))
        mag, orient = orientation(img, 8)
        dense = np.asarray(compute_hog(mag, orient, bins=8, dense=True))
        assert dense.shape == (14, 18, 8)
        tiled = np.asarray(compute_hog(mag, orient, bins=8, dense=False))
        # dense at stride-7 grid positions equals the tiled histograms
        np.testing.assert_allclose(dense[0, 0], tiled[0, 0], atol=1e-9)
        np.testing.assert_allclose(dense[7, 7], tiled[1, 1], atol=1e-9)


class TestBlockNormalize:
    def test_shape_and_unit_norm(self):
        import jax.numpy as jnp

        from tpuflow.features import block_normalize

        rng = np.random.default_rng(3)
        hog = jnp.asarray(rng.uniform(0, 5, (20, 30, 16)))
        block = np.asarray(block_normalize(hog))
        # margin = (3-1)/2*4 = 4 per side; feature dim 3*3*16
        assert block.shape == (12, 22, 144)
        norms = np.linalg.norm(block.reshape(-1, 144), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)


class TestHogMatching:
    def test_recovers_grid_shift(self):
        import jax.numpy as jnp

        from tpuflow.features import hog_matching

        rng = np.random.default_rng(4)
        base = rng.uniform(0, 1, (40, 50, 9))
        prv = jnp.asarray(base)
        cur = jnp.asarray(np.roll(base, shift=(2, 3), axis=(0, 1)))
        # cur(x) = prv(x - (3,2)): the best match of prv(x) is at offset
        # +(3,2) in cur.
        u, v, score = hog_matching(prv, cur, 9, 9)
        inner = (slice(8, -8), slice(8, -8))
        assert np.median(np.asarray(u)[inner]) == pytest.approx(3.0)
        assert np.median(np.asarray(v)[inner]) == pytest.approx(2.0)
        # Perfect match on random features -> large Lowe score.
        assert np.median(np.asarray(score)[inner]) > 10.0

    def test_full_descriptor_pipeline(self):
        import jax.numpy as jnp

        from tpuflow.features import hog_descriptor, hog_matching

        rng = np.random.default_rng(5)
        base = rng.uniform(0, 255, (80, 90))
        from scipy.ndimage import gaussian_filter as gf

        base = gf(base, 2)
        prv = base[7:-7, 7:-7]
        cur = base[14:, 14:][: prv.shape[0], : prv.shape[1]]
        _, block_prv = hog_descriptor(jnp.asarray(prv), bins=8, dense=True)
        _, block_cur = hog_descriptor(jnp.asarray(cur), bins=8, dense=True)
        u, v, score = hog_matching(block_prv, block_cur, 17, 17)
        # Content of cur is prv shifted by (-7, -7): prv cell (x, y)
        # matches cur cell (x-7, y-7).
        inner = (slice(12, -12), slice(12, -12))
        assert abs(np.median(np.asarray(u)[inner]) + 7.0) < 1.1
        assert abs(np.median(np.asarray(v)[inner]) + 7.0) < 1.1

    def test_hog_io_roundtrip(self, tmp_path):
        from tpuflow.core.io import read_hog, write_hog

        rng = np.random.default_rng(6)
        hog = rng.uniform(0, 3, (5, 7, 16))
        write_hog(tmp_path / "h.hog", hog, signed=True)
        back, signed = read_hog(tmp_path / "h.hog")
        assert signed is True
        np.testing.assert_allclose(back, hog, rtol=1e-15)


class TestBlockNormalizeIntegral:
    def test_intended_integral_normalization(self):
        """The dead 3-arg HOG_BlockNormalize's *intended* math
        (HOG.cpp:171-232; the C++ is UB — see tpuflow/features/hog.py):
        contiguous 3x3 blocks, output shrinks by blocksize-1, each
        descriptor L2-normalized by the block energy."""
        import jax.numpy as jnp

        from tpuflow.features import block_normalize, block_normalize_integral

        rng = np.random.default_rng(3)
        hog = jnp.asarray(rng.uniform(0, 4, (10, 12, 5)))
        out = np.asarray(block_normalize_integral(hog, (3, 3)))
        assert out.shape == (8, 10, 45)
        norms = np.linalg.norm(out.reshape(-1, 45), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-6)
        # Equivalent to the dense-trajectories normalization at
        # distance (1, 1) for odd block sizes.
        ref = np.asarray(block_normalize(hog, (3, 3), (1, 1)))
        np.testing.assert_allclose(out, ref, atol=1e-12)
