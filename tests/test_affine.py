"""Global affine parametric motion tests (Affine_MultipleMotion.cpp parity)."""

import numpy as np
import pytest


class TestAffineFlowField:
    def test_evaluates_basis(self):
        import jax.numpy as jnp

        from tpuflow.solvers import affine_flow_field

        a = jnp.asarray([1.0, 0.5, -0.25, 2.0, 0.0, 0.1])
        u, v = affine_flow_field(a, 4, 5)
        x, y = 3.0, 2.0
        assert np.isclose(np.asarray(u)[2, 3], 1.0 + 0.5 * x - 0.25 * y)
        assert np.isclose(np.asarray(v)[2, 3], 2.0 + 0.0 * x + 0.1 * y)


class TestMultipleMotionAffine:
    def test_pure_translation_recovered(self):
        """Global shift -> a0/a3 carry it, linear terms stay small."""
        import jax.numpy as jnp

        from tpuflow.solvers import multiple_motion_affine
        from tpuflow.core.config import MultipleMotionParam

        rng = np.random.default_rng(3)
        base = rng.uniform(0, 255, (100, 130))
        # Heavy smoothing: gradient-descent IRLS needs smooth texture.
        from scipy.ndimage import gaussian_filter as gf

        base = gf(base, 4.0)
        prev = base[8:-8, 8:-8]
        nxt = base[9:-7, 6:-10]  # (dx, dy) = (+2, +1): I_t(x) = I_{t+1}(x+d)
        a = np.asarray(multiple_motion_affine(
            jnp.asarray(prev), jnp.asarray(nxt), 255.0,
            MultipleMotionParam(level=3)))
        assert a.shape == (6,)
        # True motion is (+2, -1). The reference's omega=1e-4 plain
        # gradient descent (Affine_MultipleMotion.cpp:122-134) is slow, so
        # only partial magnitude is recovered within the reference's
        # IterMax — assert direction and the exact u:v ratio instead.
        h, w = prev.shape
        u_c = a[0] + a[1] * (w / 2) + a[2] * (h / 2)
        v_c = a[3] + a[4] * (w / 2) + a[5] * (h / 2)
        assert 0.5 < u_c <= 2.5
        assert -1.5 <= v_c < -0.2
        assert abs(u_c + 2.0 * v_c) < 0.3  # u:v locked to 2:-1

    def test_write_read_roundtrip(self, tmp_path):
        from tpuflow.core.io import read_affine, write_affine

        a = np.array([1e-3, -2.5, 3.14159, 0.0, 7e8, -1e-12])
        write_affine(tmp_path / "a.txt", a)
        b = read_affine(tmp_path / "a.txt")
        np.testing.assert_allclose(a, b, rtol=1e-15)
