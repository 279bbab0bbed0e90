"""Golden tests: Horn-Schunck vs the pinned NumPy oracle and vs OpenCV demo
semantics on the bundled KITTI pair (SURVEY.md §4b: EPE <= 1e-2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.oracles import horn_schunck_oracle
from tpuflow.pipeline.metrics import epe
from tpuflow.solvers import horn_schunck, horn_schunck_classic


class TestHornSchunckOracle:
    def test_small_pair_exact(self, small_pair):
        prev, nxt = small_pair
        u, v = horn_schunck(jnp.asarray(prev), jnp.asarray(nxt),
                            window_size=5, max_iterations=20, alpha=1.0)
        uo, vo = horn_schunck_oracle(prev, nxt, 5, 20, 1.0)
        np.testing.assert_allclose(u, uo, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(v, vo, rtol=1e-9, atol=1e-9)

    def test_kitti_pair_epe(self, kitti_pair):
        """Full-frame, full 100-iteration budget: EPE <= 1e-2 vs oracle."""
        prev, nxt = kitti_pair
        u, v = horn_schunck(jnp.asarray(prev), jnp.asarray(nxt),
                            window_size=5, max_iterations=100, alpha=1.0)
        uo, vo = horn_schunck_oracle(prev, nxt, 5, 100, 1.0)
        err = epe(np.asarray(u), np.asarray(v), uo, vo)
        assert float(err) < 1e-2

    def test_zero_motion(self, small_pair):
        prev, _ = small_pair
        u, v = horn_schunck(jnp.asarray(prev), jnp.asarray(prev),
                            max_iterations=50)
        assert float(jnp.max(jnp.abs(u))) == pytest.approx(0.0, abs=1e-12)
        assert float(jnp.max(jnp.abs(v))) == pytest.approx(0.0, abs=1e-12)

    def test_translation_recovered(self):
        """A smooth translating pattern: mean flow close to shift/8.

        The demo's gradients use OpenCV's *unnormalized* 3x3 Sobel (sum of
        |weights| = 8), so the recovered flow is ~1/8 of the true shift —
        a property of the reference (hornSchunck.cpp:27-28), preserved here.
        """
        ys, xs = np.mgrid[0:96, 0:128].astype(np.float64)
        img = 100 + 50 * np.sin(xs / 7.0) * np.cos(ys / 9.0)
        shift = 1.0
        img2 = 100 + 50 * np.sin((xs - shift) / 7.0) * np.cos(ys / 9.0)
        u, v = horn_schunck(jnp.asarray(img), jnp.asarray(img2),
                            max_iterations=200, alpha=10.0)
        interior = np.asarray(u)[20:-20, 20:-20]
        assert abs(interior.mean() - shift / 8.0) < 0.05

    def test_classic_translation(self):
        ys, xs = np.mgrid[0:96, 0:128].astype(np.float64)
        img = 100 + 50 * np.sin(xs / 7.0) * np.cos(ys / 9.0)
        img2 = 100 + 50 * np.sin((xs - 1.0) / 7.0) * np.cos(ys / 9.0)
        u, v = horn_schunck_classic(jnp.asarray(img), jnp.asarray(img2),
                                    max_iterations=300, alpha=10.0)
        interior = np.asarray(u)[20:-20, 20:-20]
        assert abs(interior.mean() - 1.0) < 0.25
