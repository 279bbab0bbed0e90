"""Pyramid / derivative-pyramid golden tests vs the NumPy oracle."""

import numpy as np
import jax.numpy as jnp

from tests.oracles import (
    dt_pyramid_oracle,
    grad_pyramid_oracle,
    pyramider_oracle,
)
from tpuflow.pyramid import (
    add_vector_offset,
    dt_pyramid,
    grad_pyramid,
    level_down,
    pyramid_sizes,
    pyramider,
)

rng = np.random.default_rng(1)


class TestPyramider:
    def test_sizes_ceil(self):
        # 1242x375 (the KITTI corpus) -> ceil halving per level.
        sizes = pyramid_sizes(1242, 375, 5)
        assert sizes == [(1242, 375), (621, 188), (311, 94), (156, 47),
                         (78, 24), (39, 12)]

    def test_matches_oracle(self):
        img = rng.normal(size=(37, 53))
        got = pyramider(jnp.asarray(img), 3)
        want = pyramider_oracle(img, 3)
        assert len(got) == 4
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)

    def test_odd_sizes(self):
        img = rng.normal(size=(11, 7))
        got = pyramider(jnp.asarray(img), 2)
        want = pyramider_oracle(img, 2)
        for g, w in zip(got, want):
            assert g.shape == w.shape
            np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


class TestDerivativePyramids:
    def test_grad_single(self):
        img = rng.normal(size=(16, 20))
        levels = pyramider(jnp.asarray(img), 2)
        got = grad_pyramid(levels)
        want = grad_pyramid_oracle([np.asarray(l) for l in levels])
        for (gx, gy), (wx, wy) in zip(got, want):
            np.testing.assert_allclose(gx, wx, rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(gy, wy, rtol=1e-10, atol=1e-12)

    def test_grad_two_frame(self):
        a = rng.normal(size=(16, 20))
        b = rng.normal(size=(16, 20))
        la = pyramider(jnp.asarray(a), 1)
        lb = pyramider(jnp.asarray(b), 1)
        got = grad_pyramid(la, lb)
        want = grad_pyramid_oracle([np.asarray(x) for x in la],
                                   [np.asarray(x) for x in lb])
        for (gx, gy), (wx, wy) in zip(got, want):
            np.testing.assert_allclose(gx, wx, rtol=1e-10, atol=1e-12)

    def test_dt(self):
        a = rng.normal(size=(16, 20))
        b = rng.normal(size=(16, 20))
        la = pyramider(jnp.asarray(a), 2)
        lb = pyramider(jnp.asarray(b), 2)
        got = dt_pyramid(la, lb)
        want = dt_pyramid_oracle([np.asarray(x) for x in la],
                                 [np.asarray(x) for x in lb])
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-10, atol=1e-12)


class TestCoarseToFine:
    def test_add_vector_offset(self):
        uc = jnp.asarray(rng.normal(size=(4, 5)))
        vc = jnp.asarray(rng.normal(size=(4, 5)))
        u = jnp.zeros((8, 10))
        v = jnp.zeros((8, 10))
        u2, v2 = add_vector_offset(u, v, uc, vc)
        # u2(x, y) = 2 * uc(x//2, y//2)
        for y in range(8):
            for x in range(10):
                assert float(u2[y, x]) == float(2 * uc[y // 2, x // 2])

    def test_level_down_zero_flow_equals_dt(self):
        """With zero coarse flow LevelDown reduces to the plain 4-tap dt
        except at the far borders (zeropad vs clamp)."""
        a = rng.normal(size=(12, 14))
        b = rng.normal(size=(12, 14))
        la, lb = jnp.asarray(a), jnp.asarray(b)
        uc = jnp.zeros((6, 7))
        dt_ld = level_down(la, lb, uc, uc)
        from tpuflow.pyramid.pyramid import dt_level

        dt_plain = dt_level(la, lb)
        np.testing.assert_allclose(dt_ld[:-1, :-1], dt_plain[:-1, :-1],
                                   rtol=1e-12, atol=1e-12)

    def test_level_down_integer_shift(self):
        """A flow of u=0.5 at the coarse level warps Itp1 by floor(2*0.5)=1."""
        a = rng.normal(size=(8, 8))
        b = rng.normal(size=(8, 8))
        la, lb = jnp.asarray(a), jnp.asarray(b)
        uc = jnp.full((4, 4), 0.5)
        vc = jnp.zeros((4, 4))
        got = level_down(la, lb, uc, vc)
        # Interior check against the hand formula.
        x, y = 3, 3
        want = sum(
            b[y + dy, x + dx + 1] - a[y + dy, x + dx]
            for dy in (0, 1) for dx in (0, 1)
        ) / 4.0
        assert abs(float(got[y, x]) - want) < 1e-12
