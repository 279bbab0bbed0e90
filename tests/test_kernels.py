"""Pallas fused stencil kernels vs the reference jnp paths.

Runs in interpreter mode on CPU (SURVEY.md §4d); on TPU the same code
compiles via Mosaic. The contract is exact Jacobi equivalence: K fused
in-VMEM iterations must match K one-op-per-iteration sweeps.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fields():
    rng = np.random.default_rng(11)
    h, w = 45, 70  # deliberately not tile-aligned
    gx = rng.normal(size=(h, w))
    gy = rng.normal(size=(h, w))
    gt = 0.3 * rng.normal(size=(h, w))
    return gx, gy, gt


class TestHornSchunckPallas:
    def _run(self, small_pair, iters, fuse):
        import jax.numpy as jnp

        from tpuflow.kernels import horn_schunck_pallas
        from tpuflow.solvers import horn_schunck

        prev, nxt = small_pair
        p = jnp.asarray(prev)
        n = jnp.asarray(nxt)
        u_ref, v_ref = horn_schunck(p, n, 5, iters, 1.0)
        u, v = horn_schunck_pallas(p, n, 5, iters, 1.0,
                                   tile_h=32, tile_w=128, fuse=fuse,
                                   interpret=True)
        return np.asarray(u), np.asarray(v), np.asarray(u_ref), np.asarray(v_ref)

    def test_single_iteration(self, small_pair):
        u, v, u_ref, v_ref = self._run(small_pair, 1, 1)
        np.testing.assert_allclose(u, u_ref, rtol=0, atol=1e-12)
        np.testing.assert_allclose(v, v_ref, rtol=0, atol=1e-12)

    def test_fused_iterations(self, small_pair):
        u, v, u_ref, v_ref = self._run(small_pair, 6, 3)
        np.testing.assert_allclose(u, u_ref, rtol=0, atol=1e-10)
        np.testing.assert_allclose(v, v_ref, rtol=0, atol=1e-10)

    def test_remainder_iterations(self, small_pair):
        """iters not divisible by fuse exercises the tail call."""
        u, v, u_ref, v_ref = self._run(small_pair, 7, 3)
        np.testing.assert_allclose(u, u_ref, rtol=0, atol=1e-10)
        np.testing.assert_allclose(v, v_ref, rtol=0, atol=1e-10)

    def test_roll_variant(self, small_pair):
        """The full-size cyclic-rotation sweep (no shrinking slices) is
        exact: wrap garbage must stay inside the discarded halo ring."""
        import jax.numpy as jnp

        from tpuflow.kernels import horn_schunck_pallas
        from tpuflow.solvers import horn_schunck

        prev, nxt = small_pair
        p = jnp.asarray(prev)
        n = jnp.asarray(nxt)
        u_ref, v_ref = horn_schunck(p, n, 5, 7, 1.0)
        for roll in (True, "batched"):
            for pipelined in (False, True):
                u, v = horn_schunck_pallas(p, n, 5, 7, 1.0,
                                           tile_h=32, tile_w=128, fuse=3,
                                           roll=roll, pipelined=pipelined,
                                           interpret=True)
                np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                           rtol=0, atol=1e-10)
                np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                           rtol=0, atol=1e-10)


class TestIrlsSweepPallas:
    def test_matches_jnp_sweeps(self, fields):
        import jax.numpy as jnp

        from tpuflow.kernels import irls_sweep_pallas
        from tpuflow.solvers import irls_grad, irls_sup

        gx, gy, gt = (jnp.asarray(a) for a in fields)
        ld, ls, sd, ss = 5.0, 1.0, 0.4, 0.2
        sup_x, sup_y = irls_sup(gx, gy, ld, ls, sd, ss)
        u = jnp.zeros_like(gx)
        v = jnp.zeros_like(gx)
        n_iters = 5
        u_ref, v_ref = u, v
        for _ in range(n_iters):
            dx, dy = irls_grad(u_ref, v_ref, gx, gy, gt, ld, ls, sd, ss)
            u_ref = u_ref - dx / sup_x
            v_ref = v_ref - dy / sup_y
        u_k, v_k = irls_sweep_pallas(
            u, v, gx, gy, gt, sup_x, sup_y, n_iters,
            lambda_d=ld, lambda_s=ls, sigma_d=sd, sigma_s=ss,
            tile_h=16, tile_w=128, fuse=2, interpret=True)
        np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                                   rtol=0, atol=1e-11)
        np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                                   rtol=0, atol=1e-11)

    def test_tile_decomposition_invariance(self, fields):
        """Different tilings/fusings give the same answer."""
        import jax.numpy as jnp

        from tpuflow.kernels import irls_sweep_pallas
        from tpuflow.solvers import irls_sup

        gx, gy, gt = (jnp.asarray(a) for a in fields)
        sup_x, sup_y = irls_sup(gx, gy, 5.0, 1.0, 0.4, 0.2)
        u = jnp.zeros_like(gx)
        v = jnp.zeros_like(gx)
        args = dict(lambda_d=5.0, lambda_s=1.0, sigma_d=0.4, sigma_s=0.2,
                    interpret=True)
        u1, v1 = irls_sweep_pallas(u, v, gx, gy, gt, sup_x, sup_y, 4,
                                   tile_h=48, tile_w=128, fuse=4, **args)
        u2, v2 = irls_sweep_pallas(u, v, gx, gy, gt, sup_x, sup_y, 4,
                                   tile_h=8, tile_w=128, fuse=1, **args)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                                   rtol=0, atol=1e-11)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=0, atol=1e-11)


class TestBlackAnandanFast:
    def test_matches_equivalence_path(self, small_pair):
        """Fixed small iteration budget, no early stop triggers: the
        fused-kernel pyramid must match the jnp pyramid bitwise-ish."""
        import jax.numpy as jnp
        import numpy as np

        from tpuflow.core.config import MultipleMotionParam
        from tpuflow.solvers import optical_flow_pyramid
        from tpuflow.solvers.black_anandan_fast import (
            optical_flow_pyramid_fast,
        )

        prev, nxt = small_pair
        param = MultipleMotionParam(level=2, error_min_threshold=0.0)
        u_ref, v_ref = optical_flow_pyramid(
            jnp.asarray(prev), jnp.asarray(nxt), 255.0, param,
            iter_max=8, iter_scale=1.0)
        u_f, v_f = optical_flow_pyramid_fast(
            jnp.asarray(prev), jnp.asarray(nxt), 255.0, param,
            iter_max=8, iter_scale=1.0, fuse=4, tile_h=32, tile_w=128,
            interpret=True)
        np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_ref),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_ref),
                                   rtol=0, atol=1e-10)


class TestSepConvPallas:
    @pytest.mark.parametrize("taps", [(5, 5), (17, 17), (48, 48), (3, 21)])
    def test_matches_jnp_valid(self, taps):
        import jax.numpy as jnp

        from tpuflow.kernels.sepconv import sep_conv2d_valid_pallas
        from tpuflow.ops.filters import _conv2d_valid

        nky, nkx = taps
        rng = np.random.default_rng(0)
        hp, wp = 70 + nky - 1, 150 + nkx - 1
        padded = jnp.asarray(rng.normal(size=(hp, wp)), jnp.float32)
        ky = rng.normal(size=nky)
        kx = rng.normal(size=nkx)
        ref = _conv2d_valid(padded, jnp.asarray(ky[:, None] * kx[None, :],
                                                jnp.float32))
        out = sep_conv2d_valid_pallas(
            padded, tuple(float(v) for v in ky), tuple(float(v) for v in kx),
            tile_h=32, tile_w=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("n", [8, 21, 48])
    def test_uniform_taps_doubling_path(self, n):
        """Uniform (box) taps route through the log2-doubling window sum
        — must match the generic tap loop to f32 association noise."""
        import jax.numpy as jnp

        from tpuflow.kernels.sepconv import sep_conv2d_valid_pallas
        from tpuflow.ops.filters import _conv2d_valid

        rng = np.random.default_rng(1)
        hp, wp = 60 + n - 1, 140 + n - 1
        padded = jnp.asarray(rng.normal(size=(hp, wp)), jnp.float32)
        taps = tuple([1.0 / n] * n)
        ref = _conv2d_valid(
            padded, jnp.full((n, n), 1.0 / n**2, jnp.float32))
        out = sep_conv2d_valid_pallas(padded, taps, taps,
                                      tile_h=32, tile_w=128,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_dispatch_falls_back_on_cpu(self):
        """On the CPU backend sep_conv2d keeps the jnp path (f64 oracle
        parity); the pallas path is TPU-only."""
        import jax.numpy as jnp

        from tpuflow.ops.filters import _sep_conv_use_pallas

        img = jnp.zeros((16, 16), jnp.float32)
        k = jnp.ones(5)
        assert not _sep_conv_use_pallas(img, k, k)


class TestHornSchunckResident:
    def test_matches_tiled_and_jnp(self, small_pair):
        import jax.numpy as jnp

        from tpuflow.kernels import horn_schunck_pallas_resident
        from tpuflow.solvers import horn_schunck

        prev, nxt = small_pair
        p = jnp.asarray(prev)
        n = jnp.asarray(nxt)
        u_ref, v_ref = horn_schunck(p, n, 5, 9, 1.0)
        u, v = horn_schunck_pallas_resident(p, n, 5, 9, 1.0, interpret=True)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   rtol=0, atol=1e-10)

    def test_resident2_matches_jnp(self, small_pair):
        import jax.numpy as jnp

        from tpuflow.kernels import horn_schunck_pallas_resident2
        from tpuflow.solvers import horn_schunck

        prev, nxt = small_pair
        p = jnp.asarray(prev)
        n = jnp.asarray(nxt)
        u_ref, v_ref = horn_schunck(p, n, 5, 9, 1.0)
        u, v = horn_schunck_pallas_resident2(p, n, 5, 9, 1.0, interpret=True)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   rtol=0, atol=1e-10)


class TestTileSweeps:
    def test_hs_tile_sweeps_interior(self):
        """The shard_map tile body == the jnp solver on a full-frame
        'tile' at origin (0, 0)."""
        import jax.numpy as jnp

        from tpuflow.kernels import hs_tile_sweeps
        from tpuflow.solvers import horn_schunck
        from tpuflow.solvers.horn_schunck import hs_gradients

        r = np.random.default_rng(13)
        h, w = 24, 40
        fuse = 3
        prev = jnp.asarray(r.uniform(0, 255, (h, w)))
        nxt = jnp.asarray(r.uniform(0, 255, (h, w)))
        u_ref, v_ref = horn_schunck(prev, nxt, 5, fuse, 1.0)
        gx, gy, gt = hs_gradients(prev, nxt)
        inv = 1.0 / (1.0 + gx * gx + gy * gy)
        need = fuse * 2
        pad = lambda a: jnp.pad(a, need)
        u, v = hs_tile_sweeps(pad(jnp.zeros((h, w))), pad(jnp.zeros((h, w))),
                              pad(gx), pad(gy), pad(gt), pad(inv),
                              -need, -need, h, w, 5, fuse, interpret=True)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                                   rtol=0, atol=1e-10)


class TestFbBlurSolve:
    def test_matches_jnp_box_path(self):
        """fb_blur_solve_pallas == _box_blur + _solve_flow on a
        well-conditioned normal-equation field (odd and even winsize,
        unaligned shapes)."""
        import jax.numpy as jnp

        from tpuflow.kernels.fb_kernels import fb_blur_solve_pallas
        from tpuflow.solvers.farneback import _box_blur, _solve_flow

        r = np.random.default_rng(0)
        for h, w, K in [(64, 96, 15), (57, 83, 48), (40, 50, 9)]:
            a11 = r.normal(size=(h, w))
            a12 = 0.2 * r.normal(size=(h, w))
            a22 = r.normal(size=(h, w))
            db1 = r.normal(size=(h, w))
            db2 = r.normal(size=(h, w))
            M = jnp.asarray(np.stack([
                a11 * a11 + a12 * a12, a12 * (a11 + a22),
                a12 * a12 + a22 * a22,
                a11 * db1 + a12 * db2, a12 * db1 + a22 * db2,
            ]), jnp.float32)
            u0, v0 = _solve_flow(_box_blur(M, K))
            m = K // 2
            Mp = jnp.pad(M, ((0, 0), (m, m), (m, m)), mode="edge")
            u1, v1 = fb_blur_solve_pallas(Mp, K, interpret=True)
            np.testing.assert_allclose(np.asarray(u1[:h, :w]),
                                       np.asarray(u0), rtol=0, atol=1e-5)
            np.testing.assert_allclose(np.asarray(v1[:h, :w]),
                                       np.asarray(v0), rtol=0, atol=1e-5)


class TestPipelinedTiled:
    def test_pipelined_matches_grid_kernel(self):
        """Double-buffered tiled kernel == the grid kernel == jnp solver
        (multi-tile grid, remainder block)."""
        import jax.numpy as jnp

        from tpuflow.kernels import horn_schunck_pallas
        from tpuflow.solvers import horn_schunck

        r = np.random.default_rng(14)
        p = jnp.asarray(r.uniform(0, 255, (70, 150)))
        n = jnp.asarray(r.uniform(0, 255, (70, 150)))
        u_ref, v_ref = horn_schunck(p, n, 5, 13, 1.0)
        u_p, v_p = horn_schunck_pallas(p, n, 5, 13, 1.0, tile_h=24,
                                       tile_w=128, fuse=4, pipelined=True,
                                       interpret=True)
        np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_ref),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_ref),
                                   rtol=0, atol=1e-10)

    def test_poly_expansion_kernel_matches_jnp(self):
        import jax.numpy as jnp

        from tpuflow.core import borders as bd
        from tpuflow.kernels.fb_kernels import fb_poly_expansion_pallas
        from tpuflow.solvers.farneback import _poly_exp_matrices, poly_expansion

        r = np.random.default_rng(1)
        for n, sig in [(8, 1.2), (5, 1.1)]:
            img = jnp.asarray(r.uniform(0, 255, (60, 90)), jnp.float32)
            ref = poly_expansion(img, n, sig)
            g, Ginv = _poly_exp_matrices(n, sig)
            xs = np.arange(-n, n + 1, dtype=np.float64)
            gr = Ginv[1:6].copy()
            gr[4] *= 0.5
            padded = bd.pad2d(img, (n, n, n, n), bd.CLAMP)
            out = fb_poly_expansion_pallas(
                padded, tuple(map(float, g)), tuple(map(float, g * xs)),
                tuple(map(float, g * xs * xs)),
                tuple(tuple(map(float, row)) for row in gr),
                interpret=True)
            for a, b in zip(out, ref):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0, atol=1e-4)


class TestHsTwoStageRoll:
    """roll="two_stage" (r4): the two-stage alternating-drift 5-tap box
    (scripts/r4_hs_formulation_probe.py — the one op-count lever left
    after the flat ~20us/op probe). Reassociated summation -> float
    tolerance, not bitwise."""

    @pytest.mark.parametrize("iters", [10, 9])  # even + odd fuse tails
    def test_matches_jnp_solver(self, iters):
        import jax.numpy as jnp

        from tpuflow.kernels import horn_schunck_pallas
        from tpuflow.solvers import horn_schunck

        rng = np.random.default_rng(3)
        prev = jnp.asarray(rng.uniform(0, 255, (48, 160)), jnp.float32)
        nxt = jnp.asarray(np.roll(np.asarray(prev), 2, axis=1),
                          jnp.float32)
        u1, v1 = horn_schunck(prev, nxt, 5, iters, 1.0)
        u2, v2 = horn_schunck_pallas(prev, nxt, 5, iters, 1.0,
                                     tile_h=24, tile_w=128, fuse=5,
                                     roll="two_stage", interpret=True)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u1),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                                   rtol=2e-4, atol=2e-5)

    def test_rejects_non5_window(self):
        import jax.numpy as jnp

        from tpuflow.kernels import horn_schunck_pallas

        a = jnp.zeros((16, 128), jnp.float32)
        with pytest.raises(ValueError, match="5-tap"):
            horn_schunck_pallas(a, a, 7, 4, 1.0, tile_h=16, tile_w=128,
                                fuse=2, roll="two_stage", interpret=True)
