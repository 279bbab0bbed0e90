"""Black-Anandan IRLS tests: sweep parity vs oracle, energy monotonicity,
full pyramid smoke + accuracy on synthetic motion."""

import numpy as np
import jax.numpy as jnp

from tests.oracles import (
    gm_psi,
    gm_rho,
    irls_energy_oracle,
    irls_sweep_oracle,
)
from tpuflow.core.config import MultipleMotionParam
from tpuflow.solvers.black_anandan import (
    LAMBDA_D,
    LAMBDA_S,
    irls_energy,
    irls_grad,
    irls_optical_flow_level,
    irls_sup,
    optical_flow_pyramid,
)
from tpuflow.solvers.mestimators import (
    geman_mcclure_psi,
    geman_mcclure_rho,
    lorentzian_psi,
    lorentzian_rho,
)

rng = np.random.default_rng(2)


class TestMEstimators:
    def test_geman_mcclure(self):
        x = rng.normal(size=100)
        np.testing.assert_allclose(geman_mcclure_rho(jnp.asarray(x), 0.5),
                                   gm_rho(x, 0.5), rtol=1e-12)
        np.testing.assert_allclose(geman_mcclure_psi(jnp.asarray(x), 0.5),
                                   gm_psi(x, 0.5), rtol=1e-12)

    def test_lorentzian(self):
        x = rng.normal(size=50)
        np.testing.assert_allclose(lorentzian_rho(jnp.asarray(x), 0.7),
                                   np.log1p(0.5 * (x / 0.7) ** 2), rtol=1e-12)
        np.testing.assert_allclose(lorentzian_psi(jnp.asarray(x), 0.7),
                                   2 * x / (2 * 0.49 + x**2), rtol=1e-12)


class TestIRLSSweep:
    def setup_method(self):
        self.h, self.w = 9, 11
        self.gx = rng.normal(size=(self.h, self.w))
        self.gy = rng.normal(size=(self.h, self.w))
        self.it = 0.1 * rng.normal(size=(self.h, self.w))
        self.u = 0.1 * rng.normal(size=(self.h, self.w))
        self.v = 0.1 * rng.normal(size=(self.h, self.w))
        self.sd, self.ss = 0.4, 0.2

    def test_sweep_matches_oracle(self):
        sup_x, sup_y = irls_sup(jnp.asarray(self.gx), jnp.asarray(self.gy),
                                LAMBDA_D, LAMBDA_S, self.sd, self.ss)
        dEx, dEy = irls_grad(jnp.asarray(self.u), jnp.asarray(self.v),
                             jnp.asarray(self.gx), jnp.asarray(self.gy),
                             jnp.asarray(self.it), LAMBDA_D, LAMBDA_S,
                             self.sd, self.ss)
        u1 = np.asarray(self.u - np.asarray(dEx) / float(sup_x))
        v1 = np.asarray(self.v - np.asarray(dEy) / float(sup_y))
        uo, vo = irls_sweep_oracle(self.u, self.v, self.gx, self.gy, self.it,
                                   LAMBDA_D, LAMBDA_S, self.sd, self.ss,
                                   float(sup_x), float(sup_y))
        np.testing.assert_allclose(u1, uo, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(v1, vo, rtol=1e-10, atol=1e-12)

    def test_energy_matches_oracle(self):
        E = irls_energy(jnp.asarray(self.u), jnp.asarray(self.v),
                        jnp.asarray(self.gx), jnp.asarray(self.gy),
                        jnp.asarray(self.it), LAMBDA_D, LAMBDA_S,
                        self.sd, self.ss)
        Eo = irls_energy_oracle(self.u, self.v, self.gx, self.gy, self.it,
                                LAMBDA_D, LAMBDA_S, self.sd, self.ss)
        assert abs(float(E) - Eo) < 1e-8 * max(1.0, abs(Eo))

    def test_energy_decreases(self):
        """IRLS with the Lipschitz step must monotonically decrease energy
        from a zero init (SURVEY.md §4c)."""
        u0 = jnp.zeros((self.h, self.w))
        gx, gy, it = (jnp.asarray(self.gx), jnp.asarray(self.gy),
                      jnp.asarray(self.it))
        sup_x, sup_y = irls_sup(gx, gy, LAMBDA_D, LAMBDA_S, self.sd, self.ss)
        u, v = u0, u0
        E_prev = float(irls_energy(u, v, gx, gy, it, LAMBDA_D, LAMBDA_S,
                                   self.sd, self.ss))
        for _ in range(20):
            dEx, dEy = irls_grad(u, v, gx, gy, it, LAMBDA_D, LAMBDA_S,
                                 self.sd, self.ss)
            u = u - dEx / sup_x
            v = v - dEy / sup_y
            E = float(irls_energy(u, v, gx, gy, it, LAMBDA_D, LAMBDA_S,
                                  self.sd, self.ss))
            assert E <= E_prev + 1e-10
            E_prev = E


class TestPyramidFlow:
    def test_level_runner_runs(self):
        u0 = jnp.zeros((8, 8))
        gx = jnp.asarray(rng.normal(size=(8, 8)))
        gy = jnp.asarray(rng.normal(size=(8, 8)))
        it = jnp.asarray(0.1 * rng.normal(size=(8, 8)))
        u, v, E, n, _ = irls_optical_flow_level(
            u0, u0, gx, gy, it, LAMBDA_D, LAMBDA_S, 0.4, 0.2,
            50, 1e-6, False)
        assert np.isfinite(float(E))
        assert int(n) <= 50

    def test_full_pyramid_matches_oracle(self, small_pair):
        """Golden parity: the full coarse-to-fine driver (annealing,
        LevelDown warp, prolongation, stopping semantics) matches the
        pinned NumPy oracle on a real-image crop."""
        from tests.oracles import optical_flow_pyramid_oracle

        prev, nxt = small_pair
        prev = prev[:32, :40]
        nxt = nxt[:32, :40]
        u, v = optical_flow_pyramid(
            jnp.asarray(prev), jnp.asarray(nxt), 255.0,
            MultipleMotionParam(level=2), iter_scale=0.05)
        uo, vo = optical_flow_pyramid_oracle(prev, nxt, 255.0, 2,
                                             iter_scale=0.05)
        np.testing.assert_allclose(np.asarray(u), uo, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v), vo, rtol=1e-7, atol=1e-9)

    def test_real_shift_direction(self, small_pair):
        """On a real crop shifted by 1 px the flow points the right way
        with a plausible magnitude (the reference's floor-warp prolongation
        bias makes exact-magnitude tests meaningless)."""
        prev, _ = small_pair
        nxt = np.roll(prev, 1, axis=1)
        u, v = optical_flow_pyramid(
            jnp.asarray(prev), jnp.asarray(nxt), 255.0,
            MultipleMotionParam(level=2), iter_scale=0.5)
        interior = np.asarray(u)[8:-8, 8:-8]
        assert np.median(interior) > 0.3
        assert abs(np.median(np.asarray(v)[8:-8, 8:-8])) < \
            np.median(interior)


class TestEnergyTrace:
    def test_trace_matches_oracle_cadence(self):
        """Golden E(n) telemetry: the trace returned by the level solver
        equals the oracle's energy sequence at the every-64-iterations
        cadence (SHOW_IRLS_OPTICALFLOW_PYRAMID_E, OpticalFlow.cpp:261-265)."""
        h, w = 10, 12
        r = np.random.default_rng(7)
        gx = r.normal(size=(h, w))
        gy = r.normal(size=(h, w))
        it = 0.1 * r.normal(size=(h, w))
        iters = 170  # 3 checks: n = 0, 64, 128
        u, v, E, n, trace = irls_optical_flow_level(
            jnp.zeros((h, w)), jnp.zeros((h, w)),
            jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(it),
            LAMBDA_D, LAMBDA_S, 0.4, 0.2, iters, 1e-12, True)
        trace = np.asarray(trace)
        assert trace.shape == (3,)
        assert np.isfinite(trace).all()

        sup_x, sup_y = irls_sup(jnp.asarray(gx), jnp.asarray(gy),
                                LAMBDA_D, LAMBDA_S, 0.4, 0.2)
        uo = np.zeros((h, w))
        vo = np.zeros((h, w))
        expected = []
        for k in range(iters):
            uo, vo = irls_sweep_oracle(uo, vo, gx, gy, it,
                                       LAMBDA_D, LAMBDA_S, 0.4, 0.2,
                                       float(sup_x), float(sup_y))
            if (k & 0x3F) == 0:
                expected.append(irls_energy_oracle(
                    uo, vo, gx, gy, it, LAMBDA_D, LAMBDA_S, 0.4, 0.2))
        np.testing.assert_allclose(trace, expected, rtol=1e-9)

    def test_trace_nan_past_early_stop(self):
        """3-strikes abort leaves the untouched tail of the trace NaN."""
        h, w = 8, 8
        r = np.random.default_rng(8)
        gx = jnp.asarray(r.normal(size=(h, w)))
        gy = jnp.asarray(r.normal(size=(h, w)))
        it = jnp.asarray(0.1 * r.normal(size=(h, w)))
        # Huge threshold -> stops at the first check (n = 0).
        u, v, E, n, trace = irls_optical_flow_level(
            jnp.zeros((h, w)), jnp.zeros((h, w)), gx, gy, it,
            LAMBDA_D, LAMBDA_S, 0.4, 0.2, 170, 1e12, True)
        trace = np.asarray(trace)
        assert np.isfinite(trace[0])
        assert np.isnan(trace[1:]).all()

    def test_pyramid_emits_energy_events(self, small_pair, capsys):
        """--telemetry runs print irls.energy events (EnergyTrace
        producers, SURVEY.md §5.1)."""
        import io
        import json

        from tpuflow.utils.telemetry import EnergyTrace, Telemetry, set_telemetry

        buf = io.StringIO()
        set_telemetry(Telemetry(stream=buf, enabled=True))
        try:
            prev, nxt = small_pair
            prev = prev[:16, :24]
            nxt = nxt[:16, :24]
            tr = EnergyTrace()
            optical_flow_pyramid(jnp.asarray(prev), jnp.asarray(nxt), 255.0,
                                 MultipleMotionParam(level=1),
                                 iter_scale=0.05, energy_trace=tr)
        finally:
            set_telemetry(Telemetry(enabled=False))
        events = [json.loads(l) for l in buf.getvalue().splitlines()]
        energies = [e for e in events if e["event"] == "irls.energy"]
        assert energies, "no irls.energy events emitted"
        assert {e["level"] for e in energies} == {0, 1}
        assert all(e["iteration"] % 64 == 0 for e in energies)
        assert tr.as_dict()  # trace object collected the same pairs


class TestAnalyticSup:
    def test_analytic_bound_descends_and_converges(self):
        """sup_mode="analytic" (the true Geman-McClure Lipschitz bound
        max|psi'| = 2/sigma) descends the SAME energy monotonically and
        actually recovers a small shift where the reference's
        over-conservative /sigma^2 bound (~20x smaller steps) barely
        moves within the same budget. Ground-truth audit finding: the
        reference's own BA, run as written, leaves the flow ~0 at its
        default budgets."""
        import jax.numpy as jnp
        from scipy.ndimage import gaussian_filter, shift as ndshift

        from tpuflow.pyramid.pyramid import dt_level, grad_level
        from tpuflow.solvers.black_anandan import (
            irls_energy,
            irls_optical_flow_level,
        )

        rng = np.random.default_rng(1)
        base = gaussian_filter(rng.uniform(0, 1, (80, 110)), 2.5)
        prev = base[10:-10, 10:-10]
        nxt = ndshift(base, (-0.4, 0.0), order=3)[10:-10, 10:-10]
        gx, gy = grad_level(jnp.asarray(prev, jnp.float32))
        it = dt_level(jnp.asarray(prev, jnp.float32),
                      jnp.asarray(nxt, jnp.float32))
        z = jnp.zeros_like(gx)
        args = (5.0, 1.0, float(0.2 / np.sqrt(2)),
                float(0.03 / np.sqrt(2)), 2048, 1e-12, 0)
        u_r, v_r, _, _, _ = irls_optical_flow_level(z, z, gx, gy, it,
                                                    *args)
        u_a, v_a, _, _, trace = irls_optical_flow_level(
            z, z, gx, gy, it, *args, sup_mode="analytic")
        m = (slice(12, -12), slice(12, -12))
        # The analytic step moves much farther toward the true flow...
        med_r = float(np.median(np.asarray(v_r)[m]))
        med_a = float(np.median(np.asarray(v_a)[m]))
        assert med_a < med_r < 0.001  # true v is -0.4
        assert med_a < 10 * med_r
        # ...while reaching a LOWER value of the same energy...
        E_r = float(irls_energy(u_r, v_r, gx, gy, it, *args[:4]))
        E_a = float(irls_energy(u_a, v_a, gx, gy, it, *args[:4]))
        assert E_a < E_r
        # ...monotonically (E(n) trace non-increasing).
        tr = np.asarray(trace)
        tr = tr[np.isfinite(tr)]
        assert np.all(np.diff(tr) <= 1e-7)

    def test_unknown_sup_mode_rejected(self):
        import jax.numpy as jnp
        import pytest

        from tpuflow.solvers.black_anandan import irls_sup

        with pytest.raises(ValueError, match="sup_mode"):
            irls_sup(jnp.ones((4, 4)), jnp.ones((4, 4)), 5.0, 1.0,
                     0.1, 0.1, "fast")
