"""Black-Anandan robust dense optical flow (coarse-to-fine IRLS).

TPU-native re-design of ``OpticalFlow/OpticalFlow.cpp:22-378`` (after
M.J. Black & P. Anandan, CVIU 63(1), 1996):

- normalize both frames by MaxInt, build Gaussian pyramids
  (:mod:`tpuflow.pyramid`), per-level temporal/spatial derivatives;
- per level (coarse -> fine): anneal sigmaD/sigmaS linearly between
  (0.8, 0.2)/sqrt(2) and (0.3, 0.03)/sqrt(2) (OpticalFlow.cpp:27-34,
  113-120); recompute dt under the x2-scaled coarse flow (LevelDown);
  run IRLS Jacobi relaxation; prolong (Add_VectorOffset);
- the IRLS sweep: u_{n+1} = u_n - dE/sup with
  dE = lambdaD * g * psi_GM(g.u + I_t, sigmaD)
     + lambdaS * sum_4nbr psi_GM(u - u_nbr, sigmaS)
  and the Lipschitz bound sup = lambdaD * max|g|^2 / sigmaD^2
  + 4 lambdaS / sigmaS^2 (OpticalFlow.cpp:273-332);
- stopping: per-level IterMax = (level+1) * 10 * max(W0, H0)
  (OpticalFlow.cpp:131 — W0/H0 are the *full-resolution* sizes), energy
  evaluated every 64 iterations at level 0 / every iteration above, abort
  on E < threshold or 3 consecutive energy increases
  (OpticalFlow.cpp:248-267).

The whole per-level relaxation is a single ``lax.while_loop`` whose body is
one fused stencil sweep (double-buffered Jacobi semantics are implicit:
all reads see u_n, writes build u_{n+1}); the energy reduction rides the
same fusion. Multi-chip: the sweep is tile-parallel with a 1-pixel halo —
see :mod:`tpuflow.dist` for the shard_map version.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from tpuflow.core.config import MultipleMotionParam
from tpuflow.pyramid import (
    add_vector_offset,
    dt_pyramid,
    grad_pyramid,
    level_down,
    pyramider,
)
from tpuflow.solvers.mestimators import geman_mcclure_psi, geman_mcclure_rho

LAMBDA_D = 5.0
LAMBDA_S = 1.0
SIGMA_D_INIT = 0.8 / math.sqrt(2.0)
SIGMA_D_L0 = 0.2 / math.sqrt(2.0)
SIGMA_S_INIT = 0.3 / math.sqrt(2.0)
SIGMA_S_L0 = 0.03 / math.sqrt(2.0)


def _shift_and_mask(f: jnp.ndarray, dx: int, dy: int):
    """Neighbor value at (x+dx, y+dy) and a validity mask (border-excluded)."""
    h, w = f.shape
    shifted = jnp.roll(f, shift=(-dy, -dx), axis=(0, 1))
    mask = jnp.ones((h, w), dtype=bool)
    if dx == 1:
        mask = mask.at[:, w - 1].set(False)
    elif dx == -1:
        mask = mask.at[:, 0].set(False)
    if dy == 1:
        mask = mask.at[h - 1, :].set(False)
    elif dy == -1:
        mask = mask.at[0, :].set(False)
    return shifted, mask


_NEIGHBORS = ((-1, 0), (1, 0), (0, -1), (0, 1))


def irls_grad(u, v, gx, gy, it, lambda_d, lambda_s, sigma_d, sigma_s):
    """(dE/du, dE/dv) at every site — Error_u (OpticalFlow.cpp:273-309)."""
    center = geman_mcclure_psi(gx * u + gy * v + it, sigma_d)
    nx = jnp.zeros_like(u)
    ny = jnp.zeros_like(v)
    for dx, dy in _NEIGHBORS:
        un, m = _shift_and_mask(u, dx, dy)
        vn, _ = _shift_and_mask(v, dx, dy)
        nx = nx + jnp.where(m, geman_mcclure_psi(u - un, sigma_s), 0.0)
        ny = ny + jnp.where(m, geman_mcclure_psi(v - vn, sigma_s), 0.0)
    return (lambda_d * gx * center + lambda_s * nx,
            lambda_d * gy * center + lambda_s * ny)


def irls_energy(u, v, gx, gy, it, lambda_d, lambda_s, sigma_d, sigma_s):
    """Total robust energy — Error_MultipleMotion (OpticalFlow.cpp:335-378)."""
    center = geman_mcclure_rho(gx * u + gy * v + it, sigma_d)
    E = lambda_d * jnp.sum(center)
    for dx, dy in _NEIGHBORS:
        un, m = _shift_and_mask(u, dx, dy)
        vn, _ = _shift_and_mask(v, dx, dy)
        E = E + lambda_s * jnp.sum(
            jnp.where(m, geman_mcclure_rho(u - un, sigma_s), 0.0))
        E = E + lambda_s * jnp.sum(
            jnp.where(m, geman_mcclure_rho(v - vn, sigma_s), 0.0))
    return E


def irls_sup(gx, gy, lambda_d, lambda_s, sigma_d, sigma_s,
             sup_mode: str = "reference"):
    """Lipschitz bound per component (sup_Error_uu, OpticalFlow.cpp:312-332).

    ``sup_mode="reference"`` reproduces the reference's bound, which
    divides by sigma^2 where the Geman-McClure ψ(x, σ) = 2xσ/(σ+x²)²
    convention the code actually uses has max curvature 2/σ — so the
    reference's step sizes are ~1/(2σ) times (>= 20x at σ_S = 0.021)
    smaller than the energy permits, and with its default budget the
    descent barely moves (measured: a 0.4-px shift recovers 0.001 px
    after 4000 sweeps). ``sup_mode="analytic"`` uses the true bound
    max|ψ'| = 2/σ (data: λ_D·max g²·2/σ_D; smoothness: 4 neighbors x
    λ_S·2/σ_S) — the same minimizer and still provably monotone, ~20x
    the descent rate."""
    if sup_mode == "analytic":
        dt = gx.dtype
        sup_x = jnp.asarray(
            lambda_d * jnp.max(gx * gx) * (2.0 / sigma_d)
            + 4.0 * lambda_s * (2.0 / sigma_s)).astype(dt)
        sup_y = jnp.asarray(
            lambda_d * jnp.max(gy * gy) * (2.0 / sigma_d)
            + 4.0 * lambda_s * (2.0 / sigma_s)).astype(dt)
        return sup_x, sup_y
    if sup_mode != "reference":
        raise ValueError(f"unknown sup_mode {sup_mode!r}")
    sup_x = lambda_d * jnp.max(gx * gx) / sigma_d**2 + 4.0 * lambda_s / sigma_s**2
    sup_y = lambda_d * jnp.max(gy * gy) / sigma_d**2 + 4.0 * lambda_s / sigma_s**2
    return sup_x, sup_y


ENERGY_TRACE_EVERY = 64  # the reference's E(n) print cadence


def _trace_len(iter_max: int) -> int:
    return max(-(-iter_max // ENERGY_TRACE_EVERY), 1)


@partial(jax.jit, static_argnames=("iter_max", "is_level0", "sup_mode"))
def irls_optical_flow_level(
    u0, v0, gx, gy, it,
    lambda_d, lambda_s, sigma_d, sigma_s,
    iter_max: int,
    error_min_threshold: float,
    is_level0: bool,
    sup_mode: str = "reference",
):
    """Per-level IRLS relaxation (IRLS_OpticalFlow_Pyramid).

    Returns (u, v, E, n, trace): ``trace[k]`` is the energy after the
    sweep with ``n == 64 k`` — the reference's every-64-iterations
    ``E(%4d) = %e`` telemetry (SHOW_IRLS_OPTICALFLOW_PYRAMID_E,
    OpticalFlow.cpp:261-265); entries past the stopping point are NaN.
    """
    sup_x, sup_y = irls_sup(gx, gy, lambda_d, lambda_s, sigma_d, sigma_s,
                            sup_mode)

    def energy(u, v):
        return irls_energy(u, v, gx, gy, it, lambda_d, lambda_s,
                           sigma_d, sigma_s)

    def cond(carry):
        u, v, E, inc, n, stop, trace = carry
        return jnp.logical_and(n < iter_max, jnp.logical_not(stop))

    def body(carry):
        u, v, E, inc, n, _, trace = carry
        dEx, dEy = irls_grad(u, v, gx, gy, it, lambda_d, lambda_s,
                             sigma_d, sigma_s)
        u = u - dEx / sup_x
        v = v - dEy / sup_y
        if is_level0:
            E_new = jax.lax.cond(
                (n & 0x3F) == 0, lambda: energy(u, v), lambda: E)
            inc_new = inc
        else:
            E_new = energy(u, v)
            inc_new = jnp.where(E_new > E, inc + 1, 0)
        trace = jax.lax.cond(
            (n & 0x3F) == 0,
            lambda: trace.at[n >> 6].set(E_new), lambda: trace)
        stop = jnp.logical_or(E_new < error_min_threshold, inc_new > 3)
        return u, v, E_new, inc_new, n + 1, stop, trace

    # The reference starts E at 0.0 (OpticalFlow.cpp:230) — the first
    # level>0 iteration therefore always counts one (reset) strike.
    E0 = jnp.asarray(0.0, u0.dtype)
    trace0 = jnp.full((_trace_len(iter_max),), jnp.nan, u0.dtype)
    u, v, E, _, n, _, trace = jax.lax.while_loop(
        cond, body, (u0, v0, E0, jnp.int32(0), jnp.int32(0),
                     jnp.bool_(False), trace0))
    return u, v, E, n, trace


def optical_flow_pyramid(
    it_img: jnp.ndarray,
    itp1_img: jnp.ndarray,
    max_int: float = 255.0,
    param: MultipleMotionParam | None = None,
    iter_max: int = -1,
    iter_scale: float = 1.0,
    energy_trace=None,
    sup_mode: str = "reference",
):
    """Full coarse-to-fine Black-Anandan flow (OpticalFlow_Pyramid).

    ``iter_scale`` scales the reference's per-level iteration budget
    ((level+1) * 10 * max(W, H), OpticalFlow.cpp:131) — 1.0 reproduces the
    reference; smaller values trade accuracy for speed. ``sup_mode``:
    see :func:`irls_sup` ("analytic" takes the true Geman-McClure
    Lipschitz bound — ~20x the descent rate of the reference's
    over-conservative step, same minimizer; default keeps bit parity).
    ``energy_trace`` (a :class:`tpuflow.utils.telemetry.EnergyTrace`)
    collects the per-level E(n) sequence at the reference's 64-iteration
    cadence; when global telemetry is enabled the trace is also emitted
    as ``irls.energy`` events even without an explicit trace object.
    Returns (u, v) at full resolution.
    """
    if param is None:
        param = MultipleMotionParam()
    max_level = param.level
    it_n = it_img / max_int
    itp1_n = itp1_img / max_int

    it_levels = pyramider(it_n, max_level)
    itp1_levels = pyramider(itp1_n, max_level)
    max_level = len(it_levels) - 1  # may stop early on tiny images
    dt_levels = dt_pyramid(it_levels, itp1_levels)
    grad_levels = grad_pyramid(it_levels)

    h0, w0 = it_img.shape
    u = v = None
    for level in range(max_level, -1, -1):
        if max_level > 0:
            sigma_d = SIGMA_D_INIT + (SIGMA_D_L0 - SIGMA_D_INIT) / max_level * (max_level - level)
            sigma_s = SIGMA_S_INIT + (SIGMA_S_L0 - SIGMA_S_INIT) / max_level * (max_level - level)
        else:
            sigma_d, sigma_s = SIGMA_D_L0, SIGMA_S_L0
        gx, gy = grad_levels[level]
        if level < max_level:
            it_l = level_down(it_levels[level], itp1_levels[level], u, v)
        else:
            it_l = dt_levels[level]
        u0 = jnp.zeros_like(it_l)
        v0 = jnp.zeros_like(it_l)
        iters = int((level + 1) * 10 * max(w0, h0) * iter_scale)
        if iter_max > 0:
            iters = min(iters, iter_max)
        u_l, v_l, _, _, trace = irls_optical_flow_level(
            u0, v0, gx, gy, it_l,
            LAMBDA_D, LAMBDA_S, sigma_d, sigma_s,
            iters, param.error_min_threshold, level == 0, sup_mode)
        _emit_energy_trace(level, trace, energy_trace)
        if level < max_level:
            u_l, v_l = add_vector_offset(u_l, v_l, u, v)
        u, v = u_l, v_l
    return u, v


def _emit_energy_trace(level: int, trace, energy_trace=None) -> None:
    """Push a solver's E(n) trace to an EnergyTrace / global telemetry
    (the reference's every-64-iterations printf, OpticalFlow.cpp:261-265).
    Device fetch happens only when someone is listening."""
    from tpuflow.utils.telemetry import EnergyTrace, get_telemetry

    if energy_trace is None and not get_telemetry().enabled:
        return
    if energy_trace is None:
        energy_trace = EnergyTrace()  # .record still emits telemetry events
    import numpy as np

    vals = np.asarray(trace)
    for k, e in enumerate(vals):
        if np.isnan(e):
            break
        energy_trace.record(level, k * ENERGY_TRACE_EVERY, float(e))
