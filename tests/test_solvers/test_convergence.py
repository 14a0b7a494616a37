"""Convergence of the white-noise filter mean to the MOL solution (heat).

As dt -> 0 with fixed dx, the filter mean must converge to the solution of
the discretized system (here the boundary-eliminated IVP solved by DP5 at
tight tolerance). Note this holds cleanly for linear problems; for the
white-noise solver on nonlinear systems the fixed per-step measurement noise
makes very small dt counterproductive (the work-precision experiments show
the floor — an algorithmic property of PNMOL-white, not an implementation
artifact)."""

import jax
import jax.numpy as jnp

from pnmol_tpu.models import examples
from pnmol_tpu.odetools import reference_solver, step
from pnmol_tpu.solvers import white


def test_white_mean_converges_to_mol_solution():
    heat = examples.heat_1d_discretized(dx=0.1, tmax=1.0)
    ivp = heat.to_ivp()
    ref = reference_solver.solve_ivp_dopri5(
        jax.jit(ivp.f), ivp.t_span, ivp.y0, jnp.asarray([1.0]), rtol=1e-12, atol=1e-12
    ).y[-1]

    errors = []
    for dt in (0.1, 0.02, 0.004):
        solver = white.LinearWhiteNoiseEK1(steprule=step.Constant(dt))
        final, _ = solver.simulate_final_state(heat)
        u = final.y.mean[0][1:-1]
        errors.append(float(jnp.linalg.norm(u - ref) / jnp.linalg.norm(ref)))

    # strictly decreasing, ~4 orders of magnitude total reduction
    assert errors[0] > errors[1] > errors[2]
    assert errors[2] < 5e-4 * errors[0]


def test_dt_scaled_measurement_noise_beats_reference_semantics():
    """meascov_dt_scaled=True (measurement covariance dt * E E^T): on a
    nonlinear problem the variant is at least as accurate as the reference
    semantics at every dt and strictly better at moderate dt — it reaches
    the spatial discretization floor faster (the small-dt-floor mitigation
    proposed in round 1)."""
    sb = examples.spruce_budworm_1d_discretized(dx=0.2, tmax=1.0)
    ivp = sb.to_ivp()
    ref = reference_solver.solve_ivp_dopri5(
        jax.jit(ivp.f), ivp.t_span, ivp.y0, jnp.asarray([1.0]),
        rtol=1e-12, atol=1e-12,
    ).y[-1]

    def errors(scaled):
        out = []
        for dt in (0.02, 0.004, 0.0008):
            solver = white.SemiLinearWhiteNoiseEK1(
                steprule=step.Constant(dt), meascov_dt_scaled=scaled
            )
            final, _ = solver.simulate_final_state(sb)
            u = final.y.mean[0][1:-1]
            out.append(float(jnp.linalg.norm(u - ref) / jnp.linalg.norm(ref)))
        return out

    err_ref = errors(False)
    err_scaled = errors(True)
    assert all(s <= r * 1.05 for s, r in zip(err_scaled, err_ref))
    # strictly better at the two finer steps (measured ~4x)
    assert err_scaled[1] < 0.5 * err_ref[1]
    assert err_scaled[2] < 0.5 * err_ref[2]
