"""MOL baseline EK1 and the DP5 reference integrator."""

import jax.numpy as jnp
import pytest

from pnmol_tpu.models import examples
from pnmol_tpu.odetools import ek1, init, ivp, reference_solver, step


@pytest.fixture
def heat_ivp():
    pde = examples.heat_1d_discretized(dx=0.1, tmax=1.0)
    return pde.to_ivp()


def test_ek1_constant_solves_heat(heat_ivp):
    solver = ek1.ReferenceEK1ConstantDiffusion(
        num_derivatives=2,
        steprule=step.Constant(dt=0.05),
        initialization=init.Stack(use_df=False),
    )
    sol, sigma_sq = solver.solve(heat_ivp)
    assert not jnp.any(jnp.isnan(sol.mean))
    assert float(sigma_sq) > 0.0
    assert sol.mean.shape[0] == sol.t.shape[0]
    # solution decays like heat
    assert float(jnp.max(jnp.abs(sol.mean[-1, 0]))) < float(
        jnp.max(jnp.abs(sol.mean[0, 0]))
    )
    # E0 projection via iwp attribute (experiment-layer contract)
    E0 = solver.iwp.projection_matrix(0)
    assert E0.shape[0] == heat_ivp.y0.shape[0]


def test_ek1_matches_dp5_reference(heat_ivp):
    solver = ek1.ReferenceEK1ConstantDiffusion(
        num_derivatives=3,
        steprule=step.Constant(dt=0.01),
        initialization=init.TaylorMode(),
    )
    sol, _ = solver.solve(heat_ivp)
    ref = reference_solver.solve_ivp_dopri5(
        heat_ivp.f,
        (heat_ivp.t0, heat_ivp.tmax),
        heat_ivp.y0,
        t_eval=jnp.asarray([heat_ivp.tmax]),
        rtol=1e-10,
        atol=1e-12,
    )
    assert jnp.allclose(sol.mean[-1, 0], ref.y[-1], rtol=1e-4, atol=1e-7)


def test_ek1_simulate_final_state(heat_ivp):
    solver = ek1.ReferenceEK1ConstantDiffusion(
        num_derivatives=2,
        steprule=step.Constant(dt=0.05),
        initialization=init.Stack(use_df=False),
    )
    final, info = solver.simulate_final_state(heat_ivp)
    assert not jnp.any(jnp.isnan(final.y.mean))
    assert info["num_steps"] == 20
    # covariance carries the calibration factor
    sol, sigma_sq = solver.solve(heat_ivp)
    assert jnp.allclose(
        final.y.cov_sqrtm, sol.cov_sqrtm[-1] * jnp.sqrt(sigma_sq), atol=1e-10
    )


def test_ek1_adaptive(heat_ivp):
    solver = ek1.ReferenceEK1ConstantDiffusion(
        num_derivatives=2,
        steprule=step.Adaptive(abstol=1e-6, reltol=1e-4),
        initialization=init.TaylorMode(),
    )
    sol, sigma_sq = solver.solve(heat_ivp)
    assert not jnp.any(jnp.isnan(sol.mean))
    assert float(sol.t[-1]) == pytest.approx(heat_ivp.tmax)
    assert sol.info["num_attempted_steps"] >= sol.info["num_steps"]


def test_dopri5_vanderpol_accuracy():
    problem = ivp.vanderpol(stiffness_constant=1.0, tmax=5.0)
    t_eval = jnp.linspace(0.0, 5.0, 11)
    sol = reference_solver.solve_ivp_dopri5(
        problem.f, (0.0, 5.0), problem.y0, t_eval, rtol=1e-10, atol=1e-12
    )
    assert sol.y.shape == (11, 2)
    assert not jnp.any(jnp.isnan(sol.y))
    # energy-ish sanity: solution bounded
    assert float(jnp.max(jnp.abs(sol.y))) < 10.0
    # cross-check against scipy on host
    import numpy as np
    import scipy.integrate

    ref = scipy.integrate.solve_ivp(
        problem.f, (0.0, 5.0), np.asarray(problem.y0), t_eval=np.asarray(t_eval),
        rtol=1e-10, atol=1e-12, method="RK45",
    )
    assert np.allclose(np.asarray(sol.y), ref.y.T, rtol=1e-6, atol=1e-8)
