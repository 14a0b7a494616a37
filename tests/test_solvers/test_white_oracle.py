"""Golden parity: the structured white-noise step vs a dense textbook oracle.

The oracle below re-implements one EK1 step with explicit dense matrices,
following the reference semantics literally (kron products, explicit H,
full-matrix preconditioning — ``/root/reference/src/pnmol/white.py:96-146``).
The production step must match it to near machine precision; this pins down
the Kronecker-structured fast path.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.ops import iwp, sqrt
from pnmol_tpu.solvers import white


@pytest.fixture(params=["linear", "semilinear"])
def setting(request):
    if request.param == "linear":
        pde = examples.heat_1d_discretized(dx=0.2, tmax=1.0)
        solver = white.LinearWhiteNoiseEK1(
            steprule=step.Constant(dt=0.1),
            spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        )
    else:
        pde = examples.spruce_budworm_1d_discretized(dx=0.2, tmax=1.0)
        solver = white.SemiLinearWhiteNoiseEK1(
            steprule=step.Constant(dt=0.1),
            spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        )
    state = solver.initialize(pde)
    return pde, solver, state, request.param == "linear"


def dense_oracle_step(pde, solver, state, dt, linear):
    """Textbook dense EK1 step (independent implementation for testing)."""
    prior = solver.iwp
    n = prior.n
    d = prior.wiener_process_dimension

    P, P_inv = prior.nordsieck_preconditioner(dt)
    A, Ql = prior.preconditioned_discretize
    E0, E1 = prior.projection_matrix(0), prior.projection_matrix(1)

    m_flat = iwp.mean_to_flat(state.y.mean)
    m = P_inv @ m_flat
    Cl = P_inv @ state.y.cov_sqrtm

    mp = A @ m

    p0 = E0 @ P
    p1 = E1 @ P
    m_at = p0 @ mp
    t_new = state.t + dt
    if linear:
        fx = pde.L @ m_at
        Jx = pde.L
        H_ode = p1 - Jx @ p0
    else:
        fx = pde.f(t_new, m_at)
        Jx = pde.df(t_new, m_at)
        H_ode = p1 - Jx @ p0 - pde.L @ p0
    H = jnp.vstack((H_ode, pde.B @ p0))
    shift = jnp.concatenate((Jx @ m_at - fx, jnp.zeros(pde.B.shape[0])))
    z = H @ mp + shift
    E_bc = jax.scipy.linalg.block_diag(pde.E_sqrtm, pde.R_sqrtm)

    # error estimate
    S = H @ (Ql @ Ql.T) @ H.T + E_bc @ E_bc.T
    sigma_sq = z @ jnp.linalg.solve(S, z) / z.shape[0]
    error = jnp.sqrt(jnp.diag(S)) * jnp.sqrt(sigma_sq)
    error = dt * error[: -pde.B.shape[0]]

    Clp = sqrt.propagate_cholesky_factor(A @ Cl, Ql)
    Cl_new, K, Sl = sqrt.update_sqrt(H, Clp, E_bc)
    m_new = mp - K @ z

    resid = jax.scipy.linalg.solve_triangular(Sl, z, lower=True)
    diffusion_sq = resid @ resid / resid.shape[0]

    m_new = P @ m_new
    Cl_new = P @ Cl_new
    return (
        iwp.flat_to_mean(m_new, n),
        Cl_new,
        error,
        jnp.abs(iwp.flat_to_mean(m_new, n)[0]),
        diffusion_sq,
    )


def test_structured_step_matches_dense_oracle(setting):
    pde, solver, state, linear = setting
    dt = 0.07
    fast = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, state.t + dt, jnp.asarray(dt)
    )
    oracle = dense_oracle_step(pde, solver, state, dt, linear)

    mean_f, cov_f, err_f, ref_f, diff_f = fast
    mean_o, cov_o, err_o, ref_o, diff_o = oracle

    assert jnp.allclose(mean_f, mean_o, rtol=1e-10, atol=1e-12)
    # covariance factors agree up to orthogonal signs: compare products
    assert jnp.allclose(cov_f @ cov_f.T, cov_o @ cov_o.T, rtol=1e-8, atol=1e-12)
    assert jnp.allclose(err_f, err_o, rtol=1e-8, atol=1e-12)
    assert jnp.allclose(ref_f, ref_o, rtol=1e-10, atol=1e-12)
    assert jnp.allclose(diff_f, diff_o, rtol=1e-8)


def test_multi_step_trajectory_stays_on_oracle(setting):
    """Ten chained steps: structured and oracle trajectories stay together."""
    pde, solver, state, linear = setting
    dt = 0.05
    mean_f, cov_f = state.y.mean, state.y.cov_sqrtm
    state_o = state
    for k in range(10):
        t_next = state.t + (k + 1) * dt
        mean_f, cov_f, *_ = solver._step_fn(mean_f, cov_f, t_next, jnp.asarray(dt))
        mo, co, *_ = dense_oracle_step(pde, solver, state_o, dt, linear)
        state_o = state_o._replace(
            t=state_o.t + dt,
            y=state_o.y._replace(mean=mo, cov_sqrtm=co),
        )
    assert jnp.allclose(mean_f, state_o.y.mean, rtol=1e-8, atol=1e-10)
    assert jnp.allclose(
        cov_f @ cov_f.T,
        state_o.y.cov_sqrtm @ state_o.y.cov_sqrtm.T,
        rtol=1e-6,
        atol=1e-10,
    )