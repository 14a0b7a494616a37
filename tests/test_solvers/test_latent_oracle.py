"""Golden parity: the structured latent-force step vs a dense textbook oracle.

Dense re-implementation of the reference's latent attempt step
(``/root/reference/src/pnmol/latent.py:155-225``) with explicit block
matrices and the stacked-SSM machinery, checked against the collapsed
single-IWP fast path.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.ops import iwp, sqrt
from pnmol_tpu.solvers import latent


@pytest.fixture(params=["linear", "semilinear"])
def setting(request):
    if request.param == "linear":
        pde = examples.heat_1d_discretized(dx=0.2, tmax=1.0)
        solver = latent.LinearLatentForceEK1(
            steprule=step.Constant(dt=0.1),
            spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        )
    else:
        pde = examples.spruce_budworm_1d_discretized(dx=0.2, tmax=1.0)
        solver = latent.SemiLinearLatentForceEK1(
            steprule=step.Constant(dt=0.1),
            spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        )
    state = solver.initialize(pde)
    return pde, solver, state, request.param == "linear"


def dense_oracle_step(pde, solver, state, dt, linear):
    """Dense latent-force EK1 step via the generic StackedSSM machinery."""
    ssm = solver.ssm
    n = solver.num_derivatives + 1
    d = pde.L.shape[0]

    P, P_inv = ssm.nordsieck_preconditioner(dt)
    A, Ql = ssm.preconditioned_discretize
    P_state, _ = solver.state_iwp.nordsieck_preconditioner(dt)
    P_eps, _ = solver.lf_iwp.nordsieck_preconditioner(dt)
    E0, E1 = solver.E0, solver.E1

    # glued (n, 2d) mean -> [state flat; eps flat]
    state_mean, eps_mean = jnp.split(state.y.mean, 2, axis=-1)
    m_flat = jnp.concatenate(
        (iwp.mean_to_flat(state_mean), iwp.mean_to_flat(eps_mean))
    )
    m = P_inv @ m_flat
    Cl = P_inv @ state.y.cov_sqrtm

    mp = A @ m

    E0_state = E0 @ P_state
    E0_eps = E0 @ P_eps
    E1_state = E1 @ P_state
    E0_stacked = jax.scipy.linalg.block_diag(E0_state, E0_eps)
    m_at = E0_stacked @ mp
    state_at, eps_at = jnp.split(m_at, 2)

    t_new = state.t + dt
    if linear:
        fx = pde.L @ state_at
        Jx = pde.L
        H_state = E1_state - Jx @ E0_state
    else:
        fx = pde.f(t_new, state_at)
        Jx = pde.df(t_new, state_at)
        H_state = E1_state - Jx @ E0_state - pde.L @ E0_state
    H_bc = pde.B @ E0_state
    H = jnp.block(
        [[H_state, -E0_eps], [H_bc, jnp.zeros_like(H_bc)]]
    )
    b = jnp.concatenate((Jx @ state_at - fx, jnp.zeros(pde.B.shape[0])))
    z = H @ mp + b

    Clp = sqrt.propagate_cholesky_factor(A @ Cl, Ql)
    Cl_new, K, Sl = sqrt.update_sqrt_no_meascov(H, Clp)
    m_new = mp - K @ z

    resid = jax.scipy.linalg.solve_triangular(Sl, z, lower=True)
    diffusion_sq = resid @ resid / resid.shape[0]

    m_new = P @ m_new
    Cl_new = P @ Cl_new
    m_state, m_eps = jnp.split(m_new, 2)
    glued = jnp.concatenate(
        (iwp.flat_to_mean(m_state, n), iwp.flat_to_mean(m_eps, n)), axis=1
    )
    return glued, Cl_new, diffusion_sq


def test_structured_latent_step_matches_dense_oracle(setting):
    pde, solver, state, linear = setting
    dt = 0.07
    mean_f, cov_f, _, _, diff_f = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, state.t + dt, jnp.asarray(dt)
    )
    mean_o, cov_o, diff_o = dense_oracle_step(pde, solver, state, dt, linear)

    assert jnp.allclose(mean_f, mean_o, rtol=1e-9, atol=1e-11)
    assert jnp.allclose(cov_f @ cov_f.T, cov_o @ cov_o.T, rtol=1e-7, atol=1e-11)
    assert jnp.allclose(diff_f, diff_o, rtol=1e-8)
