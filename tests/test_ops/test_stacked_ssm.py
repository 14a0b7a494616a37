"""StackedSSM: block structure, and the single-IWP collapse for homogeneous stacks."""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu.ops import iwp, stacked_ssm


def _spd_factor(key, n):
    w = jax.random.normal(key, (n, n))
    return jnp.linalg.cholesky(w @ w.T + n * jnp.eye(n))


@pytest.fixture
def ssm():
    d, nu = 3, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p1 = iwp.IntegratedWienerTransition(
        num_derivatives=nu, wiener_process_dimension=d, wp_diffusion_sqrtm=_spd_factor(k1, d)
    )
    p2 = iwp.IntegratedWienerTransition(
        num_derivatives=nu, wiener_process_dimension=d, wp_diffusion_sqrtm=_spd_factor(k2, d)
    )
    return stacked_ssm.StackedSSM([p1, p2])


def test_state_dimension(ssm):
    assert ssm.state_dimension == sum(p.state_dimension for p in ssm.processes)


def test_blockdiag_structure(ssm):
    A, Q = ssm.preconditioned_discretize
    A0, Q0 = ssm.processes[0].preconditioned_discretize
    A1, Q1 = ssm.processes[1].preconditioned_discretize
    D0 = ssm.processes[0].state_dimension
    assert jnp.allclose(A[:D0, :D0], A0)
    assert jnp.allclose(A[D0:, D0:], A1)
    assert jnp.allclose(A[:D0, D0:], 0.0)
    assert jnp.allclose(Q[:D0, :D0], Q0)
    assert jnp.allclose(Q[D0:, D0:], Q1)


def test_single_iwp_collapse_exact(ssm):
    """The homogeneous stack equals one IWP with block-diagonal spatial factor."""
    merged = ssm.as_single_iwp()
    A_stack, Q_stack = ssm.preconditioned_discretize
    A_merge, Q_merge = merged.preconditioned_discretize
    assert jnp.allclose(A_stack, A_merge)
    assert jnp.allclose(Q_stack, Q_merge)

    dt = 0.37
    P_stack, Pinv_stack = ssm.nordsieck_preconditioner(dt)
    P_merge, Pinv_merge = merged.nordsieck_preconditioner(dt)
    assert jnp.allclose(P_stack, P_merge)
    assert jnp.allclose(Pinv_stack, Pinv_merge)


def test_projection_matrices(ssm):
    E0_all = ssm.projection_matrix(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (ssm.state_dimension,))
    merged = ssm.as_single_iwp()
    assert jnp.allclose(E0_all @ x, merged.projection_matrix(0) @ x)

    E0_proc1 = ssm.projection_matrix(0, process_to_project_onto=1)
    D0 = ssm.processes[0].state_dimension
    n = ssm.processes[1].num_derivatives + 1
    expected = iwp.project_derivative(x[D0:], 0, n)
    assert jnp.allclose(E0_proc1 @ x, expected)
