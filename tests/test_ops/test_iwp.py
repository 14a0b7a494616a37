"""IWP prior: hand-written IBM(2) system matrices, preconditioner consistency,
and structured-vs-dense operator equivalence."""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu.ops import iwp


@pytest.fixture
def prior():
    d, nu = 3, 2
    key = jax.random.PRNGKey(7)
    w = jax.random.normal(key, (d, d))
    spatial = jnp.linalg.cholesky(w @ w.T + d * jnp.eye(d))
    return iwp.IntegratedWienerTransition(
        num_derivatives=nu, wiener_process_dimension=d, wp_diffusion_sqrtm=spatial
    )


def _ibm2_system_matrices(dt):
    """Hand-written IBM(2) transition and process noise (textbook values)."""
    A = jnp.array(
        [
            [1.0, dt, dt**2 / 2.0],
            [0.0, 1.0, dt],
            [0.0, 0.0, 1.0],
        ]
    )
    Q = jnp.array(
        [
            [dt**5 / 20.0, dt**4 / 8.0, dt**3 / 6.0],
            [dt**4 / 8.0, dt**3 / 3.0, dt**2 / 2.0],
            [dt**3 / 6.0, dt**2 / 2.0, dt],
        ]
    )
    return A, Q


@pytest.mark.parametrize("dt", [0.1, 0.5, 2.0])
def test_non_preconditioned_matches_ibm2_hand_values(dt):
    prior_1pt = iwp.IntegratedWienerTransition(
        num_derivatives=2, wiener_process_dimension=1, wp_diffusion_sqrtm=jnp.eye(1)
    )
    A, LQ = prior_1pt.non_preconditioned_discretize(dt)
    A_hand, Q_hand = _ibm2_system_matrices(dt)
    assert jnp.allclose(A, A_hand)
    assert jnp.allclose(LQ @ LQ.T, Q_hand)


def test_preconditioner_consistency(prior):
    """P @ A_pre @ P^{-1} equals the raw transition; P @ LQ_pre the raw noise."""
    dt = 0.3
    P, P_inv = prior.nordsieck_preconditioner(dt)
    A_pre, LQ_pre = prior.preconditioned_discretize
    A_raw, LQ_raw = prior.non_preconditioned_discretize(dt)
    assert jnp.allclose(P @ A_pre @ P_inv, A_raw)
    assert jnp.allclose(P @ LQ_pre, LQ_raw)
    assert jnp.allclose(P @ P_inv, jnp.eye(prior.state_dimension))


def test_projection_matrices(prior):
    n, d = prior.n, prior.wiener_process_dimension
    E0 = prior.projection_matrix(0)
    E1 = prior.projection_matrix(1)
    assert E0.shape == (d, d * n)
    x = jax.random.normal(jax.random.PRNGKey(0), (d * n,))
    M = iwp.flat_to_mean(x, n)
    assert jnp.allclose(E0 @ x, M[0])
    assert jnp.allclose(E1 @ x, M[1])


def test_structured_apply_equals_dense(prior):
    n, D = prior.n, prior.state_dimension
    A_dense, LQ_dense = prior.preconditioned_discretize
    A_1d, _ = prior.preconditioned_discretize_1d
    key = jax.random.PRNGKey(3)
    X = jax.random.normal(key, (D, D + 2))
    x = jax.random.normal(jax.random.PRNGKey(4), (D,))

    assert jnp.allclose(iwp.apply_stack_matrix(A_1d, X), A_dense @ X)
    assert jnp.allclose(iwp.apply_stack_matrix(A_1d, x), A_dense @ x)

    p, p_inv = prior.nordsieck_preconditioner_1d_raw(0.25)
    P_dense, Pinv_dense = prior.nordsieck_preconditioner(0.25)
    assert jnp.allclose(iwp.scale_stack(p, X), P_dense @ X)
    assert jnp.allclose(iwp.scale_stack(p_inv, x), Pinv_dense @ x)

    E1 = prior.projection_matrix(1)
    assert jnp.allclose(iwp.project_derivative(X, 1, n), E1 @ X)

    assert jnp.allclose(prior.process_noise_factor, LQ_dense)


def test_mean_layout_roundtrip(prior):
    n, d = prior.n, prior.wiener_process_dimension
    M = jax.random.normal(jax.random.PRNGKey(9), (n, d))
    flat = iwp.mean_to_flat(M)
    # matches numpy order="F" semantics
    import numpy as np

    assert jnp.allclose(flat, jnp.asarray(np.asarray(M).reshape(-1, order="F")))
    assert jnp.allclose(iwp.flat_to_mean(flat, n), M)
