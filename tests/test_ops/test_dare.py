"""Doubling (SDA) solver for the discrete algebraic Riccati equation.

Oracle: brute-force iteration of the exact dense covariance recursion
(predict + measurement update) until stationarity — the map whose fixed
point the steady-state mode freezes (the reference re-runs it every step:
``/root/reference/src/pnmol/white.py:96-146``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnmol_tpu.ops import dare


def _random_filter_system(key, D=12, m=5):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    A = 0.9 * jax.random.normal(k1, (D, D)) / np.sqrt(D)
    A = A + 0.3 * jnp.eye(D)  # comfortably stable spectral radius
    H = jax.random.normal(k2, (m, D)) / np.sqrt(D)
    Lq = jnp.tril(jax.random.normal(k3, (D, D))) / np.sqrt(D)
    Q = Lq @ Lq.T + 1e-3 * jnp.eye(D)
    Lr = jnp.tril(jax.random.normal(k4, (m, m)))
    R = Lr @ Lr.T + 1e-2 * jnp.eye(m)
    return A, H, Q, R


def _brute_force_sigma(A, H, Q, R, iters=3000):
    """Iterate Sigma <- A [Sigma - Sigma H^T (H Sigma H^T + R)^{-1}
    H Sigma] A^T + Q to its fixed point."""
    Sigma = np.asarray(Q, dtype=np.float64)
    A, H, Q, R = (np.asarray(x, np.float64) for x in (A, H, Q, R))
    for _ in range(iters):
        S = H @ Sigma @ H.T + R
        K = Sigma @ H.T @ np.linalg.inv(S)
        P = Sigma - K @ H @ Sigma
        Sigma = A @ P @ A.T + Q
    return Sigma


@pytest.mark.parametrize("seed", [0, 1])
def test_sda_matches_brute_force_fixed_point(seed):
    A, H, Q, R = _random_filter_system(jax.random.PRNGKey(seed))
    G = H.T @ jnp.linalg.solve(R, H)

    res = dare.sda(A, G, Q, tol=1e-13, max_iters=64)
    sigma_ref = _brute_force_sigma(A, H, Q, R)

    assert int(res.iterations) < 64  # quadratic convergence, not the cap
    np.testing.assert_allclose(
        np.asarray(res.sigma), sigma_ref, rtol=1e-8, atol=1e-10
    )
    # the independent certificate agrees
    assert float(dare.dare_residual(res.sigma, A, G, Q)) < 1e-10


def test_sda_is_quadratically_fast():
    # a slow-mixing closed loop (contraction 1 - O(eps)): the plain
    # recursion needs O(1/eps) iterations, the doubling a handful
    D = 6
    A = jnp.diag(jnp.asarray([0.9999, 0.999, 0.99, 0.9, 0.5, 0.1]))
    H = jnp.eye(2, D)
    Q = 1e-4 * jnp.eye(D)
    R = jnp.eye(2)
    G = H.T @ H
    res = dare.sda(A, G, Q, tol=1e-12, max_iters=64)
    assert int(res.iterations) <= 30
    assert float(dare.dare_residual(res.sigma, A, G, Q)) < 1e-9


def test_closed_loop_growth_estimates_spectral_radius():
    rho_true = 0.93
    M = jnp.diag(jnp.asarray([rho_true, 0.5, 0.1, 0.05]))
    # rotate so the operator is not diagonal in the iteration basis
    Qm, _ = jnp.linalg.qr(
        jax.random.normal(jax.random.PRNGKey(3), (4, 4))
    )
    T = Qm @ M @ Qm.T

    def apply_T(v):
        return T @ v

    v0 = jax.random.normal(jax.random.PRNGKey(4), (4,))
    rho = float(dare.closed_loop_growth(apply_T, v0, num_iters=512))
    assert abs(rho - rho_true) < 5e-3


def test_sda_chol_solver_matches_qr_solver():
    """The large-D Cholesky-projector body (round 5: W^{-1}B = B - G(PB),
    P = C M^{-1} C^T — the form whose peak liveness fits a 16 GB chip at
    D=2e4) must reproduce the QR body's fixed point exactly."""
    rng = np.random.default_rng(11)
    D = 24
    M = rng.normal(size=(D, D))
    A = jnp.asarray(0.9 * M / np.max(np.abs(np.linalg.eigvals(M))))
    Gh = rng.normal(size=(D, D))
    G = jnp.asarray(Gh @ Gh.T / D + 0.1 * np.eye(D))
    Qh = rng.normal(size=(D, D))
    Q = jnp.asarray(Qh @ Qh.T / D + 0.1 * np.eye(D))

    qr = dare.sda(A, G, Q, tol=1e-13, solver="qr")
    ch = dare.sda(A, G, Q, tol=1e-13, solver="chol")
    np.testing.assert_allclose(np.asarray(ch.sigma), np.asarray(qr.sigma),
                               rtol=1e-9, atol=1e-11)
    assert float(dare.dare_residual(ch.sigma, A, G, Q)) < 1e-10
