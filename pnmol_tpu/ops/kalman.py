"""Reference-grade Kalman filter/smoother steps.

Capability parity with ``/root/reference/src/pnmol/base/kalman.py``. These are
the textbook single steps used by the Runge-Kutta initialization routine and as
ground truth in tests; the PDE filters use the structured fast path in
``pnmol_tpu.solvers`` instead.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from pnmol_tpu.ops import sqrt


@jax.jit
def filter_step(mean, cov_l, transition, proc_noise_l, obs_mat, obs_shift, data):
    """One predict + smoothing-gain + noise-free-update step.

    All covariances travel as lower Cholesky factors. Returns the updated
    pair, the smoothing gain for the later backward pass, the predicted
    pair, and the transited factor ``transition @ cov_l`` (reused by the
    square-root smoother). Reference semantics: ``kalman.py:11-28``.
    """
    mean_pred = transition @ mean
    transited_l = transition @ cov_l
    cov_l_pred = sqrt.propagate_cholesky_factor(transited_l, proc_noise_l)

    cross_cov = cov_l @ transited_l.T
    smoothing_gain = jax.scipy.linalg.cho_solve(
        (cov_l_pred, True), cross_cov.T
    ).T

    cov_l_new, kalman_gain, _ = sqrt.update_sqrt_no_meascov(obs_mat, cov_l_pred)
    residual = obs_mat @ mean_pred + obs_shift - data
    mean_new = mean_pred - kalman_gain @ residual
    return mean_new, cov_l_new, smoothing_gain, mean_pred, cov_l_pred, transited_l


@jax.jit
def smoother_step_traditional(
    mean, cov_l, mean_next, cov_l_next, smoothing_gain, mean_pred, cov_l_pred
):
    """Full-covariance RTS smoother step (testing oracle).

    Forms the dense covariances explicitly — numerically the naive textbook
    recursion, kept only to cross-check the square-root form below.
    Reference semantics: ``kalman.py:32-45``.
    """
    cov = cov_l @ cov_l.T
    cov_next = cov_l_next @ cov_l_next.T
    cov_pred = cov_l_pred @ cov_l_pred.T

    mean_smoothed = mean + smoothing_gain @ (mean_next - mean_pred)
    cov_smoothed = cov + smoothing_gain @ (cov_next - cov_pred) @ smoothing_gain.T
    return mean_smoothed, jnp.linalg.cholesky(cov_smoothed)


@jax.jit
def smoother_step_sqrt(
    mean, cov_l, mean_next, cov_l_next, smoothing_gain, proc_noise_l,
    mean_pred, transited_l
):
    """Square-root RTS smoother step via one QR of a 3-block stack.

    The smoothed factor is read out of the middle block-row of the
    triangularized stack; no dense covariance is ever formed.
    Reference semantics: ``kalman.py:48-66``.
    """
    mean_smoothed = mean - smoothing_gain @ (mean_pred - mean_next)

    n = mean.shape[0]
    zeros = jnp.zeros((n, n), dtype=cov_l.dtype)
    stacked = jnp.concatenate(
        (
            jnp.concatenate((transited_l.T, cov_l.T), axis=1),
            jnp.concatenate((proc_noise_l.T, zeros), axis=1),
            jnp.concatenate((zeros, cov_l_next.T @ smoothing_gain.T), axis=1),
        ),
        axis=0,
    )
    triangular = sqrt.triu_qr(stacked)
    cov_l_smoothed = triangular[n : 2 * n, n:].T
    return mean_smoothed, cov_l_smoothed
