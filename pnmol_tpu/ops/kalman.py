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
def filter_step(m, sc, phi, sq, h, b, data):
    """One predict + smoothing-gain + noise-free-update step.

    Reference semantics: ``kalman.py:11-28``.
    """
    m_pred = phi @ m
    x1 = phi @ sc
    sc_pred = sqrt.propagate_cholesky_factor(x1, sq)

    cross = sc @ x1.T
    sgain = jax.scipy.linalg.cho_solve((sc_pred, True), cross.T).T

    sc_new, kgain, _ = sqrt.update_sqrt_no_meascov(h, sc_pred)
    z = h @ m_pred + b
    m_new = m_pred - kgain @ (z - data)
    return m_new, sc_new, sgain, m_pred, sc_pred, x1


@jax.jit
def smoother_step_traditional(m, sc, m_fut, sc_fut, sgain, mp, scp):
    """Full-covariance RTS smoother step (testing oracle).

    Reference semantics: ``kalman.py:32-45``.
    """
    c = sc @ sc.T
    c_fut = sc_fut @ sc_fut.T
    cp = scp @ scp.T

    new_mean = m + sgain @ (m_fut - mp)
    new_cov = c + sgain @ (c_fut - cp) @ sgain.T
    return new_mean, jnp.linalg.cholesky(new_cov)


@jax.jit
def smoother_step_sqrt(m, sc, m_fut, sc_fut, sgain, sq, mp, x):
    """Square-root RTS smoother step via one QR of a 3-block stack.

    Reference semantics: ``kalman.py:48-66``.
    """
    new_mean = m - sgain @ (mp - m_fut)

    d = m.shape[0]
    zeros = jnp.zeros((d, d), dtype=sc.dtype)
    stacked = jnp.concatenate(
        (
            jnp.concatenate((x.T, sc.T), axis=1),
            jnp.concatenate((sq.T, zeros), axis=1),
            jnp.concatenate((zeros, sc_fut.T @ sgain.T), axis=1),
        ),
        axis=0,
    )
    R = sqrt.triu_qr(stacked)
    new_cov_cholesky = R[d : 2 * d, d:].T
    return new_mean, new_cov_cholesky
