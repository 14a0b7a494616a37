"""Kalman step tests: sqrt smoother step vs traditional full-covariance step."""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu.ops import kalman, sqrt


def _spd_factor(key, n):
    w = jax.random.normal(key, (n, n))
    return jnp.linalg.cholesky(w @ w.T + n * jnp.eye(n))


@pytest.fixture
def setup():
    d = 4
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    m = jax.random.normal(keys[0], (d,))
    sc = _spd_factor(keys[1], d)
    phi = jax.random.normal(keys[2], (d, d))
    sq = _spd_factor(keys[3], d)
    h = jax.random.normal(keys[4], (2, d))
    b = jax.random.normal(keys[5], (2,))
    data = jax.random.normal(keys[6], (2,))
    return m, sc, phi, sq, h, b, data


def test_filter_step_prediction_matches_dense(setup):
    m, sc, phi, sq, h, b, data = setup
    m_new, sc_new, sgain, m_pred, sc_pred, x1 = kalman.filter_step(
        m, sc, phi, sq, h, b, data
    )
    assert jnp.allclose(m_pred, phi @ m)
    assert jnp.allclose(sc_pred @ sc_pred.T, phi @ (sc @ sc.T) @ phi.T + sq @ sq.T)
    # smoothing gain: C phi^T Cp^{-1}
    cp = sc_pred @ sc_pred.T
    assert jnp.allclose(sgain, (sc @ sc.T) @ phi.T @ jnp.linalg.inv(cp))
    # posterior consistency with dense update
    cl, kgain, _ = sqrt.update_sqrt_no_meascov(h, sc_pred)
    assert jnp.allclose(sc_new @ sc_new.T, cl @ cl.T)
    assert jnp.allclose(m_new, m_pred - kgain @ (h @ m_pred + b - data))


def test_smoother_step_sqrt_matches_traditional(setup):
    m, sc, phi, sq, h, b, data = setup
    m_new, sc_new, sgain, m_pred, sc_pred, x1 = kalman.filter_step(
        m, sc, phi, sq, h, b, data
    )
    m_fut = jax.random.normal(jax.random.PRNGKey(10), m.shape)
    sc_fut = _spd_factor(jax.random.PRNGKey(11), m.shape[0])

    mean_trad, cov_trad = kalman.smoother_step_traditional(
        m, sc, m_fut, sc_fut, sgain, m_pred, sc_pred
    )
    mean_sqrt, cov_sqrt = kalman.smoother_step_sqrt(
        m, sc, m_fut, sc_fut, sgain, sq, m_pred, x1
    )
    assert jnp.allclose(mean_trad, mean_sqrt)
    assert jnp.allclose(cov_trad @ cov_trad.T, cov_sqrt @ cov_sqrt.T, atol=1e-8)
