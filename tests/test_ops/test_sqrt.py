"""Exact-value tests: QR-based sqrt ops vs naive dense covariance algebra."""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu.ops import sqrt


def _random_spd_factor(key, n):
    w = jax.random.normal(key, (n, n))
    return jnp.linalg.cholesky(w @ w.T + n * jnp.eye(n))


@pytest.fixture(params=[(5, 5), (7, 3)], ids=["square", "rect"])
def shapes(request):
    return request.param


@pytest.fixture
def operands(shapes):
    d_in, d_out = shapes
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(42), 4)
    SC = _random_spd_factor(k1, d_in)
    SQ = _random_spd_factor(k2, d_in)
    H = jax.random.normal(k3, (d_out, d_in))
    R = _random_spd_factor(k4, d_out)
    return SC, SQ, H, R


def test_propagate_cholesky_factor(operands):
    SC, SQ, *_ = operands
    prop = sqrt.propagate_cholesky_factor(SC, SQ)
    assert jnp.allclose(prop @ prop.T, SC @ SC.T + SQ @ SQ.T)
    # lower triangular up to signs
    assert jnp.allclose(jnp.triu(prop, 1), 0.0)


def test_sqrtm_to_cholesky():
    St = jax.random.normal(jax.random.PRNGKey(1), (9, 4))
    L = sqrt.sqrtm_to_cholesky(St)
    assert L.shape == (4, 4)
    assert jnp.allclose(L @ L.T, St.T @ St)


def test_update_sqrt_matches_dense_formulas(operands):
    SC, _, H, R = operands
    C = SC @ SC.T
    S_dense = H @ C @ H.T + R @ R.T
    K_dense = C @ H.T @ jnp.linalg.inv(S_dense)
    Cnew_dense = C - K_dense @ S_dense @ K_dense.T

    Cl_new, K, Sl = sqrt.update_sqrt(H, SC, R)

    assert jnp.allclose(Sl @ Sl.T, S_dense)
    assert jnp.allclose(K, K_dense)
    assert jnp.allclose(Cl_new @ Cl_new.T, Cnew_dense, atol=1e-10)
    assert jnp.allclose(jnp.triu(Cl_new, 1), 0.0)
    assert jnp.allclose(jnp.triu(Sl, 1), 0.0)


def test_update_sqrt_no_meascov_matches_dense(operands):
    SC, _, H, _ = operands
    C = SC @ SC.T
    S_dense = H @ C @ H.T
    K_dense = C @ H.T @ jnp.linalg.inv(S_dense)
    Cnew_dense = C - K_dense @ S_dense @ K_dense.T

    Cl_new, K, Sl = sqrt.update_sqrt_no_meascov(H, SC)
    assert jnp.allclose(Sl @ Sl.T, S_dense)
    assert jnp.allclose(K, K_dense)
    assert jnp.allclose(Cl_new @ Cl_new.T, Cnew_dense, atol=1e-10)


def test_product_form_equals_explicit(operands):
    SC, _, H, R = operands
    a = sqrt.update_sqrt(H, SC, R)
    b = sqrt.update_sqrt_from_products(H @ SC, SC, R)
    for x, y in zip(a, b):
        assert jnp.allclose(x, y)


def test_fused_predict_update_equals_two_qr_pipeline(operands):
    """One pre-array QR == propagate_cholesky_factor + update_sqrt."""
    SC, SQ, H, R = operands
    A = jax.random.normal(jax.random.PRNGKey(7), (SC.shape[0], SC.shape[0]))
    ACl = A @ SC

    Clp = sqrt.propagate_cholesky_factor(ACl, SQ)
    cov2, gain2, innov2 = sqrt.update_sqrt(H, Clp, R)

    cov1, gain1, innov1 = sqrt.fused_predict_update(H @ ACl, ACl, H @ SQ, SQ, R)

    assert jnp.allclose(cov1 @ cov1.T, cov2 @ cov2.T, atol=1e-10)
    assert jnp.allclose(gain1, gain2, atol=1e-10)
    assert jnp.allclose(innov1 @ innov1.T, innov2 @ innov2.T, atol=1e-10)


def test_batched_variants(operands):
    SC, SQ, H, _ = operands
    SCs = jnp.stack([SC, 2 * SC])
    SQs = jnp.stack([SQ, 0.5 * SQ])
    props = sqrt.batched_propagate_cholesky_factor(SCs, SQs)
    for i, (a, b) in enumerate(zip(SCs, SQs)):
        assert jnp.allclose(props[i], sqrt.propagate_cholesky_factor(a, b))

    Hs = jnp.stack([H, -H])
    covs, gains, innovs = sqrt.batched_update_sqrt(Hs, SCs)
    for i in range(2):
        c, k, s = sqrt.update_sqrt_no_meascov(Hs[i], SCs[i])
        assert jnp.allclose(covs[i], c)
        assert jnp.allclose(gains[i], k)
        assert jnp.allclose(innovs[i], s)


def test_blocks_tier_reconstructs_gain_and_factors(operands):
    """The *_blocks tier returns (posterior, L21, innovation) with the same
    Grams as the gain tier and gain == L21 @ L1^{-1}; the step kernels'
    mean update L21 @ (L1^{-1} z) equals K @ z."""
    SC, SQ, H, R = operands
    A = jax.random.normal(jax.random.PRNGKey(8), (SC.shape[0], SC.shape[0]))
    ACl = A @ SC

    cov_g, gain, innov_g = sqrt.fused_predict_update(H @ ACl, ACl, H @ SQ, SQ, R)
    cov_b, L21, innov_b = sqrt.fused_predict_update_blocks(
        H @ ACl, ACl, H @ SQ, SQ, R
    )
    assert jnp.allclose(cov_b @ cov_b.T, cov_g @ cov_g.T, atol=1e-10)
    assert jnp.allclose(innov_b @ innov_b.T, innov_g @ innov_g.T, atol=1e-10)
    gain_b = jax.scipy.linalg.solve_triangular(
        innov_b, L21.T, lower=True, trans=1
    ).T
    assert jnp.allclose(gain_b, gain, atol=1e-9)

    z = jax.random.normal(jax.random.PRNGKey(9), (H.shape[0],))
    white = jax.scipy.linalg.solve_triangular(innov_b, z, lower=True)
    assert jnp.allclose(L21 @ white, gain @ z, atol=1e-9)

    # update-only variant
    cov_g2, gain2, innov_g2 = sqrt.update_sqrt_from_products(H @ SC, SC, R)
    cov_b2, L21_2, innov_b2 = sqrt.update_sqrt_from_products_blocks(
        H @ SC, SC, R
    )
    assert jnp.allclose(cov_b2 @ cov_b2.T, cov_g2 @ cov_g2.T, atol=1e-10)
    white2 = jax.scipy.linalg.solve_triangular(innov_b2, z, lower=True)
    assert jnp.allclose(L21_2 @ white2, gain2 @ z, atol=1e-9)


def test_tri_solve_upper_blocked_matches_xla():
    """ops/trisolve upper variant (round 5: the DARE _qr_solve wide-RHS
    wall at D=2e4) must match solve_triangular(U, B, lower=False)."""
    import jax.scipy.linalg

    import numpy as np

    from pnmol_tpu.ops import trisolve

    rng = np.random.default_rng(7)
    for n, k, panel in [(13, 5, 4), (32, 17, 8), (40, 40, 16)]:
        U = jnp.asarray(np.triu(rng.normal(size=(n, n))) + n * np.eye(n))
        B = jnp.asarray(rng.normal(size=(n, k)))
        got = trisolve.tri_solve_upper_blocked(U, B, panel=panel)
        want = jax.scipy.linalg.solve_triangular(U, B, lower=False)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # 1-D rhs path
    b = jnp.asarray(rng.normal(size=(13,)))
    U = jnp.asarray(np.triu(rng.normal(size=(13, 13))) + 13 * np.eye(13))
    got = trisolve.tri_solve_upper_blocked(U, b, panel=4)
    want = jax.scipy.linalg.solve_triangular(U, b, lower=False)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
