"""Blocked panel triangular solves vs jax.scipy (docs/SCALE.md round 3:
XLA's expander plans ~18 live (n, n) temporaries for wide RHS)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnmol_tpu.ops import trisolve


@pytest.mark.parametrize("n,K,panel", [(40, 17, 8), (64, 64, 16), (100, 3, 32)])
def test_tri_solve_lower_blocked(n, K, panel):
    rng = np.random.default_rng(0)
    L = jnp.asarray(np.tril(rng.normal(size=(n, n))) + 3 * np.eye(n))
    B = jnp.asarray(rng.normal(size=(n, K)))
    X = trisolve.tri_solve_lower_blocked(L, B, panel=panel)
    np.testing.assert_allclose(
        X, jax.scipy.linalg.solve_triangular(L, B, lower=True),
        rtol=1e-10, atol=1e-10,
    )
    Xt = trisolve.tri_solve_lower_blocked(L, B, transpose=True, panel=panel)
    np.testing.assert_allclose(
        Xt, jax.scipy.linalg.solve_triangular(L, B, lower=True, trans=1),
        rtol=1e-10, atol=1e-10,
    )


def test_cho_solve_blocked_and_vector():
    rng = np.random.default_rng(1)
    n = 50
    A = rng.normal(size=(n, n))
    G = jnp.asarray(A @ A.T + n * np.eye(n))
    L = jnp.linalg.cholesky(G)
    B = jnp.asarray(rng.normal(size=(n, 7)))
    np.testing.assert_allclose(
        trisolve.cho_solve_blocked(L, B, panel=16),
        jax.scipy.linalg.cho_solve((L, True), B),
        rtol=1e-9, atol=1e-9,
    )
    v = jnp.asarray(rng.normal(size=(n,)))
    out = trisolve.tri_solve_lower_blocked(L, v, panel=16)
    assert out.shape == (n,)
    np.testing.assert_allclose(
        out, jax.scipy.linalg.solve_triangular(L, v, lower=True),
        rtol=1e-10, atol=1e-10,
    )
