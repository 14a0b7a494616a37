"""Pallas Gram kernel (interpret mode) and jnp fast path vs pairwise oracle."""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.ops import pallas_gram


@pytest.fixture(params=[1, 2], ids=["1d", "2d"])
def points(request):
    dim = request.param
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (37, dim))
    y = jax.random.uniform(jax.random.PRNGKey(1), (53, dim))
    return x, y


@pytest.mark.parametrize(
    "phi_name,kernel_cls",
    [("squared_exponential", kernels.SquareExponential), ("matern52", kernels.Matern52)],
)
def test_gram_fast_jnp_matches_pairwise(points, phi_name, kernel_cls):
    x, y = points
    k = kernel_cls(input_scale=1.7, output_scale=0.9)
    oracle = jax.vmap(jax.vmap(k.pairwise, (None, 0)), (0, None))(x, y)
    fast = pallas_gram.gram_fast_jnp(x, y, 1.7, 0.9, phi_name=phi_name)
    assert jnp.allclose(fast, oracle, atol=1e-10)


@pytest.mark.parametrize("phi_name", ["squared_exponential", "matern52"])
def test_pallas_kernel_interpret_matches_jnp(points, phi_name):
    x, y = points
    via_pallas = pallas_gram.gram_radial(
        x, y, 1.3, 1.1, phi_name=phi_name, interpret=True
    )
    via_jnp = pallas_gram.gram_fast_jnp(x, y, 1.3, 1.1, phi_name=phi_name)
    assert via_pallas.shape == (37, 53)
    assert jnp.allclose(via_pallas, via_jnp, atol=1e-10)


def test_radial_kernel_call_uses_fast_path(points):
    """RadialKernel.__call__ Gram results agree with the pairwise oracle."""
    x, y = points
    k = kernels.SquareExponential(input_scale=2.0)
    gram = k(x, y.T)
    oracle = jax.vmap(jax.vmap(k.pairwise, (None, 0)), (0, None))(x, y)
    assert jnp.allclose(gram, oracle, atol=1e-10)

    # diagonal and scalar dispatch unaffected
    assert jnp.allclose(k(x, x), jnp.ones(37) * k.output_scale**2)
    assert gram.dtype == oracle.dtype


def test_matern_gram_no_nan_at_zero_distance():
    pts = jnp.asarray([[0.5], [0.5], [0.7]])  # duplicate points
    k = kernels.Matern52()
    gram = k(pts, pts.T)
    assert not jnp.any(jnp.isnan(gram))
    assert jnp.allclose(gram[0, 1], k.output_scale**2)
