import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu.ops import rv


@pytest.fixture
def normal():
    key = jax.random.PRNGKey(0)
    mean = jax.random.normal(key, (4,))
    factor = jnp.tril(jax.random.normal(jax.random.PRNGKey(1), (4, 4)))
    return rv.MultivariateNormal(mean=mean, cov_sqrtm=factor)


def test_cov_reconstructed(normal):
    assert jnp.allclose(normal.cov, normal.cov_sqrtm @ normal.cov_sqrtm.T)


def test_is_pytree(normal):
    leaves = jax.tree_util.tree_leaves(normal)
    assert len(leaves) == 2

    @jax.jit
    def shift(x):
        return x._replace(mean=x.mean + 1.0)

    shifted = shift(normal)
    assert jnp.allclose(shifted.mean, normal.mean + 1.0)
    assert jnp.allclose(shifted.cov_sqrtm, normal.cov_sqrtm)


def test_vmap_stacks(normal):
    batched = jax.vmap(lambda s: rv.MultivariateNormal(normal.mean * s, normal.cov_sqrtm * s))(
        jnp.arange(1.0, 4.0)
    )
    assert batched.mean.shape == (3, 4)
    assert batched.cov_sqrtm.shape == (3, 4, 4)
