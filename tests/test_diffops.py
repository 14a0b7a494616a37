"""Differential-operator algebra tests (mirrors the reference doctest examples)."""

import jax.numpy as jnp
import pytest

from pnmol_tpu import diffops


@pytest.fixture
def fun():
    return lambda x: jnp.linalg.norm(x) ** 2


X0 = jnp.ones(2)


def test_identity_and_power(fun):
    assert jnp.allclose(diffops.identity()(fun)(X0), 2.0)
    assert jnp.allclose(diffops.power(3)(fun)(X0), 8.0)


def test_laplace(fun):
    assert jnp.allclose(diffops.laplace()(fun)(X0), 4.0)


def test_gradient(fun):
    grad = diffops.gradient()(fun)(X0)
    assert jnp.allclose(grad, 2.0 * X0)


def test_divergence():
    vec_fun = lambda x: 3.0 * x
    assert jnp.allclose(diffops.divergence()(vec_fun)(X0), 6.0)


def test_gradient_by_dimension():
    vec_fun = lambda x: jnp.array([x[0] ** 2, x[1] ** 3])
    row0 = diffops.gradient_by_dimension(0)(vec_fun)(X0)
    assert jnp.allclose(row0, jnp.array([2.0, 0.0]))


def test_algebra(fun):
    I, P, DD = diffops.identity(), diffops.power(3), diffops.laplace()
    op = I + P * DD
    assert jnp.allclose(op(fun)(X0), 2.0 + 8.0 * 4.0)
    op2 = I - DD
    assert jnp.allclose(op2(fun)(X0), 2.0 - 4.0)


def test_compose(fun):
    P, DD = diffops.power(3), diffops.laplace()
    assert jnp.allclose(P.compose_with(DD)(fun)(X0), 64.0)  # (lap f)^3


def test_matmul_contracts_gradients(fun):
    # grad is 1-D, so @ contracts: (grad f) . (grad f)
    g = diffops.gradient()
    val = (g @ g)(fun)(X0)
    assert val.shape == ()
    assert jnp.allclose(val, jnp.dot(2 * X0, 2 * X0))


def test_scalar_mult_and_constant(fun):
    assert jnp.allclose(diffops.scalar_mult(5.0)(fun)(X0), 10.0)
    assert jnp.allclose(diffops.constant(7.0)(fun)(X0), 7.0)


def test_kpz_composition(fun):
    """KPZ operator: nu lap f + lambda (grad f)^2 + eta."""
    kpz = (
        diffops.scalar_mult(2.0) * diffops.laplace()
        + diffops.scalar_mult(3.0) * (diffops.gradient() @ diffops.gradient())
        + diffops.constant(4.0)
    )
    # operators multiply pointwise after application:
    # (2 f)(lap f) + (3 f)(grad f . grad f) + 4 = 2*2*4 + 3*2*8 + 4
    val = kpz(fun)(X0)
    assert jnp.allclose(val, 2.0 * 2.0 * 4.0 + 3.0 * 2.0 * 8.0 + 4.0)


def test_argnums_differentiates_second_argument():
    k = lambda x, y: jnp.dot(x - y, x - y)
    d_dy = diffops.gradient()(k, argnums=1)
    x, y = jnp.ones(2), jnp.zeros(2)
    assert jnp.allclose(d_dy(x, y), -2.0 * (x - y))
