"""Kernel dispatch across scalar/diagonal/Gram shapes, algebra, MLE."""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu import kernels

ALL_KERNELS = [
    kernels.SquareExponential(),
    kernels.SquareExponential(input_scale=2.0, output_scale=0.5),
    kernels.Matern52(),
    kernels.Matern52(input_scale=0.5),
    kernels.Polynomial(),
    kernels.Polynomial(order=3, const=0.1),
    kernels.WhiteNoise(),
    kernels.WhiteNoise(output_scale=2.0),
    kernels.Lambda(lambda x, y: jnp.exp(-jnp.sum((x - y) ** 2))),
]


@pytest.fixture
def points():
    return jax.random.normal(jax.random.PRNGKey(0), (6, 2))


@pytest.mark.parametrize("k", ALL_KERNELS, ids=lambda k: str(k))
def test_shape_dispatch(k, points):
    X = points
    # scalar pair
    val = k(X[0], X[1])
    assert val.shape == ()
    # diagonal
    diag = k(X, X)
    assert diag.shape == (6,)
    # full Gram
    gram = k(X, X.T)
    assert gram.shape == (6, 6)
    # consistency
    assert jnp.allclose(jnp.diag(gram), diag)
    assert jnp.allclose(gram[0, 1], val)


def test_white_noise_is_diagonal(points):
    gram = kernels.WhiteNoise(output_scale=3.0)(points, points.T)
    assert jnp.allclose(gram, 9.0 * jnp.eye(6))


def test_kernel_addition(points):
    k1, k2 = kernels.SquareExponential(), kernels.WhiteNoise()
    summed = k1 + k2
    assert isinstance(summed, kernels.Lambda)
    assert jnp.allclose(
        summed(points, points.T), k1(points, points.T) + k2(points, points.T)
    )


def test_duplicate_block_structure(points):
    base = kernels.SquareExponential()
    stacked = kernels.duplicate(base, 3)
    gram = stacked(points, points.T)
    block = base(points, points.T)
    assert gram.shape == (18, 18)
    for i in range(3):
        sl = slice(6 * i, 6 * (i + 1))
        assert jnp.allclose(gram[sl, sl], block)
    assert jnp.allclose(gram[:6, 6:12], 0.0)

    diag = stacked(points, points)
    assert diag.shape == (18,)
    assert jnp.allclose(diag, jnp.tile(base(points, points), 3))


def test_mle_input_scale_picks_best_trial():
    mesh_points = jnp.linspace(0, 1, 20).reshape(-1, 1)
    true_kernel = kernels.SquareExponential(input_scale=3.0)
    gram = true_kernel(mesh_points, mesh_points.T) + 1e-8 * jnp.eye(20)
    data = jnp.linalg.cholesky(gram) @ jax.random.normal(jax.random.PRNGKey(1), (20,))

    trials = jnp.array([0.1, 1.0, 3.0, 10.0, 100.0])
    best = kernels.mle_input_scale(
        mesh_points=mesh_points,
        data=data,
        kernel_type=kernels.SquareExponential,
        input_scale_trials=trials,
    )
    assert float(best) > 0.0
    assert best in trials


def test_mle_input_scale_gradient_improves_on_grid():
    """Adam MLE reaches a likelihood at least as good as the grid winner."""
    pytest.importorskip("optax")
    mesh_points = jnp.linspace(0, 1, 20).reshape(-1, 1)
    true_kernel = kernels.SquareExponential(input_scale=5.0)
    gram = true_kernel(mesh_points, mesh_points.T) + 1e-8 * jnp.eye(20)
    data = jnp.linalg.cholesky(gram) @ jax.random.normal(jax.random.PRNGKey(2), (20,))

    grid_best = kernels.mle_input_scale(
        mesh_points=mesh_points,
        data=data,
        kernel_type=kernels.SquareExponential,
        input_scale_trials=jnp.array([0.5, 2.0, 8.0, 32.0]),
    )
    grad_best = kernels.mle_input_scale_gradient(
        mesh_points=mesh_points,
        data=data,
        kernel_type=kernels.SquareExponential,
        initial_scale=float(grid_best),
        num_steps=50,
    )

    def ll(scale):
        k = kernels.SquareExponential(input_scale=scale)
        g = k(mesh_points, mesh_points.T) + 1e-10 * jnp.eye(20)
        return float(kernels.log_likelihood(gram_matrix=g, y=data, n=20))

    assert ll(grad_best) >= ll(float(grid_best)) - 1e-6


def test_kernels_are_hashable_static_args():
    @jax.jit
    def gram_of(points, k):
        return k(points, points.T)

    # dataclass kernels hash -> usable via closure/static; smoke a jit call
    pts = jnp.zeros((3, 1))
    k = kernels.SquareExponential(input_scale=1.5)
    out = jax.jit(lambda p: k(p, p.T))(pts)
    assert out.shape == (3, 3)
