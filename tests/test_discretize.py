"""Discretization tests: the key classical-FD-recovery property and shapes."""

import jax.numpy as jnp
import pytest

from pnmol_tpu import diffops, discretize, kernels, mesh


@pytest.fixture
def grid():
    return mesh.RectangularMesh.from_bbox_1d([0.0, 1.0], step=0.2)


def test_polynomial_kernel_recovers_classical_laplace_stencil(grid):
    """With a quadratic Polynomial kernel, probabilistic FD must recover the
    classical [1, -2, 1] / dx^2 Laplace stencil with zero uncertainty
    (reference property: ``tests/test_discretize.py:29-71``)."""
    dx = 0.2
    L, E_sqrtm = discretize.fd_probabilistic(
        diffops.laplace(),
        mesh_spatial=grid,
        kernel=kernels.Polynomial(order=2, const=1.0),
        stencil_size_interior=3,
        stencil_size_boundary=3,
    )
    # interior rows: [1, -2, 1] / dx^2 centered on the diagonal
    for i in range(1, 4):
        row = L[i]
        expected = jnp.zeros(6).at[i - 1].set(1.0).at[i].set(-2.0).at[i + 1].set(1.0)
        assert jnp.allclose(row, expected / dx**2, atol=1e-7), (i, row)
    # uncertainties vanish: the quadratic kernel spans the quadratics
    assert jnp.allclose(E_sqrtm, 0.0, atol=1e-6)


def test_fd_applied_to_function(grid):
    """L applied to sin(pi x) approximates -pi^2 sin(pi x) on the interior."""
    L, _ = discretize.fd_probabilistic(
        diffops.laplace(),
        mesh_spatial=grid,
        kernel=kernels.Polynomial(order=2, const=1.0),
        stencil_size_interior=3,
        stencil_size_boundary=3,
    )
    x = grid.points[:, 0]
    fx = jnp.sin(jnp.pi * x)
    lap = L @ fx
    truth = -jnp.pi**2 * fx
    interior = slice(1, -1)
    assert jnp.allclose(lap[interior], truth[interior], rtol=0.15)


def test_fd_probabilistic_shapes_and_uncertainty_sign(grid):
    L, E_sqrtm = discretize.fd_probabilistic(
        diffops.laplace(),
        mesh_spatial=grid,
        kernel=kernels.SquareExponential(),
        stencil_size_interior=3,
        stencil_size_boundary=3,
    )
    N = len(grid)
    assert L.shape == (N, N)
    assert E_sqrtm.shape == (N, N)
    # E_sqrtm is diagonal with nonnegative entries
    assert jnp.allclose(E_sqrtm - jnp.diag(jnp.diag(E_sqrtm)), 0.0)
    assert jnp.all(jnp.diag(E_sqrtm) >= -1e-12)


def test_fd_matern_nan_patch(grid):
    """Matern52's removable singularity must not leak NaNs into L/E."""
    L, E_sqrtm = discretize.fd_probabilistic(
        diffops.laplace(),
        mesh_spatial=grid,
        kernel=kernels.Matern52(),
        stencil_size_interior=3,
        stencil_size_boundary=3,
    )
    assert not jnp.any(jnp.isnan(L))
    assert not jnp.any(jnp.isnan(E_sqrtm))


def test_neumann_1d(grid):
    B, R_sqrtm = discretize.fd_probabilistic_neumann_1d(
        grid, kernel=kernels.SquareExponential()
    )
    assert B.shape == (2, len(grid))
    assert R_sqrtm.shape == (2, 2)
    # Kernel FD is inexact (that is the point: R_sqrtm quantifies it), so the
    # classical identities hold only approximately.
    const = jnp.ones(len(grid))
    assert jnp.allclose(B @ const, 0.0, atol=0.15)
    # acting on f(x) = x: outward normal derivative is -1 (left), +1 (right)
    linear = grid.points[:, 0]
    vals = B @ linear
    assert jnp.allclose(vals, jnp.array([-1.0, 1.0]), atol=0.15)
    # uncertainties are positive (they dominate the residual error)
    assert jnp.all(jnp.diag(R_sqrtm) > 0.0)


def test_collocation_global(grid):
    D, E_chol = discretize.collocation_global(
        diffops.laplace(),
        grid,
        kernel=kernels.SquareExponential(input_scale=2.0),
        nugget_gram_matrix=1e-12,
        nugget_cholesky_E=1e-10,
        symmetrize_cholesky_E=True,
    )
    N = len(grid)
    assert D.shape == (N, N)
    assert E_chol.shape == (N, N)
    assert not jnp.any(jnp.isnan(D))
    assert not jnp.any(jnp.isnan(E_chol))
    # differentiation matrix acts like a Laplacian on a smooth function
    # (interior rows; global collocation is least accurate at the boundary)
    x = grid.points[:, 0]
    f = x**2
    assert jnp.allclose((D @ f)[1:-1], 2.0 * jnp.ones(N - 2), rtol=0.2)
