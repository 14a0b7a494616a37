"""Stencil-dedupe fast path: exact agreement with the per-point path, and
f32 safety of dx-adapted input scales.

On a uniform grid with a stationary kernel every interior stencil is the same
offset pattern, so fd_probabilistic solves O(1) systems instead of N
(setup-time win at N=1e4+ and the f32-safe route: offsets come from the f64
host geometry instead of differences of f32 coordinates).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pnmol_tpu import diffops, discretize, kernels, mesh


@pytest.fixture
def grid():
    return mesh.RectangularMesh.from_bbox_1d([0.0, 1.0], num=24)


def test_dedupe_matches_per_point_path(grid):
    kernel = kernels.SquareExponential(input_scale=2.0)
    L_ref, E_ref = discretize.fd_probabilistic(
        diffops.laplace(), grid, kernel=kernel, stencil_dedupe=False
    )
    L_fast, E_fast = discretize.fd_probabilistic(
        diffops.laplace(), grid, kernel=kernel, stencil_dedupe=True
    )
    assert jnp.allclose(L_fast, L_ref, rtol=1e-9, atol=1e-11)
    assert jnp.allclose(E_fast, E_ref, rtol=1e-9, atol=1e-11)


def test_dedupe_matches_per_point_path_2d():
    grid2 = mesh.RectangularMesh.from_bbox_2d(
        [[0.0, 1.0], [0.0, 1.0]], nums=(7, 7)
    )
    kernel = kernels.SquareExponential(input_scale=2.0)
    L_ref, E_ref = discretize.fd_probabilistic(
        diffops.laplace(), grid2, kernel=kernel,
        stencil_size_interior=5, stencil_size_boundary=5, stencil_dedupe=False,
    )
    L_fast, E_fast = discretize.fd_probabilistic(
        diffops.laplace(), grid2, kernel=kernel,
        stencil_size_interior=5, stencil_size_boundary=5, stencil_dedupe=True,
    )
    assert jnp.allclose(L_fast, L_ref, rtol=1e-9, atol=1e-11)
    assert jnp.allclose(E_fast, E_ref, rtol=1e-9, atol=1e-11)


def test_auto_dedupe_follows_stationarity(grid):
    # stationary: SquareExponential -> dedupe kicks in and must agree
    se = kernels.SquareExponential(input_scale=2.0)
    L_auto, _ = discretize.fd_probabilistic(diffops.laplace(), grid, kernel=se)
    L_off, _ = discretize.fd_probabilistic(
        diffops.laplace(), grid, kernel=se, stencil_dedupe=False
    )
    assert jnp.allclose(L_auto, L_off, rtol=1e-9, atol=1e-11)

    # non-stationary: Polynomial must NOT be deduped (auto falls back)
    poly = kernels.Polynomial(order=2, const=1.0)
    assert not getattr(poly, "stationary", False)
    L_poly_auto, _ = discretize.fd_probabilistic(
        diffops.laplace(), grid, kernel=poly
    )
    L_poly_off, _ = discretize.fd_probabilistic(
        diffops.laplace(), grid, kernel=poly, stencil_dedupe=False
    )
    assert jnp.allclose(L_poly_auto, L_poly_off, rtol=1e-12, atol=1e-14)


def test_kernel_sum_stationarity_propagates():
    s = kernels.SquareExponential() + kernels.WhiteNoise()
    assert s.stationary
    mixed = kernels.SquareExponential() + kernels.Polynomial()
    assert not mixed.stationary


def test_dx_adapted_scale_is_f32_safe():
    """At scale = t/dx (t ~ 0.1) the stencil system stays well conditioned at
    ANY resolution, so the weights survive float32; with a *fixed* input
    scale the conditioning blows up like dx^-4 and f32 weights are garbage.

    Kernel-FD weights at effective scale t are (1 + O(t^2)) x classical with
    a row-sum defect O(t^4)/dx^2 — quantified by E, which is the PNMOL
    contract (the discretization error enters the solver as noise).
    """
    num = 2048
    grid = mesh.RectangularMesh.from_bbox_1d([0.0, 1.0], num=num)
    dx = 1.0 / (num - 1)
    t = 0.1
    scale = discretize.dx_adapted_input_scale(grid, target=t)
    assert scale == pytest.approx(t / dx, rel=1e-6)
    kernel = kernels.SquareExponential(input_scale=scale)
    L, E = discretize.fd_probabilistic(diffops.laplace(), grid, kernel=kernel)
    row = L[num // 2, num // 2 - 1 : num // 2 + 2] * dx**2
    # (1 + O(t^2)) x classical second-difference stencil
    assert jnp.allclose(row, jnp.asarray([1.0, -2.0, 1.0]), rtol=3.0 * t**2)
    # the dedupe means O(1) distinct rows: all interior rows identical
    mid = np.asarray(L[num // 2, num // 2 - 1 : num // 2 + 2])
    other = np.asarray(L[num // 3, num // 3 - 1 : num // 3 + 2])
    np.testing.assert_allclose(mid, other, rtol=1e-12)
    # E quantifies the discretization defect: Lu - laplace(u) stays within
    # a few sqrt(E) for a smooth test function
    x = grid.points[:, 0]
    defect = jnp.abs(L @ (x**2) - 2.0)
    bound = 5.0 * jnp.sqrt(jnp.diag(E)) + 1e-6
    assert bool(jnp.all(defect[3:-3] <= bound[3:-3]))

    # f32 conditioning probe: solving the (deduped) stencil system in f32
    # agrees with f64 at the adapted scale, and the fixed-scale-1 system is
    # numerically singular in f32 (the round-1 failure mode).
    X = np.array([[-dx], [0.0], [dx]])

    def gram(s, dtype):
        d2 = (X - X.T) ** 2
        return np.exp(-0.5 * s**2 * d2).astype(dtype)

    cond_adapted = np.linalg.cond(gram(scale, np.float64))
    assert cond_adapted < 1e6
    w64 = np.linalg.solve(gram(scale, np.float64), np.array([1.0, -2.0, 1.0]))
    w32 = np.linalg.solve(
        gram(scale, np.float32), np.array([1.0, -2.0, 1.0], np.float32)
    )
    np.testing.assert_allclose(w32, w64, rtol=1e-2)
    # fixed scale 1: conditioning ~ dx^-4 is far beyond f32 (eps 6e-8), and
    # the f32 solve no longer resembles the true weights
    assert np.linalg.cond(gram(1.0, np.float64)) > 1e12
    w64_fixed = np.linalg.solve(gram(1.0, np.float64), np.array([1.0, -2.0, 1.0]))
    w32_fixed = np.linalg.solve(
        gram(1.0, np.float32), np.array([1.0, -2.0, 1.0], np.float32)
    )
    relerr = np.abs(w32_fixed - w64_fixed) / np.abs(w64_fixed)
    assert relerr.max() > 0.5
