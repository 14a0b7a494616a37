"""2-D heat: discretization and end-to-end solve (beyond the reference's 1-D zoo)."""

import jax.numpy as jnp
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.solvers import white


@pytest.fixture(scope="module")
def heat2d():
    return examples.heat_2d_discretized(num_points=(8, 8), tmax=0.4)


def test_discretization_2d(heat2d):
    N = 64
    assert heat2d.L.shape == (N, N)
    assert heat2d.y0.shape == (N,)
    assert not jnp.any(jnp.isnan(heat2d.L))
    # boundary of an 8x8 grid: 28 points
    assert heat2d.B.shape == (28, N)


def test_laplacian_quality_2d(heat2d):
    """L applied to the sin*sin bump approximates -2 pi^2 * bump (interior)."""
    pts = heat2d.mesh_spatial.points
    bump = jnp.sin(jnp.pi * pts[:, 0]) * jnp.sin(jnp.pi * pts[:, 1])
    lap = (heat2d.L / heat2d.diffop_scale) @ bump
    truth = -2.0 * jnp.pi**2 * bump
    _, interior_mask, _ = heat2d.mesh_spatial.interior
    rel = jnp.abs(lap - truth)[interior_mask] / jnp.abs(truth[interior_mask])
    assert float(jnp.median(rel)) < 0.2


def test_solve_2d(heat2d):
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Constant(dt=0.1),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    sol = solver.solve(heat2d)
    assert not jnp.any(jnp.isnan(sol.mean))
    assert not jnp.any(jnp.isnan(sol.cov_sqrtm))
    # heat decays
    assert float(jnp.max(sol.mean[-1, 0])) < float(jnp.max(sol.mean[0, 0]))
