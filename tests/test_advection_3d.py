"""3-D meshes and the advection-diffusion model family (BASELINE.md scale
configs: 2-D diffusion N=1e4, 3-D advection-diffusion N=1e5 — here exercised
at test sizes; docs/SCALE.md carries the measured large-N runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnmol_tpu import diffops, kernels, mesh, white
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step

PRIOR = kernels.Matern52() + kernels.WhiteNoise()


def test_from_bbox_3d_grid_and_boundary():
    grid = mesh.RectangularMesh.from_bbox_3d(
        [[0.0, 1.0], [0.0, 2.0], [0.0, 1.0]], nums=(4, 5, 3)
    )
    assert grid.points.shape == (60, 3)
    assert grid.dimension == 3
    _, boundary_mask, _ = grid.boundary
    # interior of a 4x5x3 grid: (4-2)*(5-2)*(3-2) = 6 points
    assert int((~np.asarray(boundary_mask)).sum()) == 6
    # neighbor query returns self first on a tensor grid
    pts, idx = grid.neighbours(grid.points[31], num=7)
    assert idx[0] == 31


def test_directional_derivative_values():
    v = jnp.asarray([2.0, -1.0])
    op = diffops.directional_derivative(v)
    fun = lambda x: jnp.linalg.norm(x) ** 2  # grad = 2x
    x0 = jnp.asarray([1.0, 3.0])
    assert jnp.allclose(op(fun)(x0), jnp.dot(v, 2 * x0))


def test_advection_diffusion_2d_solves_and_transports():
    pde = examples.advection_diffusion_discretized(
        dim=2, num_points=(10, 10), tmax=0.1,
        velocity=[1.0, 0.0], diffusion_rate=0.02,
    )
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Constant(dt=0.01), spatial_kernel=PRIOR
    )
    sol = solver.solve(pde)
    u = sol.mean[:, 0, :]
    assert not jnp.any(jnp.isnan(u))
    # transport check: the +x velocity moves mass downstream — the center of
    # mass along x increases
    x = pde.mesh_spatial.points[:, 0]
    com0 = jnp.sum(x * u[0]) / jnp.sum(u[0])
    comT = jnp.sum(x * u[-1]) / jnp.sum(u[-1])
    assert float(comT) > float(com0) + 1e-3


def test_advection_diffusion_3d_final_state():
    pde = examples.advection_diffusion_discretized(
        dim=3, num_points=(6, 6, 6), tmax=0.05,
        velocity=[1.0, 0.5, 0.0], diffusion_rate=0.05,
    )
    assert pde.L.shape == (216, 216)
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Constant(dt=0.01), spatial_kernel=PRIOR
    )
    final, info = solver.simulate_final_state(pde)
    assert not jnp.any(jnp.isnan(final.y.mean))
    assert jnp.isclose(final.t, pde.tmax)
