"""n-D Neumann boundaries via directional kernel FD (beyond the reference,
whose Neumann operator is 1-D-only: /root/reference/src/pnmol/pde/mixins.py:41-49)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnmol_tpu import discretize, kernels, mesh, white
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step

PRIOR = kernels.Matern52() + kernels.WhiteNoise()


def test_boundary_normals_2d():
    grid = mesh.RectangularMesh.from_bbox_2d([[0.0, 1.0], [0.0, 1.0]], nums=(5, 5))
    normals = np.asarray(grid.boundary_normals)
    pts = np.asarray(grid.boundary[0])
    # unit length everywhere
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, rtol=1e-12)
    # a face point: x = 0, y interior -> normal (-1, 0)
    i = np.nonzero((pts[:, 0] == 0.0) & (pts[:, 1] == 0.5))[0][0]
    np.testing.assert_allclose(normals[i], [-1.0, 0.0])
    # a corner: (1, 1) -> diagonal
    j = np.nonzero((pts[:, 0] == 1.0) & (pts[:, 1] == 1.0))[0][0]
    np.testing.assert_allclose(normals[j], [1 / np.sqrt(2)] * 2)


def test_neumann_nd_recovers_normal_derivative():
    """B u approximates du/dn for a smooth field on a 2-D grid."""
    num = 21
    grid = mesh.RectangularMesh.from_bbox_2d([[0.0, 1.0], [0.0, 1.0]], nums=(num, num))
    dx = 1.0 / (num - 1)
    # stencil_size 9: the first ~5 nearest neighbors of a face point lie
    # along the boundary, so smaller stencils cannot isolate the normal
    # direction (measured: err 0.17 at s=5 vs 0.01 at s=9, with the kernel-FD
    # uncertainty tracking it, 0.035 vs 0.002)
    kernel = kernels.SquareExponential(input_scale=0.05 / dx)
    B, R = discretize.fd_probabilistic_neumann(
        grid, kernel=kernel, stencil_size=9, nugget_gram_matrix=1e-12
    )
    x = grid.points[:, 0]
    y = grid.points[:, 1]
    u = x**2 + 2.0 * y**2
    du_dn = B @ u

    pts = np.asarray(grid.boundary[0])
    normals = np.asarray(grid.boundary_normals)
    # exact outward normal derivative: n . (2x, 4y)
    exact = normals[:, 0] * 2 * pts[:, 0] + normals[:, 1] * 4 * pts[:, 1]
    face = np.linalg.norm(normals, ord=np.inf, axis=1) == 1.0  # skip corners
    np.testing.assert_allclose(
        np.asarray(du_dn)[face], exact[face], atol=0.05
    )
    # uncertainties are nonnegative and bounded
    assert float(jnp.min(jnp.diag(R))) >= -1e-10


def test_system_2d_neumann_solves():
    """A 2-species reaction-diffusion SYSTEM on a 2-D Neumann mesh (the
    system discretization path is dimension-generic now)."""
    import jax

    from pnmol_tpu import diffops
    from pnmol_tpu.models import problems

    def y0_fun(x):
        bump = jnp.exp(-20.0 * jnp.sum((x - 0.5) ** 2, axis=-1))
        prey = 5.0 * jnp.ones(x.shape[0])
        predator = 20.0 * bump
        return jnp.concatenate((prey, predator))

    @jax.jit
    def f(_, z):
        u, v = jnp.split(z, 2)
        return jnp.concatenate((0.5 * u - 0.05 * u * v, 0.05 * u * v - 0.5 * v))

    lap = diffops.laplace()
    pde = problems.SystemSemiLinearEvolutionNeumann(
        diffop=(lap, lap),
        diffop_scale=(0.1, 0.1),
        bbox=jnp.asarray([[0.0, 1.0], [0.0, 1.0]]),
        t0=0.0,
        tmax=0.2,
        y0_fun=y0_fun,
        f=f,
        df=jax.jit(jax.jacfwd(f, argnums=1)),
        df_diagonal=None,
    )
    num = 8
    dx = 1.0 / (num - 1)
    pde.discretize_system(
        mesh_spatial=mesh.RectangularMesh.from_bbox_2d(
            [[0.0, 1.0], [0.0, 1.0]], nums=(num, num)
        ),
        kernel=kernels.SquareExponential(input_scale=0.1 / dx),
        stencil_size_interior=9,
        stencil_size_boundary=9,
        nugget_gram_matrix=1e-12,
    )
    d = num * num
    assert pde.L.shape == (2 * d, 2 * d)
    assert pde.B.shape[0] == 2 * (4 * num - 4)

    solver = white.SemiLinearWhiteNoiseEK1(
        steprule=step.Constant(dt=0.02),
        spatial_kernel=kernels.duplicate(PRIOR, num=2),
    )
    final, info = solver.simulate_final_state(pde)
    assert not jnp.any(jnp.isnan(final.y.mean))
    u, v = jnp.split(final.y.mean[0], 2)
    # prey grows on average (predators are localized) and stays positive;
    # the predator bump diffuses outward (its max drops)
    assert float(jnp.mean(u)) > 5.0
    assert float(jnp.min(u)) > 0.0
    v0 = y0_fun(pde.mesh_spatial.points)[d:]
    assert float(jnp.max(v)) < float(jnp.max(v0))


def test_neumann_nd_matern52_is_nan_patched():
    """Matern52 autodiffs to NaN at zero distance; the n-D Neumann operator
    must apply the removable-singularity patch like fd_coefficients does."""
    grid = mesh.RectangularMesh.from_bbox_2d([[0.0, 1.0], [0.0, 1.0]], nums=(7, 7))
    B, R = discretize.fd_probabilistic_neumann(
        grid, kernel=kernels.Matern52(input_scale=5.0), stencil_size=9,
        nugget_gram_matrix=1e-12,
    )
    assert not bool(jnp.any(jnp.isnan(B)))
    assert not bool(jnp.any(jnp.isnan(R)))


def test_boundary_classification_survives_f32_policy():
    """Under PNMOL_TPU_X32 the device bbox is f32; classification must use
    the f64 host copy or faces at non-f32-representable bounds (0.1, 0.3)
    silently lose their boundary points (and their boundary conditions)."""
    import subprocess
    import sys

    code = """
import os, jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from pnmol_tpu import mesh
g1 = mesh.RectangularMesh.from_bbox_1d([0.0, 0.1], num=5)
assert int(np.asarray(g1.boundary[1]).sum()) == 2, np.asarray(g1.boundary[1])
g2 = mesh.RectangularMesh.from_bbox_2d([[0.0, 1.0], [0.0, 0.3]], nums=(5, 5))
assert int(np.asarray(g2.boundary[1]).sum()) == 16, np.asarray(g2.boundary[1]).sum()
normals = np.asarray(g2.boundary_normals)
assert np.all(np.linalg.norm(normals, axis=1) > 0.99)
print("OK")
"""
    env = dict(__import__("os").environ, PNMOL_TPU_X32="1")
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


def test_constant_schedule_keeps_real_remainder_steps():
    """Only roundoff slivers are merged; a genuine remainder (0.1 for
    dt=0.3) must stay its own step — merging it would overshoot the
    requested dt by up to 50%."""
    from pnmol_tpu.solvers.pdefilter import constant_step_schedule

    ts, dts = constant_step_schedule(0.0, 1.0, 0.3)
    assert len(dts) == 4
    np.testing.assert_allclose(dts, [0.3, 0.3, 0.3, 0.1], atol=1e-12)
    assert ts[-1] + dts[-1] == pytest.approx(1.0, abs=1e-12)


def test_heat_2d_neumann_solves_and_conserves_mass():
    num = 12
    dx = 1.0 / (num - 1)
    pde = examples.heat_2d_discretized(
        num_points=(num, num), tmax=0.5, bcond="neumann",
        # quality discretization: 9-point stencils (see the recovery test)
        # and a dx-adapted kernel scale
        kernel=kernels.SquareExponential(input_scale=0.05 / dx),
        stencil_size_interior=9, stencil_size_boundary=9,
    )
    assert pde.B.shape[0] == 44  # boundary of a 12x12 grid
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Constant(dt=0.05), spatial_kernel=PRIOR
    )
    sol = solver.solve(pde)
    u = sol.mean[:, 0, :]
    assert not jnp.any(jnp.isnan(u))
    # no-flux boundaries approximately conserve the spatial mean while the
    # profile flattens
    mean0 = float(jnp.mean(u[0]))
    meanT = float(jnp.mean(u[-1]))
    assert meanT == pytest.approx(mean0, rel=0.2)
    assert float(jnp.std(u[-1])) < float(jnp.std(u[0]))
