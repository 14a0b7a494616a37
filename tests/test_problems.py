"""PDE problem layer: discretization products, BC padding, IVP conversion."""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples


@pytest.fixture
def heat_dirichlet():
    return examples.heat_1d_discretized(dx=0.2, bcond="dirichlet")


@pytest.fixture
def heat_neumann():
    return examples.heat_1d_discretized(dx=0.2, bcond="neumann")


@pytest.fixture
def sir():
    return examples.sir_1d_discretized(dx=0.25)


def test_discretization_products(heat_dirichlet):
    pde = heat_dirichlet
    N = len(pde.mesh_spatial)
    assert pde.is_discretized
    assert pde.L.shape == (N, N)
    assert pde.E_sqrtm.shape == (N, N)
    assert pde.y0.shape == (N,)
    assert pde.B.shape == (2, N)
    assert jnp.allclose(pde.R_sqrtm, 0.0)  # Dirichlet: zero meas noise


def test_neumann_products(heat_neumann):
    pde = heat_neumann
    N = len(pde.mesh_spatial)
    assert pde.B.shape == (2, N)
    assert pde.R_sqrtm.shape == (2, 2)


def test_system_discretization_is_blockdiag(sir):
    """System discretization equals block-diag of per-species discretizations."""
    N = len(sir.mesh_spatial)
    assert sir.L.shape == (3 * N, 3 * N)
    # identical species diffusion -> identical diagonal blocks, zero off-blocks
    block = sir.L[:N, :N]
    assert jnp.allclose(sir.L[N : 2 * N, N : 2 * N], block)
    assert jnp.allclose(sir.L[:N, N:], 0.0)
    assert sir.B.shape == (6, 3 * N)
    assert sir.y0.shape == (3 * N,)


def test_bc_padding_roundtrip(heat_dirichlet, heat_neumann):
    x = jnp.arange(1.0, 4.0)
    padded_d = heat_dirichlet.bc_pad(x)
    assert jnp.allclose(padded_d, jnp.array([0.0, 1.0, 2.0, 3.0, 0.0]))
    assert jnp.allclose(heat_dirichlet.bc_remove_pad(padded_d), x)

    padded_n = heat_neumann.bc_pad(x)
    assert jnp.allclose(padded_n, jnp.array([1.0, 1.0, 2.0, 3.0, 3.0]))
    assert jnp.allclose(heat_neumann.bc_remove_pad(padded_n), x)


def test_system_bc_padding(sir):
    N = len(sir.mesh_spatial)
    x = jnp.arange(float(3 * (N - 2)))
    padded = sir.bc_pad(x)
    assert padded.shape == (3 * N,)
    assert jnp.allclose(sir.bc_remove_pad(padded), x)


def test_to_ivp_linear(heat_dirichlet):
    """IVP conversion: Jacobian constant and f linear in y."""
    ivp = heat_dirichlet.to_ivp()
    N_int = len(heat_dirichlet.mesh_spatial) - 2
    assert ivp.y0.shape == (N_int,)
    J0 = ivp.df(ivp.t0, ivp.y0)
    J1 = ivp.df(ivp.t0 + 1.0, ivp.y0 + 1.0)
    assert jnp.allclose(J0, J1)  # constant Jacobian
    # linearity: f(y) = J y
    y = jax.random.normal(jax.random.PRNGKey(0), (N_int,))
    assert jnp.allclose(ivp.f(0.0, y), J0 @ y, atol=1e-10)


def test_to_ivp_semilinear(sir):
    ivp = sir.to_ivp()
    N_int = len(sir.mesh_spatial) - 2
    assert ivp.y0.shape == (3 * N_int,)
    out = ivp.f(0.0, ivp.y0)
    assert out.shape == ivp.y0.shape
    assert not jnp.any(jnp.isnan(out))
    J = ivp.df(0.0, ivp.y0)
    assert J.shape == (3 * N_int, 3 * N_int)


def test_to_tornadox_ivp_alias(heat_dirichlet):
    ivp = heat_dirichlet.to_tornadox_ivp()
    assert ivp.t0 == heat_dirichlet.t0


def test_ivp_conversion_requires_discretization():
    pde = examples.heat_1d()
    with pytest.raises(AttributeError):
        pde.to_ivp()


def test_collocation_discretization_scheme():
    """scheme='collocation' produces a dense L and a full E factor, and the
    resulting problem solves end-to-end."""
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white as white_module

    pde = examples.heat_1d(t0=0.0, tmax=0.3)
    from pnmol_tpu import mesh as mesh_module

    pde.discretize(
        mesh_spatial=mesh_module.RectangularMesh.from_bbox_1d(pde.bbox, step=0.2),
        kernel=kernels.SquareExponential(input_scale=2.0),
        stencil_size_interior=3,
        stencil_size_boundary=3,
        scheme="collocation",
    )
    N = len(pde.mesh_spatial)
    assert pde.L.shape == (N, N)
    # dense: off-stencil entries populated
    assert float(jnp.abs(pde.L[0, -1])) > 0.0
    solver = white_module.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(0.1),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    sol = solver.solve(pde)
    assert not jnp.any(jnp.isnan(sol.mean))


def test_lotka_volterra_recipe():
    lv = examples.lotka_volterra_1d_discretized(dx=0.25)
    N = len(lv.mesh_spatial)
    assert lv.L.shape == (2 * N, 2 * N)
    assert lv.y0.shape == (2 * N,)


def test_spruce_recipe_bconds():
    for bcond in ("dirichlet", "neumann"):
        sp = examples.spruce_budworm_1d_discretized(dx=0.25, bcond=bcond)
        assert sp.is_discretized
        fx = sp.f(0.0, sp.y0)
        assert fx.shape == sp.y0.shape
