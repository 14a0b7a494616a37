"""2-D Fisher-KPP: semilinear reaction-diffusion beyond the reference's
1-D semilinear zoo (``/root/reference/src/pnmol/pde/examples.py`` has only
1-D recipes). Drives the n-D discretization path with the pointwise
logistic nonlinearity through the semilinear EK1 solver."""

import jax.numpy as jnp
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.solvers import white


@pytest.fixture(scope="module")
def fkpp2d():
    # growth-dominated configuration: logistic rate 3 beats the slowest
    # diffusive decay mode (diffusion * 2 pi^2 = 0.2) so the front grows
    return examples.fisher_kpp_2d_discretized(
        num_points=(8, 8), tmax=0.5, diffusion_rate=0.01, growth_rate=3.0
    )


def test_discretization_fkpp_2d(fkpp2d):
    N = 64
    assert fkpp2d.L.shape == (N, N)
    assert fkpp2d.y0.shape == (N,)
    assert not jnp.any(jnp.isnan(fkpp2d.L))
    # the semilinear pieces exist and are pointwise
    u = fkpp2d.y0
    fu = fkpp2d.f(0.0, u)
    assert fu.shape == u.shape
    # logistic: f(0) = 0, f(1) = 0, f(1/2) = growth/4
    z = jnp.zeros_like(u)
    assert float(jnp.max(jnp.abs(fkpp2d.f(0.0, z)))) == 0.0


def test_solve_fkpp_2d(fkpp2d):
    solver = white.SemiLinearWhiteNoiseEK1(
        steprule=step.Constant(dt=0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    sol = solver.solve(fkpp2d)
    assert not jnp.any(jnp.isnan(sol.mean))
    assert not jnp.any(jnp.isnan(sol.cov_sqrtm))
    u0 = sol.mean[0, 0]
    uT = sol.mean[-1, 0]
    # logistic growth pushes the interior of the bump toward the u=1
    # carrying capacity faster than diffusion drains it at this rate
    assert float(jnp.max(uT)) > float(jnp.max(u0))
    assert float(jnp.max(uT)) <= 1.05  # bounded by carrying capacity


def test_fkpp_neumann_variant():
    pde = examples.fisher_kpp_2d_discretized(
        num_points=(6, 6), tmax=0.2, bcond="neumann"
    )
    assert not jnp.any(jnp.isnan(pde.L))
    solver = white.SemiLinearWhiteNoiseEK1(
        steprule=step.Constant(dt=0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    sol = solver.solve(pde)
    assert not jnp.any(jnp.isnan(sol.mean))
