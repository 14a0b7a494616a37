"""Golden-trajectory regression: solver outputs must not drift across changes.

The stored trajectories were produced by the dense-oracle-verified build
(see tests/test_solvers/test_*_oracle.py); any future refactor of the step
kernels, drivers, or discretization must reproduce them to near machine
precision. Regenerate deliberately (see the command in the .npz header
directory) only when a semantic change is intended and documented.
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from pnmol_tpu import kernels, white, latent
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step

GOLDEN = pathlib.Path(__file__).parent / "golden" / "heat_trajectories.npz"
PRIOR = kernels.Matern52() + kernels.WhiteNoise()


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN) as data:
        return {k: jnp.asarray(data[k]) for k in data.files}


@pytest.fixture(scope="module")
def heat():
    return examples.heat_1d_discretized(dx=0.2, tmax=0.5)


def test_white_trajectory_matches_golden(golden, heat):
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Constant(0.1), spatial_kernel=PRIOR
    )
    sol = solver.solve(heat)
    assert jnp.allclose(sol.mean, golden["white_mean"], rtol=1e-10, atol=1e-13)
    assert jnp.allclose(
        sol.diffusion_squared_calibrated, golden["white_diffusion"], rtol=1e-10
    )
    std = jnp.sqrt(jnp.einsum("ij,ij->i", sol.cov_sqrtm[-1], sol.cov_sqrtm[-1]))
    assert jnp.allclose(std, golden["white_final_std"], rtol=1e-8, atol=1e-12)


def test_latent_trajectory_matches_golden(golden, heat):
    solver = latent.LinearLatentForceEK1(
        steprule=step.Constant(0.1), spatial_kernel=PRIOR
    )
    sol = solver.solve(heat)
    assert jnp.allclose(sol.mean, golden["latent_mean"], rtol=1e-10, atol=1e-13)
    assert jnp.allclose(
        sol.diffusion_squared_calibrated, golden["latent_diffusion"], rtol=1e-10
    )
