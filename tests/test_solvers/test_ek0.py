"""EK0 measurement models (zero-Jacobian linearization).

The BASELINE north star names "the square-root EK0/EK1 PDE filter"; the
reference ships only EK1 measurement models
(``/root/reference/src/pnmol/white.py:189-208``). EK0 keeps the innovation
MEAN (``z = u' - L u - f(u_pred)``) but drops the Jacobian from the
measurement operator, so the covariance/gain are those of the linear part
— the classical EK0/EK1 trade of ODE filters, and ``df`` is never needed.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.solvers import latent, white


@pytest.fixture(scope="module")
def budworm():
    return examples.spruce_budworm_1d_discretized(dx=0.2, tmax=1.0)


def _mk(cls, **kw):
    return cls(
        steprule=step.Constant(dt=0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        **kw,
    )


def test_ek0_equals_ek1_when_f_is_linear(budworm):
    """With a zero nonlinearity the Jacobian is zero, so EK0 and EK1 are
    the same map — pinned at the step-kernel level, exactly."""
    solver = _mk(white.SemiLinearWhiteNoiseEK1)
    state = solver.initialize(budworm)
    cache = solver._cache
    mean, cov = state.y.mean, state.y.cov_sqrtm
    dt = jnp.asarray(0.05, mean.dtype)

    def f0(t, u):
        return jnp.zeros_like(u)

    def df0(t, u):
        return jnp.zeros((u.shape[0], u.shape[0]), dtype=u.dtype)

    out1 = white.white_attempt_step(
        cache, mean, cov, dt, dt, num_derivatives=solver.num_derivatives,
        f=f0, df=df0, linear=False, fused=True, ek_order=1,
    )
    out0 = white.white_attempt_step(
        cache, mean, cov, dt, dt, num_derivatives=solver.num_derivatives,
        f=f0, df=None, linear=False, fused=True, ek_order=0,
    )
    for a, b in zip(out0, out1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ek0_white_solves_spruce_budworm(budworm):
    sol0 = _mk(white.SemiLinearWhiteNoiseEK0).solve(budworm)
    sol1 = _mk(white.SemiLinearWhiteNoiseEK1).solve(budworm)
    u0 = np.asarray(sol0.mean[:, 0, :])
    u1 = np.asarray(sol1.mean[:, 0, :])
    assert not np.any(np.isnan(u0))
    # different measurement models, same ODE: trajectories agree to the
    # linearization error, differ beyond roundoff
    np.testing.assert_allclose(u0[-1], u1[-1], rtol=2e-2, atol=1e-4)
    assert np.max(np.abs(u0[-1] - u1[-1])) > 1e-12


def test_ek0_latent_solves_spruce_budworm(budworm):
    sol0 = _mk(latent.SemiLinearLatentForceEK0).solve(budworm)
    u0 = np.asarray(sol0.mean[:, 0, :])
    assert not np.any(np.isnan(u0))
    d = budworm.L.shape[0]
    assert sol0.mean.shape[-1] == 2 * d  # stacked [state | latent]


def test_ek0_exports():
    import pnmol_tpu

    assert pnmol_tpu.white.SemiLinearWhiteNoiseEK0 is (
        white.SemiLinearWhiteNoiseEK0
    )
    assert pnmol_tpu.latent.SemiLinearLatentForceEK0 is (
        latent.SemiLinearLatentForceEK0
    )
