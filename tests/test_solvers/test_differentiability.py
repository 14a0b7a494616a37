"""End-to-end differentiability of the scan solver core (beyond the reference).

The step kernel is a pure jax function of its cache (QR, triangular solves,
matmuls — all with defined VJPs), so whole solves differentiate w.r.t.
problem/prior parameters. This enables gradient-based calibration of e.g.
kernel scales in place of the reference's grid-search MLE.
"""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.solvers import white


@pytest.fixture(scope="module")
def setup():
    heat = examples.heat_1d_discretized(dx=0.2, tmax=0.5)
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Constant(0.1),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)
    return heat, solver, state


def _rollout(cache, mean, cov, num_steps=5, dt=0.1):
    step_fn = white.make_white_step_fn(
        cache=cache, num_derivatives=2, f=None, df=None, linear=True
    )

    def body(carry, t_next):
        m, c = carry
        m, c, _, _, diff = step_fn(m, c, t_next, jnp.asarray(dt))
        return (m, c), diff

    ts = dt * jnp.arange(1, num_steps + 1)
    (m, c), diffs = jax.lax.scan(body, (mean, cov), ts)
    return m, c, diffs


def test_grad_through_solve_wrt_diffusion_scale(setup):
    """d(final solution)/d(diffusion rate) exists and matches finite differences."""
    heat, solver, state = setup
    base_L = heat.L / heat.diffop_scale  # unit-scale differentiation matrix

    def loss(scale):
        cache = solver._cache._replace(L=scale * base_L)
        m, _, _ = _rollout(cache, state.y.mean, state.y.cov_sqrtm)
        return jnp.sum(m[0] ** 2)

    g = jax.grad(loss)(0.035)
    assert jnp.isfinite(g)

    eps = 1e-6
    fd = (loss(0.035 + eps) - loss(0.035 - eps)) / (2 * eps)
    assert jnp.allclose(g, fd, rtol=1e-4)


def test_grad_through_calibration_wrt_error_factor(setup):
    """The diffusion quasi-MLE is differentiable w.r.t. the measurement noise."""
    heat, solver, state = setup

    def loss(noise_scale):
        cache = solver._cache._replace(
            E_bc_sqrtm=noise_scale * solver._cache.E_bc_sqrtm
            + 1e-8 * jnp.eye(solver._cache.E_bc_sqrtm.shape[0])
        )
        _, _, diffs = _rollout(cache, state.y.mean, state.y.cov_sqrtm)
        return jnp.mean(diffs)

    g = jax.grad(loss)(1.0)
    assert jnp.isfinite(g)
    # more assumed measurement noise -> smaller whitened residuals
    assert float(g) < 0.0
