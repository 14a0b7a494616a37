"""float32 numerical health of the solvers (the TPU MXU precision path).

The bench and TPU deployments run the step loop in f32; these tests pin down
that the sqrt-filter stays finite and accurate enough in single precision.
"""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.solvers import white


@pytest.fixture
def f32_mode():
    jax.config.update("jax_enable_x64", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", True)


def test_white_step_f32_stays_finite_and_tracks_f64():
    # f64 reference trajectory
    heat = examples.heat_1d_discretized(dx=0.1, tmax=1.0)
    solver = white.LinearWhiteNoiseEK1(steprule=step.Constant(0.05))
    state = solver.initialize(heat)
    cache64 = solver._cache

    cache32 = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), cache64)
    step32 = white.make_white_step_fn(
        cache=cache32, num_derivatives=2, f=None, df=None, linear=True
    )

    mean64, cov64 = state.y.mean, state.y.cov_sqrtm
    mean32 = mean64.astype(jnp.float32)
    cov32 = cov64.astype(jnp.float32)
    for k in range(20):
        t_next = jnp.asarray(0.05 * (k + 1))
        mean64, cov64, *_ = solver._step_fn(mean64, cov64, t_next, jnp.asarray(0.05))
        mean32, cov32, *_ = step32(
            mean32, cov32, t_next.astype(jnp.float32), jnp.asarray(0.05, jnp.float32)
        )
    assert bool(jnp.all(jnp.isfinite(mean32)))
    assert bool(jnp.all(jnp.isfinite(cov32)))
    rel = jnp.linalg.norm(mean32.astype(jnp.float64) - mean64) / jnp.linalg.norm(mean64)
    assert float(rel) < 1e-4


def test_latent_step_f32_stays_finite():
    from pnmol_tpu.solvers import latent as latent_module

    heat = examples.heat_1d_discretized(dx=0.1, tmax=1.0)
    solver = latent_module.LinearLatentForceEK1(steprule=step.Constant(0.05))
    state = solver.initialize(heat)
    cache32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), solver._cache
    )
    step32 = latent_module.make_latent_step_fn(
        cache=cache32, num_derivatives=2, f=None, df=None, linear=True
    )
    mean = state.y.mean.astype(jnp.float32)
    cov = state.y.cov_sqrtm.astype(jnp.float32)
    for k in range(10):
        mean, cov, *_ = step32(
            mean, cov, jnp.asarray(0.05 * (k + 1), jnp.float32),
            jnp.asarray(0.05, jnp.float32),
        )
    assert bool(jnp.all(jnp.isfinite(mean)))
    assert bool(jnp.all(jnp.isfinite(cov)))


def test_solve_under_x32_mode(f32_mode):
    """Whole pipeline (discretize + init + solve) in f32 default dtype."""
    heat = examples.heat_1d_discretized(dx=0.2, tmax=0.4)
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Constant(0.1),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    sol = solver.solve(heat)
    assert sol.mean.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(sol.mean)))
    assert bool(jnp.all(jnp.isfinite(sol.cov_sqrtm)))


def test_fine_dx_pipeline_under_x32_mode(f32_mode):
    """The bench/TPU configuration at fine dx: dx-adapted FD scale, stencil
    dedupe, structured init, f32 stepping — and the solution is physical
    (heat decays, no NaNs). This is the pipeline the scale table measures."""
    N = 512
    dx = 1.0 / (N - 1)
    heat = examples.heat_1d_discretized(
        dx=dx, tmax=0.05,
        kernel=kernels.SquareExponential(input_scale=0.1 / dx),
    )
    assert heat.L.dtype == jnp.float32
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Constant(0.005),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    final, _ = solver.simulate_final_state(heat)
    assert final.y.mean.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(final.y.mean)))
    assert bool(jnp.all(jnp.isfinite(final.y.cov_sqrtm)))
    u0 = heat.y0
    assert float(jnp.abs(final.y.mean[0]).max()) <= float(jnp.abs(u0).max()) * 1.01
