"""End-to-end smoke matrix: every (solver x problem x BC) combination solves
without NaNs (mirrors the reference matrix, ``tests/test_pdefilter.py:141-146``),
plus driver-level behavior checks."""

import jax.numpy as jnp
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.solvers import latent, pdefilter, white

PRIOR = kernels.Matern52() + kernels.WhiteNoise()


def _heat(bcond):
    return examples.heat_1d_discretized(dx=0.2, tmax=0.4, bcond=bcond)


def _spruce(bcond):
    return examples.spruce_budworm_1d_discretized(dx=0.2, tmax=0.4, bcond=bcond)


CASES = [
    (white.LinearWhiteNoiseEK1, _heat, "dirichlet"),
    (white.LinearWhiteNoiseEK1, _heat, "neumann"),
    (white.SemiLinearWhiteNoiseEK1, _spruce, "dirichlet"),
    (white.SemiLinearWhiteNoiseEK1, _spruce, "neumann"),
    (latent.LinearLatentForceEK1, _heat, "dirichlet"),
    (latent.LinearLatentForceEK1, _heat, "neumann"),
    (latent.SemiLinearLatentForceEK1, _spruce, "dirichlet"),
    (latent.SemiLinearLatentForceEK1, _spruce, "neumann"),
]


@pytest.mark.parametrize(
    "solver_cls,problem_fn,bcond",
    CASES,
    ids=[f"{s.__name__}-{p.__name__.strip('_')}-{b}" for s, p, b in CASES],
)
def test_solve_no_nans(solver_cls, problem_fn, bcond):
    pde = problem_fn(bcond)
    solver = solver_cls(steprule=step.Constant(dt=0.1), spatial_kernel=PRIOR)
    sol = solver.solve(pde)
    assert not jnp.any(jnp.isnan(sol.mean))
    assert not jnp.any(jnp.isnan(sol.cov_sqrtm))
    assert sol.t.shape[0] == sol.mean.shape[0] == sol.cov_sqrtm.shape[0]
    assert float(sol.t[-1]) == pytest.approx(pde.tmax)


def test_system_solvers_no_nans():
    """PDE systems through the PNMOL solvers — the path the reference leaves
    known-broken (its system smoke tests are disabled with a 'solver
    concatenation breaks' note, ``tests/test_pdefilter.py:111-138``). This
    build supports it: block-diagonal spatial priors via ``duplicate``."""
    sir = examples.sir_1d_discretized(dx=0.25, tmax=0.3)
    k3 = kernels.duplicate(kernels.Matern52() + kernels.WhiteNoise(), num=3)
    solver = white.SemiLinearWhiteNoiseEK1(
        num_derivatives=1, steprule=step.Constant(dt=0.1), spatial_kernel=k3
    )
    sol = solver.solve(sir)
    assert not jnp.any(jnp.isnan(sol.mean))
    assert not jnp.any(jnp.isnan(sol.cov_sqrtm))

    lv = examples.lotka_volterra_1d_discretized(dx=0.25, tmax=0.3)
    k2 = kernels.duplicate(kernels.Matern52() + kernels.WhiteNoise(), num=2)
    solver_latent = latent.SemiLinearLatentForceEK1(
        num_derivatives=2, steprule=step.Constant(dt=0.1), spatial_kernel=k2
    )
    sol_latent = solver_latent.solve(lv)
    assert not jnp.any(jnp.isnan(sol_latent.mean))
    assert not jnp.any(jnp.isnan(sol_latent.cov_sqrtm))


def test_solution_generator_matches_scan_solve():
    """The jitted scan path and the Python generator path must agree."""
    pde = _heat("dirichlet")
    solver = white.LinearWhiteNoiseEK1(steprule=step.Constant(dt=0.1), spatial_kernel=PRIOR)
    sol = solver.solve(pde)
    states = list(solver.solution_generator(pde))
    gen_means = jnp.stack([s.y.mean for s, _ in states])
    assert jnp.allclose(sol.mean, gen_means, atol=1e-9)
    # info counters match
    _, info = states[-1]
    assert info["num_steps"] == sol.info["num_steps"]
    assert info["num_f_evaluations"] == sol.info["num_f_evaluations"]


def test_adaptive_final_state_consistent_with_generator():
    """while_loop adaptive driver equals the Python adaptive loop."""
    pde = _heat("dirichlet")

    def make():
        return white.LinearWhiteNoiseEK1(
            steprule=step.Adaptive(abstol=1e-3, reltol=1e-3), spatial_kernel=PRIOR
        )

    final_jit, info_jit = make()._final_state_adaptive_whileloop(pde)

    solver = make()
    states = list(solver.solution_generator(pde))
    final_gen, info_gen = states[-1]
    diffusions = jnp.stack([s.diffusion_squared_local for s, _ in states[1:]])
    calibrated = jnp.mean(diffusions)

    assert info_jit["num_steps"] == info_gen["num_steps"]
    assert info_jit["num_attempted_steps"] == info_gen["num_attempted_steps"]
    assert jnp.allclose(final_jit.t, final_gen.t)
    assert jnp.allclose(final_jit.y.mean, final_gen.y.mean, atol=1e-8)
    # jit path folds the calibrated diffusion into the cov factor
    assert jnp.allclose(
        final_jit.y.cov_sqrtm,
        final_gen.y.cov_sqrtm * jnp.sqrt(calibrated),
        atol=1e-8,
    )


def test_adaptive_jit_solve_matches_generator():
    """Opt-in bounded-buffer adaptive solve == Python generator trajectory."""
    pde = _heat("dirichlet")

    def make():
        return white.LinearWhiteNoiseEK1(
            steprule=step.Adaptive(abstol=1e-3, reltol=1e-3), spatial_kernel=PRIOR
        )

    sol_jit = make().solve(pde, max_steps=256)
    sol_gen = make().solve(pde)
    assert sol_jit.t.shape == sol_gen.t.shape
    assert jnp.allclose(sol_jit.t, sol_gen.t, atol=1e-12)
    assert jnp.allclose(sol_jit.mean, sol_gen.mean, atol=1e-9)
    assert jnp.allclose(
        sol_jit.diffusion_squared_calibrated,
        sol_gen.diffusion_squared_calibrated,
        rtol=1e-8,
    )
    assert sol_jit.info["num_steps"] == sol_gen.info["num_steps"]
    assert sol_jit.info["num_attempted_steps"] == sol_gen.info["num_attempted_steps"]

    with pytest.raises(RuntimeError):
        make().solve(pde, max_steps=2)


def test_latent_supports_adaptive_steps():
    """Beyond the reference: the latent solvers carry an H Q H^T error
    estimate, so Adaptive step rules work (the reference caps them at
    constant steps, latent.py:218-219)."""
    pde = _heat("dirichlet")
    solver = latent.LinearLatentForceEK1(
        steprule=step.Adaptive(abstol=1e-3, reltol=1e-3), spatial_kernel=PRIOR
    )
    assert solver.supports_adaptive_steps
    final, info = solver.simulate_final_state(pde)
    assert jnp.isclose(final.t, pde.tmax)
    assert not jnp.any(jnp.isnan(final.y.mean))
    assert info["num_steps"] >= 1
    assert info["num_attempted_steps"] >= info["num_steps"]

    # accuracy sanity: adaptive trajectory close to a fine constant solve
    fine = latent.LinearLatentForceEK1(
        steprule=step.Constant(dt=0.01), spatial_kernel=PRIOR
    )
    final_fine, _ = fine.simulate_final_state(pde)
    d = pde.L.shape[0]
    assert jnp.allclose(
        final.y.mean[0, :d], final_fine.y.mean[0, :d], atol=5e-2
    )


def test_stop_at_hits_requested_time():
    pde = _heat("dirichlet")
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Adaptive(abstol=1e-3, reltol=1e-3), spatial_kernel=PRIOR
    )
    sol = solver.solve(pde, stop_at=(0.217,))
    assert jnp.any(jnp.isclose(sol.t, 0.217))


def test_calibration_positive():
    pde = _heat("dirichlet")
    solver = white.LinearWhiteNoiseEK1(steprule=step.Constant(dt=0.1), spatial_kernel=PRIOR)
    sol = solver.solve(pde)
    assert float(sol.diffusion_squared_calibrated) > 0.0


def test_simulate_final_state_constant_matches_solve():
    pde = _heat("dirichlet")
    solver = white.LinearWhiteNoiseEK1(steprule=step.Constant(dt=0.1), spatial_kernel=PRIOR)
    sol = solver.solve(pde)
    final, info = solver.simulate_final_state(pde)
    assert jnp.allclose(final.y.mean, sol.mean[-1])
    expected_cov = sol.cov_sqrtm[-1] * jnp.sqrt(sol.diffusion_squared_calibrated)
    assert jnp.allclose(final.y.cov_sqrtm, expected_cov)
    assert info["num_steps"] == sol.info["num_steps"]
