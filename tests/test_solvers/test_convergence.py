"""Convergence of the white-noise filter mean to the MOL solution (heat).

As dt -> 0 with fixed dx, the filter mean must converge to the solution of
the discretized system (here the boundary-eliminated IVP solved by DP5 at
tight tolerance). Note this holds cleanly for linear problems; for the
white-noise solver on nonlinear systems the fixed per-step measurement noise
makes very small dt counterproductive (the work-precision experiments show
the floor — an algorithmic property of PNMOL-white, not an implementation
artifact)."""

import jax
import jax.numpy as jnp

from pnmol_tpu.models import examples
from pnmol_tpu.odetools import reference_solver, step
from pnmol_tpu.solvers import white


def test_white_mean_converges_to_mol_solution():
    heat = examples.heat_1d_discretized(dx=0.1, tmax=1.0)
    ivp = heat.to_ivp()
    ref = reference_solver.solve_ivp_dopri5(
        jax.jit(ivp.f), ivp.t_span, ivp.y0, jnp.asarray([1.0]), rtol=1e-12, atol=1e-12
    ).y[-1]

    errors = []
    for dt in (0.1, 0.02, 0.004):
        solver = white.LinearWhiteNoiseEK1(steprule=step.Constant(dt))
        final, _ = solver.simulate_final_state(heat)
        u = final.y.mean[0][1:-1]
        errors.append(float(jnp.linalg.norm(u - ref) / jnp.linalg.norm(ref)))

    # strictly decreasing, ~4 orders of magnitude total reduction
    assert errors[0] > errors[1] > errors[2]
    assert errors[2] < 5e-4 * errors[0]
