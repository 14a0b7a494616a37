"""Figure 1: heat-equation contours — PNMOL (white, latent) vs MOL vs truth.

Reproduces ``/root/reference/experiments/figure1.py``: 1-D heat with
Dirichlet boundaries, Matern52 discretization kernel, constant steps; saves
means/stds/ts/xs per method under ``experiments/results/figure1/``.

Usage: python experiments/figure1.py [--fast] [--no-plot]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import pnmol_tpu
from pnmol_tpu.odetools import ek1 as ek1_module
from pnmol_tpu.odetools import init as init_module
from pnmol_tpu.odetools import reference_solver
from pnmol_tpu.odetools import step as step_module

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))
import common

FAST = "--fast" in sys.argv
common.set_fast_mode(FAST)

# Hyperparameters (method) — reference values: figure1.py:108-123
DT = 0.05
DX = 0.2
HIGH_RES_FACTOR_DX = 4 if FAST else 12
HIGH_RES_FACTOR_DT = 8
NUM_DERIVATIVES = 2
STENCIL_SIZE = 3
INPUT_SCALE = 1.0
KERNEL = pnmol_tpu.kernels.Matern52(input_scale=INPUT_SCALE)

# Hyperparameters (problem)
T0, TMAX = 0.0, 1.0 if FAST else 3.0
DIFFUSION_RATE = 0.035


def make_pde(dx):
    return pnmol_tpu.pde.examples.heat_1d_discretized(
        t0=T0,
        tmax=TMAX,
        dx=dx,
        stencil_size_interior=STENCIL_SIZE,
        stencil_size_boundary=STENCIL_SIZE + 1,
        diffusion_rate=DIFFUSION_RATE,
        kernel=KERNEL,
        bcond="dirichlet",
    )


def solve_white(pde):
    solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        num_derivatives=NUM_DERIVATIVES,
        steprule=step_module.Constant(DT),
        spatial_kernel=KERNEL,
    )
    sol = solver.solve(pde)
    E0 = solver.iwp.projection_matrix(0)
    means, stds = common.trajectory_mean_std(sol, E0)
    gamma = jnp.sqrt(sol.diffusion_squared_calibrated)
    print("white calibrated gamma:", float(gamma))
    return means, gamma * stds, sol.t, pde.mesh_spatial.points


def solve_latent(pde):
    solver = pnmol_tpu.latent.LinearLatentForceEK1(
        num_derivatives=NUM_DERIVATIVES,
        steprule=step_module.Constant(DT),
        spatial_kernel=KERNEL,
    )
    sol = solver.solve(pde)
    E0 = solver.state_iwp.projection_matrix(0)
    means, stds = common.trajectory_mean_std_latent(sol, E0)
    gamma = jnp.sqrt(sol.diffusion_squared_calibrated)
    print("latent calibrated gamma:", float(gamma))
    return means, gamma * stds, sol.t, pde.mesh_spatial.points


def solve_mol(pde):
    """In-house MOL baseline (tornadox replacement)."""
    ivp = pde.to_ivp()
    solver = ek1_module.ReferenceEK1ConstantDiffusion(
        num_derivatives=NUM_DERIVATIVES,
        steprule=step_module.Constant(DT),
        initialization=init_module.Stack(use_df=False),
    )
    sol, sigma_squared = solver.solve(ivp)
    sigma = jnp.sqrt(sigma_squared)
    E0 = solver.iwp.projection_matrix(0)
    means, stds = common.trajectory_mean_std(sol, E0)
    # re-insert the Dirichlet boundary rows eliminated by the conversion
    means = jnp.pad(means, ((0, 0), (1, 1)))
    stds = jnp.pad(stds, ((0, 0), (1, 1)))
    return means, sigma * stds, sol.t, pde.mesh_spatial.points


def solve_reference(pde_hi):
    """High-resolution ground truth on the fine mesh, via DP5."""
    dt = DT / HIGH_RES_FACTOR_DT
    t_eval = jnp.arange(pde_hi.t0, pde_hi.tmax, step=dt)
    ivp = pde_hi.to_ivp()
    sol = reference_solver.solve_ivp_dopri5(
        jax.jit(ivp.f), ivp.t_span, ivp.y0, t_eval, rtol=1e-8, atol=1e-10
    )
    means = jnp.pad(sol.y, ((0, 0), (1, 1)))[::HIGH_RES_FACTOR_DT, ::HIGH_RES_FACTOR_DX]
    stds = jnp.zeros_like(means)
    ts = t_eval[::HIGH_RES_FACTOR_DT]
    xs = pde_hi.mesh_spatial.points[::HIGH_RES_FACTOR_DX]
    return means, stds, ts, xs


def main():
    pde = make_pde(DX)
    pde_hi = make_pde(DX / HIGH_RES_FACTOR_DX)

    for prefix, result in [
        ("pnmol_white", solve_white(pde)),
        ("pnmol_latent", solve_latent(pde)),
        ("tornadox", solve_mol(pde)),
        ("reference", solve_reference(pde_hi)),
    ]:
        means, stds, ts, xs = result
        common.save_arrays(
            "figure1", prefix, means=means, stds=stds, ts=ts, xs=xs
        )
        print(f"{prefix}: means {means.shape}, stds {stds.shape}")

    if "--no-plot" not in sys.argv:
        import plotting

        plotting.figure_1()


if __name__ == "__main__":
    main()
