"""Figure 4: work-precision diagrams on the Lotka-Volterra system.

Reproduces ``/root/reference/experiments/figure4.py``: for three mesh widths
and twelve step sizes, solve the LV reaction-diffusion system with
PNMOL-white, PNMOL-latent, and the MOL baseline; record relative RMSE of the
prey compartment vs a high-resolution reference, the chi^2 calibration, step
counts, and wall-clock time. Saves ``dx_<dx>_<method>_<metric>.npy``.

Usage: python experiments/figure4.py [--fast] [--no-plot]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import pnmol_tpu
from pnmol_tpu.odetools import ek1 as ek1_module
from pnmol_tpu.odetools import init as init_module
from pnmol_tpu.odetools import reference_solver
from pnmol_tpu.odetools import step as step_module

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))
import common

FAST = "--fast" in sys.argv
common.set_fast_mode(FAST)

import os

PDE_KWARGS = {"t0": 0.0, "tmax": 1.0 if FAST else 6.0}
DXS = [0.01, 0.05, 0.2]
if os.environ.get("PNMOL_FIG4_DXS"):
    DXS = [float(v) for v in os.environ["PNMOL_FIG4_DXS"].split(",")]
if FAST:
    DXS = [0.05]
DTS = jnp.logspace(0.0, -2.5, 3 if FAST else 12, endpoint=True)
REF_SCALE = 7
NU = 2


def prior_kernel():
    return pnmol_tpu.kernels.duplicate(
        pnmol_tpu.kernels.Matern52() + pnmol_tpu.kernels.WhiteNoise(), num=2
    )


def make_lv(dx, **kwargs):
    return pnmol_tpu.pde.examples.lotka_volterra_1d_discretized(
        **PDE_KWARGS, dx=dx, **kwargs
    )


def solve_reference(dx):
    """High-res prey compartment at tmax on the coarse interior grid.

    LSODA (host scipy, like the reference figure4.py:35-43): the high-res
    system is stiff (diffusion eigenvalue ~ (dx/7)^-2) — explicit DP5 would
    need ~1e5+ steps at dx=0.01.
    """
    pde_ref = make_lv(dx / REF_SCALE)
    ivp = pde_ref.to_ivp()
    sol = reference_solver.solve_ivp_stiff(
        jax.jit(ivp.f),
        ivp.t_span,
        ivp.y0,
        t_eval=jnp.asarray([ivp.tmax]),
        rtol=1e-10,
        atol=1e-10,
        jac=jax.jit(ivp.df) if getattr(ivp, "df", None) is not None else None,
    )
    u_full, v_full = jnp.split(sol.y[-1], 2)
    return u_full[REF_SCALE - 1 :: REF_SCALE], v_full[REF_SCALE - 1 :: REF_SCALE]


def extract_white(final, solver):
    u_full, _ = jnp.split(final.y.mean[0], 2)
    cov = final.y.cov_sqrtm @ final.y.cov_sqrtm.T
    cov0 = solver.E0 @ cov @ solver.E0.T
    u_cov = jnp.split(jnp.split(cov0, 2, axis=1)[0], 2, axis=0)[0]
    return u_full[1:-1], u_cov[1:-1, 1:-1]


def extract_latent(final, solver):
    mean_state, _ = jnp.split(final.y.mean[0], 2)
    u_full, _ = jnp.split(mean_state, 2)
    cov = final.y.cov_sqrtm @ final.y.cov_sqrtm.T
    cov_state = jnp.split(jnp.split(cov, 2, axis=1)[0], 2, axis=0)[0]
    cov0 = solver.E0 @ cov_state @ solver.E0.T
    u_cov = jnp.split(jnp.split(cov0, 2, axis=1)[0], 2, axis=0)[0]
    return u_full[1:-1], u_cov[1:-1, 1:-1]


def main():
    for dx in DXS:
        pde = make_lv(dx, stencil_size_interior=3, stencil_size_boundary=4)
        ivp = pde.to_ivp()
        u_ref, _ = solve_reference(dx)
        print(f"dx={dx}: grid {pde.mesh_spatial.shape}, ref {u_ref.shape}")

        metrics = {
            method: {"rmse": [], "chi2": [], "nsteps": [], "time": []}
            for method in ("pnmol_white", "pnmol_latent", "mol")
        }

        for dt in DTS:
            dt = float(dt)

            # [PNMOL latent]
            solver = pnmol_tpu.latent.SemiLinearLatentForceEK1(
                num_derivatives=NU,
                steprule=step_module.Constant(dt),
                spatial_kernel=prior_kernel(),
            )
            (final, info), elapsed = common.timed(solver.simulate_final_state, pde)
            u, u_cov = extract_latent(final, solver)
            err = jnp.abs(u - u_ref)
            metrics["pnmol_latent"]["rmse"].append(common.rmse(err, u_ref))
            metrics["pnmol_latent"]["chi2"].append(common.chi2_statistic(err, u_cov))
            metrics["pnmol_latent"]["nsteps"].append(info["num_steps"])
            metrics["pnmol_latent"]["time"].append(elapsed)

            # [PNMOL white]
            solver = pnmol_tpu.white.SemiLinearWhiteNoiseEK1(
                num_derivatives=NU,
                steprule=step_module.Constant(dt),
                spatial_kernel=prior_kernel(),
            )
            (final, info), elapsed = common.timed(solver.simulate_final_state, pde)
            u, u_cov = extract_white(final, solver)
            err = jnp.abs(u - u_ref)
            metrics["pnmol_white"]["rmse"].append(common.rmse(err, u_ref))
            metrics["pnmol_white"]["chi2"].append(common.chi2_statistic(err, u_cov))
            metrics["pnmol_white"]["nsteps"].append(info["num_steps"])
            metrics["pnmol_white"]["time"].append(elapsed)

            # [MOL baseline]
            solver = ek1_module.ReferenceEK1ConstantDiffusion(
                num_derivatives=NU,
                steprule=step_module.Constant(dt),
                initialization=init_module.Stack(use_df=False),
            )
            (final, info), elapsed = common.timed(solver.simulate_final_state, ivp)
            u, _ = jnp.split(final.y.mean[0], 2)
            cov = final.y.cov_sqrtm @ final.y.cov_sqrtm.T
            E0 = solver.iwp.projection_matrix(0)
            cov0 = E0 @ cov @ E0.T
            u_cov = jnp.split(jnp.split(cov0, 2, axis=1)[0], 2, axis=0)[0]
            err = jnp.abs(u - u_ref)
            metrics["mol"]["rmse"].append(common.rmse(err, u_ref))
            metrics["mol"]["chi2"].append(common.chi2_statistic(err, u_cov))
            metrics["mol"]["nsteps"].append(info["num_steps"])
            metrics["mol"]["time"].append(elapsed)

            print(
                f"  dt={dt:.4f}: "
                + " | ".join(
                    f"{m}: rmse={float(metrics[m]['rmse'][-1]):.2e} "
                    f"chi2={float(metrics[m]['chi2'][-1]):.2e}"
                    for m in metrics
                )
            )

        prefix = f"dx_{dx}"
        for method, vals in metrics.items():
            common.save_arrays(
                "figure4",
                f"{prefix}_{method}",
                rmse=jnp.asarray(vals["rmse"]),
                chi2=jnp.asarray(vals["chi2"]),
                nsteps=jnp.asarray(vals["nsteps"]),
                time=jnp.asarray(vals["time"]),
            )
        common.save_arrays("figure4", prefix, dts=DTS)

    if "--no-plot" not in sys.argv:
        import plotting

        plotting.figure_4(dxs=DXS)


if __name__ == "__main__":
    main()
