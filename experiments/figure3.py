"""Figure 3: dt x dx convergence/calibration grid on the SIR system.

Reproduces ``/root/reference/experiments/figure3.py``: for each (dx, dt)
cell solve the SIR reaction-diffusion system with the PNMOL white-noise EK1
and the MOL baseline, compare against a high-resolution reference at tmax,
and record RMSE (abs/rel), mean std, chi^2 calibration, and wall-clock time.

TPU-first deltas: the PNMOL solver runs its fully-jitted scan loop (the
reference disables jit here, ``figure3.py:44,72``), and the reference
solution comes from the in-house DP5 integrator.

Usage: python experiments/figure3.py [--fast] [--no-plot]
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

# Grids (reference: figure3.py:128-130). PNMOL_FIG3_DX_LEVELS caps the number
# of mesh refinements (the finest reference levels need hours on one CPU core).
import os

DTS = np.asarray(2.0 ** np.arange(2, -7, step=-0.5))
DXS = 1.0 / (2.0 ** np.arange(2, 7))
DXS = DXS[: int(os.environ.get("PNMOL_FIG3_DX_LEVELS", len(DXS)))]
if FAST:
    DTS = DTS[::4]
    DXS = DXS[:2]

HIGH_RES_FACTOR_DX = 10
NUM_DERIVATIVES = 1
STENCIL_SIZE = 3
T0, TMAX = 0.0, 1.0 if FAST else 6.0
DIFFUSION_RATE = 0.035

PRIOR_KERNEL = pnmol_tpu.kernels.duplicate(
    pnmol_tpu.kernels.Matern52() + pnmol_tpu.kernels.WhiteNoise(), num=3
)


def make_sir(dx, stencil_boundary):
    return pnmol_tpu.pde.examples.sir_1d_discretized(
        t0=T0,
        tmax=TMAX,
        dx=dx,
        stencil_size_interior=STENCIL_SIZE,
        stencil_size_boundary=stencil_boundary,
        diffusion_rate_S=DIFFUSION_RATE,
        diffusion_rate_I=DIFFUSION_RATE,
        diffusion_rate_R=DIFFUSION_RATE,
        kernel=pnmol_tpu.kernels.SquareExponential(),
    )


def solve_reference(dx):
    """High-res ground truth at tmax: susceptible compartment, coarse interior.

    LSODA (host scipy, like the reference figure3.py:22-24): the 10x-refined
    system is stiff; explicit DP5 exhausts its step budget at dx <= 1/64.
    """
    pde_ref = make_sir(dx / HIGH_RES_FACTOR_DX, STENCIL_SIZE + 1)
    ivp = pde_ref.to_ivp()
    sol = reference_solver.solve_ivp_stiff(
        jax.jit(ivp.f),
        ivp.t_span,
        ivp.y0,
        t_eval=jnp.asarray([pde_ref.tmax]),
        rtol=1e-10,
        atol=1e-10,
        jac=jax.jit(ivp.df) if getattr(ivp, "df", None) is not None else None,
    )
    mean = sol.y[-1]
    i_mean = jnp.split(mean, 3)[0]
    return i_mean[HIGH_RES_FACTOR_DX - 1 :: HIGH_RES_FACTOR_DX]


def solve_white(pde, dt):
    solver = pnmol_tpu.white.SemiLinearWhiteNoiseEK1(
        num_derivatives=NUM_DERIVATIVES,
        steprule=step_module.Constant(dt),
        spatial_kernel=PRIOR_KERNEL,
    )
    (final, _), elapsed = common.timed(solver.simulate_final_state, pde)
    E0 = solver.iwp.projection_matrix(0)
    mean, std, cov = common.final_mean_std_cov(final, E0)
    # susceptible compartment, interior points (consistently S for mean, std,
    # AND cov — the reference mixes the S mean with the I covariance block,
    # figure3.py:52-58, which looks unintended)
    i_mean = jnp.split(mean, 3)[0][1:-1]
    i_std = jnp.split(std, 3)[0][1:-1]
    blocks = [jnp.split(row, 3, axis=1) for row in jnp.split(cov, 3, axis=0)]
    i_cov = blocks[0][0][1:-1, 1:-1]
    return i_mean, i_std, i_cov, elapsed


def solve_white_ensemble(pde, dts):
    """All PNMOL-white dts of one dx as ONE padded vmapped scan
    (pnmol_tpu.parallel.ensembles.dt_sweep_final_states): the dp wiring of
    SURVEY §2.2 item 4. Per-dt wall-clock is not individually observable in
    a batch, so runtime is reported as batch total / number of lanes."""
    from pnmol_tpu.parallel import ensembles

    solver = pnmol_tpu.white.SemiLinearWhiteNoiseEK1(
        num_derivatives=NUM_DERIVATIVES,
        steprule=step_module.Constant(dts[0]),
        spatial_kernel=PRIOR_KERNEL,
    )
    state = solver.initialize(pde)
    (means, covs, _), elapsed = common.timed(
        ensembles.dt_sweep_final_states,
        cache=solver._cache,
        num_derivatives=NUM_DERIVATIVES,
        f=pde.f,
        df=pde.df,
        linear=False,
        mean0=state.y.mean,
        cov0=state.y.cov_sqrtm,
        t0=pde.t0,
        tmax=pde.tmax,
        dts=dts,
    )
    E0 = solver.iwp.projection_matrix(0)
    per_dt = []
    for i in range(len(dts)):
        final = type(state)(
            t=state.t,
            y=state.y._replace(mean=means[i], cov_sqrtm=covs[i]),
            error_estimate=None,
            reference_state=None,
            diffusion_squared_local=state.diffusion_squared_local,
        )
        mean, std, cov = common.final_mean_std_cov(final, E0)
        i_mean = jnp.split(mean, 3)[0][1:-1]
        i_std = jnp.split(std, 3)[0][1:-1]
        blocks = [jnp.split(row, 3, axis=1) for row in jnp.split(cov, 3, axis=0)]
        i_cov = blocks[0][0][1:-1, 1:-1]
        per_dt.append((i_mean, i_std, i_cov, elapsed / len(dts)))
    return per_dt


def solve_mol(pde, dt):
    ivp = pde.to_ivp()
    solver = ek1_module.ReferenceEK1ConstantDiffusion(
        num_derivatives=NUM_DERIVATIVES,
        steprule=step_module.Constant(dt),
        initialization=init_module.Stack(use_df=False),
    )
    (final, _), elapsed = common.timed(solver.simulate_final_state, ivp)
    E0 = solver.iwp.projection_matrix(0)
    mean, std, cov = common.final_mean_std_cov(final, E0)
    # the IVP state is already boundary-free: split into species, take S
    i_mean = jnp.split(mean, 3)[0]
    i_std = jnp.split(std, 3)[0]
    blocks = [jnp.split(row, 3, axis=1) for row in jnp.split(cov, 3, axis=0)]
    return i_mean, i_std, blocks[0][0], elapsed


def empty_result():
    shape = (len(DXS), len(DTS))
    return {
        k: np.zeros(shape)
        for k in ("error_abs", "error_rel", "std", "runtime", "chi2", "dt", "dx")
    }


def _load_existing():
    """Rows already on disk (for PNMOL_FIG3_MERGE=1: compute only missing
    dx levels and merge — the fine levels are hours on this 1-core host)."""
    import pathlib

    base = pathlib.Path(__file__).resolve().parent / "results" / "figure3"
    keys = ("error_abs", "error_rel", "std", "runtime", "chi2", "dt", "dx")
    try:
        white = {k: np.load(base / f"pnmol_white_{k}.npy") for k in keys}
        mol = {k: np.load(base / f"tornadox_{k}.npy") for k in keys}
    except FileNotFoundError:
        return None, None
    if white["dt"].shape[1] != len(DTS):
        return None, None
    return white, mol


def main():
    result_white, result_mol = empty_result(), empty_result()
    existing_white, existing_mol = (None, None)
    if os.environ.get("PNMOL_FIG3_MERGE", "0") == "1":
        existing_white, existing_mol = _load_existing()

    for i_dx, dx in enumerate(sorted(DXS)):
        if existing_white is not None:
            rows = np.nonzero(np.isclose(existing_white["dx"][:, 0], dx))[0]
            if rows.size:
                for key in result_white:
                    result_white[key][i_dx] = existing_white[key][rows[0]]
                    result_mol[key][i_dx] = existing_mol[key][rows[0]]
                print(f"dx={dx:.4f}: reused existing row")
                continue
        pde = make_sir(dx, STENCIL_SIZE + 2)
        # susceptible reference restricted to interior for MOL comparison
        ref = solve_reference(dx)
        white_batch = (
            solve_white_ensemble(pde, sorted(DTS))
            if "--ensemble-dts" in sys.argv
            else None
        )
        for i_dt, dt in enumerate(sorted(DTS)):
            print(f"dx={dx:.4f} dt={dt:.4f} (d={pde.y0.size})")

            if white_batch is not None:
                m_w, s_w, c_w, t_w = white_batch[i_dt]
            else:
                m_w, s_w, c_w, t_w = solve_white(pde, dt)
            err_w = jnp.abs(m_w - ref)
            result_white["error_abs"][i_dx, i_dt] = common.rmse(err_w)
            result_white["error_rel"][i_dx, i_dt] = common.rmse(err_w, ref)
            result_white["std"][i_dx, i_dt] = jnp.mean(s_w)
            result_white["runtime"][i_dx, i_dt] = t_w
            result_white["chi2"][i_dx, i_dt] = common.chi2_statistic(err_w, c_w)
            result_white["dt"][i_dx, i_dt] = dt
            result_white["dx"][i_dx, i_dt] = dx

            m_m, s_m, c_m, t_m = solve_mol(pde, dt)
            err_m = jnp.abs(m_m - ref)
            result_mol["error_abs"][i_dx, i_dt] = common.rmse(err_m)
            result_mol["error_rel"][i_dx, i_dt] = common.rmse(err_m, ref)
            result_mol["std"][i_dx, i_dt] = jnp.mean(s_m)
            result_mol["runtime"][i_dx, i_dt] = t_m
            result_mol["chi2"][i_dx, i_dt] = common.chi2_statistic(err_m, c_m)
            result_mol["dt"][i_dx, i_dt] = dt
            result_mol["dx"][i_dx, i_dt] = dx

            print(
                f"  white: rmse_rel={result_white['error_rel'][i_dx, i_dt]:.3e} "
                f"chi2={result_white['chi2'][i_dx, i_dt]:.3e} t={t_w:.2f}s | "
                f"mol: rmse_rel={result_mol['error_rel'][i_dx, i_dt]:.3e} "
                f"chi2={result_mol['chi2'][i_dx, i_dt]:.3e} t={t_m:.2f}s"
            )

    common.save_arrays("figure3", "pnmol_white", **result_white)
    common.save_arrays("figure3", "tornadox", **result_mol)

    if "--no-plot" not in sys.argv:
        import plotting

        plotting.figure_3()


if __name__ == "__main__":
    main()
