"""Figure rendering from saved .npy results (two-phase contract).

Lean re-implementation of the reference's figure builders
(``/root/reference/experiments/plotting.py``): loads the arrays written by
``figure{1..4}.py`` and renders the corresponding panels. Styling is kept
minimal; the information content matches the paper figures.
"""

import pathlib

import matplotlib.pyplot as plt
import numpy as np

RESULTS = pathlib.Path(__file__).resolve().parent / "results"


def _load(figure, name):
    return np.load(RESULTS / figure / f"{name}.npy")


def _savefig(fig, name):
    out = RESULTS / name
    fig.savefig(out.with_suffix(".pdf"), bbox_inches="tight")
    fig.savefig(out.with_suffix(".png"), dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {out}.pdf/.png")


def figure_1():
    """3 x 3 panel: (white, latent, MOL) x (mean, std, abs error vs truth)."""
    methods = ["pnmol_white", "pnmol_latent", "tornadox"]
    titles = ["PNMOL (white)", "PNMOL (latent)", "MOL baseline"]
    ref_means = _load("figure1", "reference_means")
    ref_ts = _load("figure1", "reference_ts")
    ref_xs = _load("figure1", "reference_xs").squeeze()

    fig, axes = plt.subplots(3, 3, figsize=(9, 7), sharex=True, sharey=True)
    for row, (method, title) in enumerate(zip(methods, titles)):
        means = _load("figure1", f"{method}_means")
        stds = _load("figure1", f"{method}_stds")
        ts = _load("figure1", f"{method}_ts")
        xs = _load("figure1", f"{method}_xs").squeeze()
        T, X = np.meshgrid(xs, ts)

        n = min(len(ts), len(ref_ts))
        m = min(means.shape[1], ref_means.shape[1])
        err = np.abs(means[:n, :m] - ref_means[:n, :m])

        for col, (field, label) in enumerate(
            [(means, "mean"), (stds, "std"), (err, "abs error")]
        ):
            ax = axes[row, col]
            grid_t, grid_x = np.meshgrid(ts[: field.shape[0]], xs[: field.shape[1]])
            im = ax.pcolormesh(
                grid_x, grid_t, field.T[: grid_x.shape[0], : grid_x.shape[1]],
                shading="auto", cmap="viridis",
            )
            fig.colorbar(im, ax=ax, shrink=0.8)
            if row == 0:
                ax.set_title(label)
            if col == 0:
                ax.set_ylabel(f"{title}\n t")
    for ax in axes[-1]:
        ax.set_xlabel("x")
    _savefig(fig, "figure1")


def figure_2():
    """Discretization study: RMSE grid, L/E sparsity, GP samples, target."""
    rmse_all = _load("figure2", "fig2_rmse_all")
    input_scales = _load("figure2", "fig2_input_scales")
    stencil_sizes = _load("figure2", "fig2_stencil_sizes")
    L_sparse = _load("figure2", "fig2_L_sparse")
    L_dense = _load("figure2", "fig2_L_dense")
    xgrid = _load("figure2", "fig2_xgrid").squeeze()
    fx = _load("figure2", "fig2_fx")
    dfx = _load("figure2", "fig2_dfx")
    samples = [_load("figure2", f"fig2_s{i}") for i in (1, 2, 3)]

    fig, axes = plt.subplots(1, 5, figsize=(15, 2.8))
    axes[0].plot(xgrid, fx, label="f")
    axes[0].plot(xgrid, dfx, label=r"$\Delta f$")
    axes[0].legend()
    axes[0].set_title("target")

    for j, scale in enumerate(input_scales):
        axes[1].semilogy(stencil_sizes, rmse_all[:, j], marker="o", label=f"scale={scale:.1f}")
    axes[1].legend(fontsize=7)
    axes[1].set_xlabel("stencil size")
    axes[1].set_title("FD RMSE")

    axes[2].imshow(np.log10(np.abs(L_sparse) + 1e-14), cmap="magma")
    axes[2].set_title("log|L| sparse")
    axes[3].imshow(np.log10(np.abs(L_dense) + 1e-14), cmap="magma")
    axes[3].set_title("log|L| dense")

    for s, scale in zip(samples, input_scales):
        axes[4].plot(xgrid, s[:, 0], lw=0.8, label=f"scale={scale:.1f}")
    axes[4].legend(fontsize=7)
    axes[4].set_title("GP prior samples")
    _savefig(fig, "figure2")


def figure_3():
    """dt x dx grids: RMSE, chi^2, runtime for PNMOL-white vs MOL."""
    fig, axes = plt.subplots(2, 3, figsize=(12, 6), sharex=True, sharey=True)
    for row, method in enumerate(["pnmol_white", "tornadox"]):
        rmse = _load("figure3", f"{method}_error_rel")
        chi2 = _load("figure3", f"{method}_chi2")
        runtime = _load("figure3", f"{method}_runtime")
        dts = _load("figure3", f"{method}_dt")[0]
        dxs = _load("figure3", f"{method}_dx")[:, 0]
        for col, (field, label) in enumerate(
            [(rmse, "rel. RMSE"), (chi2, r"$\chi^2$"), (runtime, "runtime [s]")]
        ):
            ax = axes[row, col]
            im = ax.pcolormesh(
                dts, dxs, np.log10(np.abs(field) + 1e-16), shading="auto", cmap="coolwarm"
            )
            ax.set_xscale("log")
            ax.set_yscale("log")
            fig.colorbar(im, ax=ax, shrink=0.8)
            if row == 0:
                ax.set_title(f"log10 {label}")
            if col == 0:
                ax.set_ylabel(("PNMOL (white)" if row == 0 else "MOL") + "\n dx")
            if row == 1:
                ax.set_xlabel("dt")
    _savefig(fig, "figure3")


def figure_4(dxs=(0.01, 0.05, 0.2)):
    """Work-precision: RMSE vs nsteps / runtime, chi^2 vs nsteps, per dx."""
    methods = ["pnmol_white", "pnmol_latent", "mol"]
    labels = ["PNMOL (white)", "PNMOL (latent)", "MOL"]
    fig, axes = plt.subplots(len(dxs), 3, figsize=(11, 3 * len(dxs)), squeeze=False)
    for row, dx in enumerate(dxs):
        prefix = f"dx_{dx}"
        for method, label in zip(methods, labels):
            rmse = _load("figure4", f"{prefix}_{method}_rmse")
            chi2 = _load("figure4", f"{prefix}_{method}_chi2")
            nsteps = _load("figure4", f"{prefix}_{method}_nsteps")
            time = _load("figure4", f"{prefix}_{method}_time")
            axes[row, 0].loglog(nsteps, rmse, marker="o", label=label)
            axes[row, 1].loglog(time, rmse, marker="o", label=label)
            axes[row, 2].loglog(nsteps, chi2, marker="o", label=label)
        axes[row, 0].set_ylabel(f"dx={dx}\nrel. RMSE")
        axes[row, 1].set_xlabel("runtime [s]")
        axes[row, 0].set_xlabel("# steps")
        axes[row, 2].set_xlabel("# steps")
        axes[row, 2].set_ylabel(r"$\chi^2$")
        axes[row, 2].axhline(1.0, color="gray", lw=0.5)
    axes[0, 0].legend(fontsize=7)
    _savefig(fig, "figure4")
