"""Shared experiment utilities: solver wrappers, extraction, results IO.

Mirrors the roles of the helper functions inside the reference's experiment
scripts (``/root/reference/experiments/figure{1,3,4}.py``), shared instead of
re-defined per figure. TPU-first deltas: everything runs jitted (the
reference disables jit in several experiments), the CPU/TPU device choice is
explicit, and ground truths come from the in-house DP5 integrator (scipy
LSODA remains an option for stiff systems).
"""

import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

RESULTS_ROOT = pathlib.Path(__file__).resolve().parent / "results"


def results_dir(figure: str) -> pathlib.Path:
    path = RESULTS_ROOT / figure
    path.mkdir(parents=True, exist_ok=True)
    return path


_FAST_MODE = False


def set_fast_mode(enabled: bool) -> None:
    """--fast smoke runs write to results/<figure>_fast/ so they can never
    clobber full-scale results (which cost hours to recompute)."""
    global _FAST_MODE
    _FAST_MODE = bool(enabled)


def save_arrays(figure: str, prefix: str, **arrays):
    if _FAST_MODE:
        figure = figure + "_fast"
    path = results_dir(figure)
    for name, arr in arrays.items():
        arr = np.asarray(arr)
        assert not np.any(np.isnan(arr)), f"NaN in {prefix}_{name}"
        np.save(path / f"{prefix}_{name}.npy", arr)


def load_array(figure: str, name: str):
    return np.load(RESULTS_ROOT / figure / f"{name}.npy")


# ---------------------------------------------------------------------------
# Solution extraction
# ---------------------------------------------------------------------------


def trajectory_mean_std(sol, E0):
    """Per-step solution means and marginal stds from a PDESolution."""
    means = sol.mean[:, 0]
    variances = jnp.einsum("tij,tij->ti", sol.cov_sqrtm, sol.cov_sqrtm)
    stds = jnp.sqrt(variances @ E0.T)
    return means, stds


def trajectory_mean_std_latent(sol, E0):
    """Same, for the latent solver's glued (state | latent) layout."""
    means = jnp.split(sol.mean, 2, axis=-1)[0][:, 0, :]
    variances = jnp.einsum("tij,tij->ti", sol.cov_sqrtm, sol.cov_sqrtm)
    state_vars = jnp.split(variances, 2, axis=-1)[0]
    stds = jnp.sqrt(state_vars @ E0.T)
    return means, stds


def final_mean_std_cov(final_state, E0):
    """Mean, marginal std, and solution-block covariance of a final state."""
    mean = final_state.y.mean[0, :]
    cov_full = final_state.y.cov_sqrtm @ final_state.y.cov_sqrtm.T
    cov = E0 @ cov_full @ E0.T
    std = jnp.sqrt(jnp.diagonal(cov))
    return mean, std, cov


def chi2_statistic(error_abs, cov):
    """Calibration statistic e^T C^{-1} e / n (SPD solve via Cholesky)."""
    chol = jnp.linalg.cholesky(cov + 1e-12 * jnp.eye(cov.shape[0], dtype=cov.dtype))
    white = jax.scipy.linalg.cho_solve((chol, True), error_abs)
    return error_abs @ white / error_abs.shape[0]


def rmse(error_abs, reference=None):
    """RMSE; relative if a reference is given."""
    err = error_abs if reference is None else error_abs / jnp.abs(reference)
    return jnp.linalg.norm(err) / jnp.sqrt(err.size)


def timed(fn, *args, **kwargs):
    """(result, elapsed_seconds), blocking on all outputs."""
    start = time.perf_counter()
    result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return result, time.perf_counter() - start
