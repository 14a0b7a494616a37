"""RTS smoothing over PDE-filter trajectories vs a dense full-covariance oracle."""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.ops import kalman
from pnmol_tpu.solvers import smoothing, white

PRIOR = kernels.Matern52() + kernels.WhiteNoise()


@pytest.fixture(scope="module")
def filtered():
    pde = examples.heat_1d_discretized(dx=0.2, tmax=0.5)
    solver = white.LinearWhiteNoiseEK1(steprule=step.Constant(0.1), spatial_kernel=PRIOR)
    sol = solver.solve(pde)
    return pde, solver, sol


def _dense_rts_oracle(solver, sol):
    """Textbook full-covariance RTS smoother in raw coordinates."""
    prior = solver.iwp
    from pnmol_tpu.ops import iwp as iwp_mod

    K = sol.t.shape[0] - 1
    dts = jnp.diff(sol.t)
    means = [None] * (K + 1)
    covs = [None] * (K + 1)
    means[K] = iwp_mod.mean_to_flat(sol.mean[K])
    covs[K] = sol.cov_sqrtm[K] @ sol.cov_sqrtm[K].T
    for k in range(K - 1, -1, -1):
        A, LQ = prior.non_preconditioned_discretize(float(dts[k]))
        m_k = iwp_mod.mean_to_flat(sol.mean[k])
        C_k = sol.cov_sqrtm[k] @ sol.cov_sqrtm[k].T
        mp = A @ m_k
        Pp = A @ C_k @ A.T + LQ @ LQ.T
        gain = jnp.linalg.solve(Pp.T, (C_k @ A.T).T).T
        means[k] = m_k + gain @ (means[k + 1] - mp)
        covs[k] = C_k + gain @ (covs[k + 1] - Pp) @ gain.T
    return means, covs


def test_smoothed_matches_dense_oracle(filtered):
    pde, solver, sol = filtered
    smoothed = smoothing.smooth_solution(solver, sol)

    from pnmol_tpu.ops import iwp as iwp_mod

    oracle_means, oracle_covs = _dense_rts_oracle(solver, sol)
    for k in range(sol.t.shape[0]):
        got_m = iwp_mod.mean_to_flat(smoothed.mean[k])
        got_C = smoothed.cov_sqrtm[k] @ smoothed.cov_sqrtm[k].T
        assert jnp.allclose(got_m, oracle_means[k], rtol=1e-7, atol=1e-10), k
        assert jnp.allclose(got_C, oracle_covs[k], rtol=1e-6, atol=1e-9), k


def test_smoothing_reduces_uncertainty(filtered):
    """Smoothed marginal variances never exceed the filtered ones (up to fp)."""
    pde, solver, sol = filtered
    smoothed = smoothing.smooth_solution(solver, sol)
    var_filt = jnp.einsum("tij,tij->ti", sol.cov_sqrtm, sol.cov_sqrtm)
    var_smooth = jnp.einsum("tij,tij->ti", smoothed.cov_sqrtm, smoothed.cov_sqrtm)
    assert jnp.all(var_smooth <= var_filt + 1e-10)
    # final state untouched
    assert jnp.allclose(smoothed.mean[-1], sol.mean[-1])
