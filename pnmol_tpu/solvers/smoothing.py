"""Square-root RTS smoothing over PDE-filter trajectories.

Capability beyond the reference: its PDE filters only ever *filter*
(``pnmol.pdefilter`` has no smoother; the only smoothing in the reference is
the 1-D pass inside RK initialization, ``odetools/init.py:146-222``). The
smoothed posterior p(u(t_k) | all data) is the natural probabilistic-numerics
output, so this module adds it — as one backward ``lax.scan`` over the
filtered trajectory.

Per backward step (in per-step preconditioned coordinates, so dt may vary):

    x      = A @ Cl_k                      (structured batched matmul)
    scp    = chol(x x' + Ql Ql')           (QR)
    sgain  = Cl_k Cl_k' A' (scp scp')^{-1} (Cholesky solve)
    smooth = sqrt-RTS step                 (3-block QR, ops.kalman)

Everything needed is recomputable from the filtered means/covariances — no
extra storage during filtering.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from pnmol_tpu.ops import iwp, kalman, sqrt


def smooth_trajectory(*, A1d, Ql, num_derivatives, means, cov_sqrtms, dts):
    """Square-root RTS smoother over a filtered trajectory.

    Parameters
    ----------
    A1d, Ql:
        Preconditioned 1-D transition and full process-noise factor of the
        prior (e.g. ``solver._cache.A1d`` / ``solver._cache.Ql``).
    means, cov_sqrtms:
        Filtered trajectory: shapes (K+1, n, d_tot) and (K+1, D, D)
        including the initial state (as produced by ``PDEFilter.solve``).
    dts:
        The K step sizes between consecutive states.

    Returns
    -------
    (smoothed_means (K+1, n, d_tot), smoothed_cov_sqrtms (K+1, D, D))
    """
    n = num_derivatives + 1
    means = jnp.asarray(means)
    covs = jnp.asarray(cov_sqrtms)
    dts = jnp.asarray(dts)

    def backward(carry, inputs):
        m_fut, c_fut = carry  # smoothed at k+1, NON-preconditioned
        m_k, c_k, dt = inputs  # filtered at k

        p, p_inv = iwp.nordsieck_scales_1d(num_derivatives, dt)

        # pull filtered state k and smoothed state k+1 into preconditioned coords
        m_prec = iwp.mean_to_flat(m_k * p_inv[:, None])
        cl = iwp.scale_stack(p_inv, c_k)
        m_fut_prec = iwp.mean_to_flat(m_fut * p_inv[:, None])
        c_fut_prec = iwp.scale_stack(p_inv, c_fut)

        # prediction k -> k+1 and smoothing gain
        mp = iwp.apply_stack_matrix(A1d, m_prec)
        x = iwp.apply_stack_matrix(A1d, cl)
        scp = sqrt.propagate_cholesky_factor(x, Ql)
        cross = cl @ x.T
        sgain = jax.scipy.linalg.cho_solve((scp, True), cross.T).T

        m_s, c_s = kalman.smoother_step_sqrt(
            mean=m_prec,
            cov_l=cl,
            mean_next=m_fut_prec,
            cov_l_next=c_fut_prec,
            smoothing_gain=sgain,
            proc_noise_l=Ql,
            mean_pred=mp,
            transited_l=x,
        )

        # back to non-preconditioned coordinates
        m_out = iwp.flat_to_mean(m_s, n) * p[:, None]
        c_out = iwp.scale_stack(p, c_s)
        return (m_out, c_out), (m_out, c_out)

    # iterate k = K-1 .. 0; carry starts from the final filtered state
    init = (means[-1], covs[-1])
    (m0_s, c0_s), (ms_rev, cs_rev) = jax.lax.scan(
        backward, init, (means[:-1], covs[:-1], dts), reverse=True
    )
    smoothed_means = jnp.concatenate((ms_rev, means[-1:]), axis=0)
    smoothed_covs = jnp.concatenate((cs_rev, covs[-1:]), axis=0)
    return smoothed_means, smoothed_covs


def smooth_solution(solver, solution):
    """Smooth a ``PDESolution`` produced by ``solver.solve`` (white or latent).

    Returns a new ``PDESolution`` with smoothed means/cov factors.
    """
    import dataclasses

    dts = jnp.diff(solution.t)
    means, covs = smooth_trajectory(
        A1d=solver._cache.A1d,
        Ql=solver._cache.Ql,
        num_derivatives=solver.num_derivatives,
        means=solution.mean,
        cov_sqrtms=solution.cov_sqrtm,
        dts=dts,
    )
    return dataclasses.replace(solution, mean=means, cov_sqrtm=covs)
