"""Classical ODE-filter baseline: EK1 with constant diffusion.

In-house replacement for the external ``tornadox.ek1.ReferenceEK1ConstantDiffusion``
that the reference experiments use as their MOL baseline
(``/root/reference/experiments/figure1.py:42-47``, ``figure3.py:62-74``,
``figure4.py:168-174``; SURVEY.md §1 flags tornadox as an undeclared
load-bearing dependency). Consumes this framework's
:class:`pnmol_tpu.odetools.ivp.InitialValueProblem` (e.g. from ``pde.to_ivp()``).

Same TPU-native shape as the PDE filters: point-major Nordsieck layout,
structured transition/preconditioner application, one QR per predict and one
per (noise-free) update, constant steps as a single ``lax.scan``.
"""

import dataclasses
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from pnmol_tpu.odetools import init as init_module
from pnmol_tpu.odetools import step as step_module
from pnmol_tpu.ops import iwp, rv, sqrt
from pnmol_tpu.solvers import pdefilter as pdefilter_module


class ODEFilterState(NamedTuple):
    t: jnp.ndarray
    y: rv.MultivariateNormal
    error_estimate: jnp.ndarray
    reference_state: jnp.ndarray
    diffusion_squared_local: jnp.ndarray


@dataclasses.dataclass
class ODESolution:
    t: jnp.ndarray
    mean: jnp.ndarray
    cov_sqrtm: jnp.ndarray
    info: Dict


import functools


@functools.partial(jax.jit, static_argnames=("f", "df", "num_derivatives"))
def ek1_attempt_step(A1d, Ql, mean, cov_sqrtm, t_next, dt, *, f, df,
                     num_derivatives):
    """One EK1 attempt step (module-level jit: shared compilations)."""
    n = num_derivatives + 1
    d = mean.shape[1]
    p, p_inv = iwp.nordsieck_scales_1d(num_derivatives, dt)

    # precondition + predict mean
    M = mean * p_inv[:, None]
    Mp = A1d @ M

    # EK1 linearization at the predicted point
    m_at = p[0] * Mp[0]
    fx = f(t_next, m_at)
    Jx = df(t_next, m_at)

    def apply_H(X):
        X0 = iwp.project_derivative(X, 0, n)
        X1 = iwp.project_derivative(X, 1, n)
        return p[1] * X1 - Jx @ (p[0] * X0)

    z = p[1] * Mp[1] - fx

    # predict covariance; Ql = kron(I_d, LQ1d) (unit spatial diffusion) is
    # a step-loop CONSTANT, assembled once in make_ek1_step_fn — the round-2
    # version materialized the dense (D, D) kron inside the hot loop (and a
    # kron of constants in a jitted scan invites compile-time constant
    # folding of a (D, D) literal, the known compile-helper OOM pattern)
    Cl = iwp.scale_stack(p_inv, cov_sqrtm)
    ACl = iwp.apply_stack_matrix(A1d, Cl)
    Clp = sqrt.propagate_cholesky_factor(ACl, Ql)

    # noise-free update
    HClp = apply_H(Clp)
    Cl_new, K, Sl = sqrt.update_sqrt_no_meascov_from_products(HClp, Clp)
    m_new_flat = iwp.mean_to_flat(Mp) - K @ z

    # local diffusion + error estimate (constant-diffusion calibration);
    # lower solve = true Mahalanobis (see note in pnmol_tpu.solvers.white)
    residual_white = jax.scipy.linalg.solve_triangular(Sl, z, lower=True)
    sigma_sq_local = residual_white @ residual_white / d
    error = jnp.sqrt(jnp.sum(Sl**2, axis=1)) * jnp.sqrt(sigma_sq_local) * dt

    M_new = iwp.flat_to_mean(m_new_flat, n) * p[:, None]
    C_new = iwp.scale_stack(p, Cl_new)
    return M_new, C_new, error, jnp.abs(M_new[0]), sigma_sq_local


def make_ek1_step_fn(*, f, df, num_derivatives: int, dtype, d: int):
    """Bind system matrices + statics to the shared EK1 step kernel.

    The process-noise factor ``kron(I_d, LQ1d)`` is assembled HERE (once,
    TPU-friendly point-major assembly) and enters the jitted step as a
    traced argument — never rebuilt in the hot loop.
    """
    A1d, LQ1d = iwp.system_matrices_1d(num_derivatives, jnp.dtype(dtype).name)
    Ql = iwp.kron_point_major(
        jnp.eye(d, dtype=dtype), jnp.asarray(LQ1d, dtype=dtype)
    )
    return functools.partial(
        ek1_attempt_step, jnp.asarray(A1d, dtype=dtype), Ql,
        f=f, df=df, num_derivatives=num_derivatives
    )


class ReferenceEK1ConstantDiffusion:
    """EK1 ODE filter with quasi-MLE constant diffusion calibration."""

    def __init__(self, *, num_derivatives=4, steprule=None, initialization=None):
        self.num_derivatives = num_derivatives
        self.steprule = steprule or step_module.Adaptive()
        self.initialization = initialization or init_module.TaylorMode()
        self.iwp = None

    def initialize(self, ivp):
        d = ivp.y0.shape[0]
        n = self.num_derivatives + 1
        self.iwp = iwp.IntegratedWienerTransition(
            num_derivatives=self.num_derivatives,
            wiener_process_dimension=d,
            wp_diffusion_sqrtm=jnp.eye(d, dtype=jnp.asarray(ivp.y0).dtype),
        )
        m0, sc0 = self.initialization(
            f=ivp.f,
            df=ivp.df,
            y0=ivp.y0,
            t0=ivp.t0,
            num_derivatives=self.num_derivatives,
            wp_diffusion_sqrtm=jnp.eye(1, dtype=jnp.asarray(ivp.y0).dtype),
        )
        # per-dimension Nordsieck covariance sc0 (n, n) -> kron over points
        # (kron_point_major: no padded 4-D intermediate on TPU)
        C0 = iwp.kron_point_major(jnp.eye(d, dtype=m0.dtype), sc0)
        self._step_fn = make_ek1_step_fn(
            f=ivp.f, df=ivp.df, num_derivatives=self.num_derivatives,
            dtype=m0.dtype, d=d,
        )
        return ODEFilterState(
            t=jnp.asarray(ivp.t0, dtype=m0.dtype),
            y=rv.MultivariateNormal(mean=m0, cov_sqrtm=C0),
            error_estimate=None,
            reference_state=None,
            diffusion_squared_local=jnp.zeros((), dtype=m0.dtype),
        )

    # -- drivers -------------------------------------------------------------

    def solve(self, ivp, progressbar=False):
        """Full trajectory. Returns (ODESolution, sigma_squared_calibrated)."""
        if isinstance(self.steprule, step_module.Constant):
            return self._solve_constant_scan(ivp)
        return self._solve_python(ivp)

    def simulate_final_state(self, ivp, progressbar=False):
        """Final state with calibrated covariance. Returns (state, info)."""
        if isinstance(self.steprule, step_module.Constant):
            sol, sigma_sq = self._solve_constant_scan(ivp, keep_trajectory=False)
            state = sol  # final state sneaks through in this mode
            final = state._replace(
                y=state.y._replace(cov_sqrtm=state.y.cov_sqrtm * jnp.sqrt(sigma_sq))
            )
            info = dict(num_steps=self._last_num_steps)
            return final, info
        sol, sigma_sq = self._solve_python(ivp)
        final = ODEFilterState(
            t=sol.t[-1],
            y=rv.MultivariateNormal(
                mean=sol.mean[-1], cov_sqrtm=sol.cov_sqrtm[-1] * jnp.sqrt(sigma_sq)
            ),
            error_estimate=None,
            reference_state=None,
            diffusion_squared_local=sigma_sq,
        )
        return final, sol.info

    def _solve_constant_scan(self, ivp, keep_trajectory=True):
        state0 = self.initialize(ivp)
        dt0 = self.steprule.dt
        ts_prev, dts = pdefilter_module.constant_step_schedule(ivp.t0, ivp.tmax, dt0)
        ts_next = jnp.asarray(ts_prev + dts)
        step_fn = self._step_fn
        self._last_num_steps = len(dts)

        def body(carry, xs):
            mean, cov, sig_sum = carry
            t_next, dt = xs
            mean, cov, err, ref, sig = step_fn(mean, cov, t_next, dt)
            out = (mean, cov) if keep_trajectory else None
            return (mean, cov, sig_sum + sig), out

        (mean, cov, sig_sum), traj = jax.lax.scan(
            body,
            (state0.y.mean, state0.y.cov_sqrtm, jnp.zeros((), state0.y.mean.dtype)),
            (ts_next, jnp.asarray(dts)),
        )
        sigma_sq = sig_sum / len(dts)
        info = dict(num_steps=len(dts), num_attempted_steps=len(dts))
        if not keep_trajectory:
            final = ODEFilterState(
                t=jnp.asarray(ts_next[-1]),
                y=rv.MultivariateNormal(mean=mean, cov_sqrtm=cov),
                error_estimate=None,
                reference_state=None,
                diffusion_squared_local=sigma_sq,
            )
            return final, sigma_sq
        sol = ODESolution(
            t=jnp.concatenate((jnp.asarray([ivp.t0]), ts_next)),
            mean=jnp.concatenate((state0.y.mean[None], traj[0])),
            cov_sqrtm=jnp.concatenate((state0.y.cov_sqrtm[None], traj[1])),
            info=info,
        )
        return sol, sigma_sq

    def _solve_python(self, ivp):
        """Adaptive solve: Python accept/reject loop over the jitted step."""
        state = self.initialize(ivp)
        ts, means, covs, sigmas = [state.t], [state.y.mean], [state.y.cov_sqrtm], []
        dt = float(step_module.propose_first_dt(ivp.f, ivp.t0, ivp.y0))
        info = dict(num_steps=0, num_attempted_steps=0)
        rate = self.num_derivatives + 1
        t = float(ivp.t0)
        mean, cov = state.y.mean, state.y.cov_sqrtm
        while t < float(ivp.tmax):
            new_mean, new_cov, err, ref, sig = self._step_fn(
                mean, cov, jnp.asarray(t + dt, mean.dtype), jnp.asarray(dt, mean.dtype)
            )
            info["num_attempted_steps"] += 1
            scaled = self.steprule.scale_error_estimate(dt * err, ref)
            accepted = bool(self.steprule.is_accepted(scaled))
            suggested = float(
                self.steprule.suggest(dt, scaled, local_convergence_rate=rate)
            )
            if accepted:
                t += dt
                mean, cov = new_mean, new_cov
                info["num_steps"] += 1
                ts.append(jnp.asarray(t, mean.dtype))
                means.append(mean)
                covs.append(cov)
                sigmas.append(sig)
            dt = min(suggested, float(ivp.tmax) - t)
            if dt <= 0 and t < float(ivp.tmax):
                dt = float(ivp.tmax) - t
        sigma_sq = jnp.mean(jnp.stack(sigmas))
        sol = ODESolution(
            t=jnp.stack(ts), mean=jnp.stack(means), cov_sqrtm=jnp.stack(covs), info=info
        )
        return sol, sigma_sq


# Convenience alias matching the generic name.
ReferenceEK1 = ReferenceEK1ConstantDiffusion
