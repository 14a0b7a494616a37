"""Initialization routines for ODE/PDE filters.

Capability parity with ``/root/reference/src/pnmol/odetools/init.py``:

* :class:`TaylorMode` — exact solution derivatives at t0 via Taylor-mode AD
  (``jax.experimental.jet``) on the autonomized system.
* :class:`RungeKutta` — fit the Nordsieck stack to a few Runge-Kutta steps
  with a 1-D preconditioned Kalman filter + square-root smoother. The
  reference generates the RK data through a host-side
  ``scipy.integrate.solve_ivp`` call (``init.py:126-142``); this build uses
  an in-house fixed-step Dormand-Prince(5) integrator under ``lax.scan`` so
  the whole routine stays on-device and jittable.
* :class:`Stack` — [y0, f(y0), df.f(y0), 0, ...] with large variance on the
  unknown rows.
"""

import abc


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.jet import jet

from pnmol_tpu.ops import iwp, kalman, sqrt


class InitializationRoutine(abc.ABC):
    @abc.abstractmethod
    def __call__(self, f, df, y0, t0, num_derivatives, wp_diffusion_sqrtm):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Taylor-mode initialization
# ---------------------------------------------------------------------------


class TaylorMode(InitializationRoutine):
    def __call__(self, f, df, y0, t0, num_derivatives, wp_diffusion_sqrtm=None):
        m0 = TaylorMode.taylor_mode(fun=f, y0=y0, t0=t0, num_derivatives=num_derivatives)
        return m0, jnp.zeros((num_derivatives + 1, num_derivatives + 1))

    def __repr__(self):
        return f"{self.__class__.__name__}()"

    @staticmethod
    def taylor_mode(fun, y0, t0, num_derivatives):
        """Exact derivatives of the ODE solution at t0 via Taylor-mode AD.

        The state is extended with time, making the system autonomous
        (reference: ``init.py:31-99``); repeated ``jet`` calls then propagate
        Taylor coefficients to the requested order.
        """
        extended_state = jnp.concatenate((jnp.ravel(y0), jnp.array([t0])))

        def autonomous_ode(z):
            y, t = jnp.reshape(z[:-1], y0.shape), z[-1]
            dy = jnp.ravel(fun(t, y))
            return jnp.concatenate((dy, jnp.array([1.0])))

        derivs = [y0]
        if num_derivatives == 0:
            return jnp.stack(derivs)

        series = (jnp.ones_like(extended_state),)
        primal_out, coeffs = jet(autonomous_ode, primals=(extended_state,), series=(series,))
        derivs.append(primal_out[:-1])
        taylor_coefficients = (primal_out, *coeffs)
        if num_derivatives == 1:
            return jnp.stack(derivs)

        for _ in range(1, num_derivatives):
            primal_out, coeffs = jet(
                autonomous_ode, primals=(extended_state,), series=(taylor_coefficients,)
            )
            taylor_coefficients = (primal_out, *coeffs)
            derivs.append(taylor_coefficients[-2][:-1])
        return jnp.stack(derivs)


# ---------------------------------------------------------------------------
# Stack initialization
# ---------------------------------------------------------------------------


class Stack(InitializationRoutine):
    def __init__(self, use_df=True):
        self.use_df = use_df

    def __call__(self, f, df, y0, t0, num_derivatives, wp_diffusion_sqrtm=None):
        d = y0.shape[0]
        n = num_derivatives + 1
        fy = f(t0, y0)
        if self.use_df:
            rows = [y0, fy, df(t0, y0) @ fy]
        else:
            rows = [y0, fy]
        known = len(rows)
        mean = jnp.stack(rows + [jnp.zeros(d)] * (n - known))
        cov_sqrtm = jnp.diag(jnp.array([0.0] * known + [1e3] * (n - known)))
        return mean, cov_sqrtm


# ---------------------------------------------------------------------------
# Runge-Kutta initialization
# ---------------------------------------------------------------------------

# Dormand-Prince 5(4) Butcher tableau (the classic RK45 pair's 5th-order row).
# Host numpy constants: module-level jnp arrays would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize (the
# multi-host seam requires the library to be importable first).
_DP_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DP_A = np.array(
    [
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [1 / 5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        [3 / 40, 9 / 40, 0.0, 0.0, 0.0, 0.0, 0.0],
        [44 / 45, -56 / 15, 32 / 9, 0.0, 0.0, 0.0, 0.0],
        [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0.0, 0.0, 0.0],
        [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656, 0.0, 0.0],
        [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0],
    ]
)
_DP_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])


def rk_step_dopri5(f, t, y, dt):
    """One fixed-step Dormand-Prince(5) step."""
    ks = []
    for i in range(7):
        yi = y
        for j, k in enumerate(ks):
            yi = yi + dt * _DP_A[i, j] * k
        ks.append(f(t + _DP_C[i] * dt, yi))
    k_stack = jnp.stack(ks)
    return y + dt * (_DP_B @ k_stack)


class RungeKutta(InitializationRoutine):
    def __init__(self, dt=0.01, method="RK45", use_df=True):
        self.dt = dt
        self.method = method  # kept for API parity; dopri5 is always used
        self.stack_initvals = Stack(use_df=use_df)

    def __repr__(self):
        return f"{self.__class__.__name__}(dt={self.dt}, method={self.method})"

    def __call__(self, f, df, y0, t0, num_derivatives, wp_diffusion_sqrtm):
        num_steps = num_derivatives + 1
        ts, ys = self.rk_data(f=f, t0=t0, dt=self.dt, num_steps=num_steps, y0=y0)
        m, sc = self.stack_initvals(
            f=f, df=df, y0=y0, t0=t0, num_derivatives=num_derivatives
        )
        return RungeKutta.rk_init_improve(
            m=m, sc=sc, t0=t0, ts=ts, ys=ys, wp_diffusion_sqrtm=wp_diffusion_sqrtm
        )

    @staticmethod
    def rk_data(f, t0, dt, num_steps, y0):
        """Fixed-step Dormand-Prince trajectory at t0 + k*dt, k=0..num_steps-1."""
        ts = t0 + dt * jnp.arange(num_steps)

        def step(y, t):
            y_next = rk_step_dopri5(f, t, y, dt)
            return y_next, y_next

        _, ys_tail = jax.lax.scan(step, y0, ts[:-1])
        ys = jnp.concatenate((y0[None], ys_tail), axis=0)
        return ts, ys

    @staticmethod
    def rk_init_improve(m, sc, t0, ts, ys, wp_diffusion_sqrtm):
        """Fit the Nordsieck stack to RK data: 1-D preconditioned Kalman filter
        forward, square-root smoother backward (reference: ``init.py:146-222``)."""
        num_derivatives = m.shape[0] - 1
        prior = iwp.IntegratedWienerTransition(
            num_derivatives=num_derivatives,
            wiener_process_dimension=m.shape[1] // 2,
            wp_diffusion_sqrtm=wp_diffusion_sqrtm,
        )
        phi_1d, sq_1d = prior.preconditioned_discretize_1d

        # Forward filtering pass, keeping all intermediates for smoothing.
        filter_res = [(m, sc, None, None, None, None, None, None)]
        t_loc = t0
        for t, y in zip(ts[1:], ys[1:]):
            dt = t - t_loc
            p_raw, p_inv_raw = prior.nordsieck_preconditioner_1d_raw(dt)
            m, sc, m_pred, sc_pred, sgain, x = RungeKutta._forward_filter_step(
                y, sc, m, sq_1d, p_raw, p_inv_raw, phi_1d
            )
            filter_res.append((m, sc, sgain, m_pred, sc_pred, x, p_raw, p_inv_raw))
            t_loc = t

        # Backward smoothing pass.
        m_fut, sc_fut, sgain_fut, m_pred, _, x, p_raw, p_inv_raw = filter_res[-1]
        for entry in reversed(filter_res[:-1]):
            m_, sc_ = entry[0], entry[1]
            m_pre, sc_pre = p_inv_raw[:, None] * m_, p_inv_raw[:, None] * sc_
            m_fut_pre = p_inv_raw[:, None] * m_fut
            sc_fut_pre = p_inv_raw[:, None] * sc_fut

            m_sm, sc_sm = kalman.smoother_step_sqrt(
                mean=m_pre,
                cov_l=sc_pre,
                mean_next=m_fut_pre,
                cov_l_next=sc_fut_pre,
                smoothing_gain=sgain_fut,
                proc_noise_l=sq_1d,
                mean_pred=m_pred,
                transited_l=x,
            )
            m_fut, sc_fut = p_raw[:, None] * m_sm, p_raw[:, None] * sc_sm
            _, _, sgain_fut, m_pred, _, x, p_raw, p_inv_raw = entry

        return m_fut, sc_fut

    @staticmethod
    @jax.jit
    def _forward_filter_step(y, sc, m, sq_1d, p_raw, p_inv_raw, phi_1d):
        """One preconditioned predict + observe-0th-derivative update, batched
        over the state dimension by broadcasting."""
        # into preconditioned coordinates
        m = p_inv_raw[:, None] * m
        sc = p_inv_raw[:, None] * sc

        # predict
        m_pred = phi_1d @ m
        x = phi_1d @ sc
        sc_pred = sqrt.propagate_cholesky_factor(x, sq_1d)

        # smoothing gain
        cross = sc @ x.T
        sgain = jax.scipy.linalg.cho_solve((sc_pred, True), cross.T).T

        # observe the 0th derivative in non-preconditioned coordinates
        sc_pred_np = p_raw[:, None] * sc_pred
        h_sc_pred = sc_pred_np[0, :]
        s = h_sc_pred @ h_sc_pred.T
        cross_obs = sc_pred @ h_sc_pred.T
        kgain = cross_obs / s
        z = (p_raw[:, None] * m_pred)[0]

        m_loc = m_pred - kgain[:, None] * (z - y)[None, :]
        sc_loc = sc_pred - kgain[:, None] * h_sc_pred[None, :]

        # back to non-preconditioned coordinates
        return (
            p_raw[:, None] * m_loc,
            p_raw[:, None] * sc_loc,
            m_pred,
            sc_pred,
            sgain,
            x,
        )
