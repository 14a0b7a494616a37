"""Non-probabilistic reference integrator: adaptive Dormand-Prince 5(4) in JAX.

Ground-truth generator for the experiment scripts, replacing the reference's
host-side ``scipy.integrate.solve_ivp`` calls (``experiments/figure1.py:60``,
``figure3.py:22-24``, ``figure4.py:35-43``). Runs fully on-device: the
adaptive loop is one ``lax.while_loop`` with dense output accumulated by
4th-order Hermite interpolation onto a fixed ``t_eval`` grid (static shapes).

For very stiff systems scipy's LSODA remains available host-side — the
experiment layer chooses; this module is the TPU-native default.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pnmol_tpu.odetools.init import _DP_A, _DP_B, _DP_C

# 4th-order embedded weights of the Dormand-Prince pair.
# host numpy: keep import time backend-free (see odetools.init note)
_DP_B4 = np.array(
    [
        5179 / 57600,
        0.0,
        7571 / 16695,
        393 / 640,
        -92097 / 339200,
        187 / 2100,
        1 / 40,
    ]
)


class IVPSolution(NamedTuple):
    t: jnp.ndarray
    y: jnp.ndarray
    num_steps: jnp.ndarray


def _dp_step(f, t, y, dt):
    """One Dormand-Prince step: 5th-order solution, error estimate, last slope."""
    ks = []
    for i in range(7):
        yi = y
        for j, k in enumerate(ks):
            yi = yi + dt * _DP_A[i, j] * k
        ks.append(f(t + _DP_C[i] * dt, yi))
    k_stack = jnp.stack(ks)
    y5 = y + dt * jnp.tensordot(_DP_B.astype(y.dtype), k_stack, axes=1)
    y4 = y + dt * jnp.tensordot(_DP_B4.astype(y.dtype), k_stack, axes=1)
    return y5, y5 - y4, ks[0], ks[-1]


def solve_ivp_dopri5(f, t_span, y0, t_eval, rtol=1e-8, atol=1e-10, max_steps=100_000):
    """Adaptive DP5(4) with dense output on a fixed evaluation grid.

    Returns ``IVPSolution(t_eval, y_at_t_eval, num_steps)``. Jittable; the
    evaluation grid gives the static output shape.
    """
    t0, tmax = t_span
    y0 = jnp.asarray(y0)
    t_eval = jnp.asarray(t_eval, dtype=y0.dtype)
    n_eval = t_eval.shape[0]

    def error_norm(err, y_old, y_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(y_old), jnp.abs(y_new))
        return jnp.sqrt(jnp.mean((err / scale) ** 2))

    f0 = f(t0, y0)
    dt0 = 0.01 * jnp.linalg.norm(y0) / (jnp.linalg.norm(f0) + 1e-30)
    dt0 = jnp.where(jnp.isfinite(dt0) & (dt0 > 0), dt0, 1e-6)

    def hermite(t_q, t, dt, y_old, y_new, f_old, f_new):
        """Cubic Hermite interpolation on [t, t+dt]."""
        s = (t_q - t) / dt
        h00 = (1 + 2 * s) * (1 - s) ** 2
        h10 = s * (1 - s) ** 2
        h01 = s**2 * (3 - 2 * s)
        h11 = s**2 * (s - 1)
        return (
            h00 * y_old + h10 * dt * f_old + h01 * y_new + h11 * dt * f_new
        )

    State = tuple  # (t, y, f_now, dt, out (n_eval, d), idx, steps)

    def cond(state):
        t, y, f_now, dt, out, idx, steps = state
        return (t < tmax) & (steps < max_steps)

    def body(state):
        t, y, f_now, dt, out, idx, steps = state
        dt_clamped = jnp.minimum(dt, tmax - t)
        y_new, err, f_old, f_new = _dp_step(f, t, y, dt_clamped)
        norm = error_norm(err, y, y_new)
        accept = norm <= 1.0

        # fill all t_eval points inside (t, t+dt]
        t_next = t + dt_clamped

        def fill(out):
            in_window = (t_eval > t) & (t_eval <= t_next)
            interp = jax.vmap(
                lambda tq: hermite(tq, t, dt_clamped, y, y_new, f_old, f_new)
            )(t_eval)
            return jnp.where(in_window[:, None], interp, out)

        out = jax.lax.cond(accept, fill, lambda o: o, out)
        t = jnp.where(accept, t_next, t)
        y = jnp.where(accept, y_new, y)
        f_now = jnp.where(accept, f_new, f_now)

        factor = jnp.clip(0.9 * norm ** (-0.2), 0.2, 10.0)
        dt = dt_clamped * factor
        return (t, y, f_now, dt, out, idx, steps + 1)

    # NaN-initialized output: if the step budget is exhausted before tmax
    # (stiff systems), unreached evaluation points stay NaN — a visible
    # failure instead of silently returning zeros.
    out0 = jnp.full((n_eval, y0.shape[0]), jnp.nan, dtype=y0.dtype)
    # points at/below t0 take the initial value
    out0 = jnp.where((t_eval <= t0)[:, None], y0[None, :], out0)

    t, y, f_now, dt, out, idx, steps = jax.lax.while_loop(
        cond, body, (jnp.asarray(t0, y0.dtype), y0, f0, dt0, out0, 0, 0)
    )
    return IVPSolution(t=t_eval, y=out, num_steps=steps)


def solve_ivp_stiff(f, t_span, y0, t_eval, rtol=1e-10, atol=1e-10, jac=None):
    """Host-side stiff reference integrator (scipy LSODA).

    Explicit RK is the wrong tool for fine-dx reaction-diffusion ground
    truths (the diffusion eigenvalue ~ dx^-2 forces ~1e5+ steps); the
    experiment layer uses this for those — exactly what the reference does
    (``/root/reference/experiments/figure3.py:22-24``, ``figure4.py:35-43``).
    Pass ``jac`` (callable (t, y) -> (d, d)) to avoid LSODA's d extra
    f-evaluations per Jacobian; same IVPSolution contract as
    :func:`solve_ivp_dopri5` (num_steps reports nfev).
    """
    from scipy.integrate import solve_ivp as scipy_solve_ivp

    y0_np = np.asarray(y0)
    kwargs = {}
    if jac is not None:
        kwargs["jac"] = lambda t, y: np.asarray(jac(t, jnp.asarray(y)))
    sol = scipy_solve_ivp(
        lambda t, y: np.asarray(f(t, jnp.asarray(y))),
        (float(t_span[0]), float(t_span[1])),
        y0_np,
        method="LSODA",
        rtol=rtol,
        atol=atol,
        t_eval=np.asarray(t_eval),
        **kwargs,
    )
    if not sol.success:  # pragma: no cover - scipy failure surface
        raise RuntimeError(f"LSODA reference solve failed: {sol.message}")
    return IVPSolution(
        t=jnp.asarray(sol.t),
        y=jnp.asarray(sol.y.T),
        num_steps=jnp.asarray(sol.nfev),
    )
