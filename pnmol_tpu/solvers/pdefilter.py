"""PDE-filter driver: state containers, solve loops, step acceptance.

Capability parity with ``/root/reference/src/pnmol/pdefilter.py`` — the same
public surface (``solve`` / ``simulate_final_state`` / ``solution_generator``,
info counters, diffusion quasi-MLE, ``stop_at`` time stops, progress bar) —
but the step loop is TPU-native:

* Constant steps: the whole trajectory is one ``lax.scan`` over a host-
  precomputed step schedule (static shapes, single compilation).
* Adaptive steps: ``simulate_final_state`` runs the full attempt/accept/
  reject loop inside one ``lax.while_loop``; nothing crosses the host
  boundary until the final state.
* A Python generator path remains for API parity and for callers that want
  to observe every step; it drives the same jitted attempt-step kernel.

Subclasses (the white-noise and latent-force EK1 solvers) implement
``initialize`` and ``attempt_step``; ``attempt_step`` must be a thin wrapper
over a jitted pure function so all loop styles share one compiled kernel.
"""

import dataclasses
from abc import ABC, abstractmethod
from typing import Dict, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pnmol_tpu import kernels
from pnmol_tpu.odetools import step as step_module
from pnmol_tpu.ops import rv


class PDEFilterState(NamedTuple):
    """Filter state at one time point (a JAX pytree)."""

    t: jnp.ndarray
    y: rv.MultivariateNormal
    error_estimate: Optional[jnp.ndarray]
    reference_state: Optional[jnp.ndarray]
    diffusion_squared_local: jnp.ndarray


@dataclasses.dataclass(frozen=False)
class PDESolution:
    t: jnp.ndarray
    mean: jnp.ndarray
    cov_sqrtm: jnp.ndarray
    info: Dict
    diffusion_squared_calibrated: float


def _empty_info():
    return dict(
        num_f_evaluations=0,
        num_df_evaluations=0,
        num_df_diagonal_evaluations=0,
        num_steps=0,
        num_attempted_steps=0,
    )


def constant_step_schedule(t0, tmax, dt):
    """Host-side step schedule for constant steps, landing exactly on tmax.

    Built in closed form rather than by incremental accumulation: float
    accumulation can leave a residual step of ~1e-16, and a near-zero dt is
    numerically *dangerous* here — the Nordsieck preconditioner scales by
    ``dt^-(nu+1/2)``, so a 1e-16 step costs ~5 digits of precision.
    """
    t0, tmax, dt = float(t0), float(tmax), float(dt)
    span = tmax - t0
    num_steps = max(1, int(np.ceil(span / dt - 1e-12)))
    ts = t0 + dt * np.arange(num_steps)
    dts = np.full(num_steps, dt)
    dts[-1] = tmax - ts[-1]
    # The ceil slack above is absolute; for very long schedules float error in
    # span/dt can still produce a degenerate final *sliver* (roundoff-sized,
    # not a genuine remainder step). Merge only slivers — a real remainder
    # like 0.1 for dt=0.3 must stay its own step, or the schedule would
    # silently overshoot the requested dt.
    if num_steps > 1 and dts[-1] < 1e-8 * dt:
        ts = ts[:-1]
        dts = dts[:-1]
        dts[-1] = tmax - ts[-1]
    return ts, dts


import functools


@functools.partial(
    jax.jit, static_argnames=("step_fn", "steprule", "rate")
)
def adaptive_attempt(step_fn, steprule, rate, t, mean, cov, dt, tmax):
    """One attempt + step-control decision: THE shared compiled unit of
    every adaptive driver (the Python generator and both lax.while_loop
    drivers call exactly this function), so all drivers follow
    bitwise-identical trajectories. Controller math compiled differently
    per driver (eager vs fused into a while body) reassociates reductions
    by a ulp, and the whitened-residual diffusion amplifies that through
    the near-singular innovation directions of noise-free boundary rows —
    observed as 40% diffusion divergence between drivers.

    Returns ``(t_new, mean_new, cov_new, dt_new, accepted, error, ref,
    diff_sq, scaled_error)`` — state outputs already masked by acceptance,
    error/ref/diff_sq raw from this attempt.
    """
    new_mean, new_cov, error, ref, diff_sq = step_fn(mean, cov, t + dt, dt)
    scaled = steprule.scale_error_estimate(dt * error, ref)
    accepted = steprule.is_accepted(scaled)
    suggested = steprule.suggest(dt, scaled, local_convergence_rate=rate)
    t_new = jnp.where(accepted, t + dt, t)
    mean_new = jnp.where(accepted, new_mean, mean)
    cov_new = jnp.where(accepted, new_cov, cov)
    dt_new = jnp.minimum(suggested, tmax - t_new)
    return t_new, mean_new, cov_new, dt_new, accepted, error, ref, diff_sq, scaled


class PDEFilter(ABC):
    """Filtering-based PDE solver interface."""

    def __init__(
        self,
        *,
        steprule=None,
        num_derivatives=2,
        spatial_kernel=None,
        diffuse_prior_scale=1e0,
    ):
        self.steprule = steprule or step_module.Adaptive()
        self.num_derivatives = num_derivatives
        self.spatial_kernel = (
            spatial_kernel
            if spatial_kernel is not None
            else kernels.Matern52() + kernels.WhiteNoise()
        )
        self.diffuse_prior_scale = diffuse_prior_scale

        # Filled by initialize(); E0/E1 are lazy per-solver properties.
        self.iwp = None

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(num_derivatives={self.num_derivatives}, "
            f"steprule={self.steprule}, spatial_kernel={self.spatial_kernel})"
        )

    # -- subclass contract ---------------------------------------------------

    @abstractmethod
    def initialize(self, pde) -> PDEFilterState:
        raise NotImplementedError

    @abstractmethod
    def attempt_step(self, state, dt, pde):
        raise NotImplementedError

    @property
    def supports_adaptive_steps(self):
        return True

    # -- public API ----------------------------------------------------------

    def solve(self, pde, /, *, stop_at=None, progressbar=False, max_steps=None):
        """Full-trajectory solve.

        Constant steps run as one ``lax.scan``. Adaptive steps run through
        the Python generator by default; passing ``max_steps`` opts into the
        fully-jitted bounded-buffer ``lax.while_loop`` path instead (raises
        if the solve needs more accepted steps than the buffer holds).
        """
        if isinstance(self.steprule, step_module.Constant) and stop_at is None:
            return self._solve_constant_scan(pde, progressbar=progressbar)
        if (
            max_steps is not None
            and stop_at is None
            and isinstance(self.steprule, step_module.Adaptive)
            and self.supports_adaptive_steps
        ):
            return self._solve_adaptive_whileloop(pde, max_steps=max_steps)
        return self._solve_generator(pde, stop_at=stop_at, progressbar=progressbar)

    def simulate_final_state(self, pde, /, *, stop_at=None, progressbar=False):
        if stop_at is None and isinstance(self.steprule, step_module.Constant):
            return self._final_state_constant_scan(pde)
        if (
            stop_at is None
            and isinstance(self.steprule, step_module.Adaptive)
            and self.supports_adaptive_steps
        ):
            return self._final_state_adaptive_whileloop(pde)
        # generic fallback
        state, info = None, None
        diffusion_squared_list = []
        for state, info in self.solution_generator(
            pde, stop_at=stop_at, progressbar=progressbar
        ):
            diffusion_squared_list.append(state.diffusion_squared_local)
        # Zero accepted steps (tmax within eps of t0): no calibration data;
        # leave the covariance unscaled rather than crashing on an empty stack.
        if len(diffusion_squared_list) > 1:
            diffusion = jnp.mean(jnp.stack(diffusion_squared_list[1:]))
        else:
            diffusion = jnp.asarray(1.0)
        cov_scaled = state.y.cov_sqrtm * jnp.sqrt(diffusion)
        return state._replace(y=state.y._replace(cov_sqrtm=cov_scaled)), info

    def solution_generator(self, pde, /, *, stop_at=None, progressbar=False):
        """Yield (state, info) per accepted step; Python-loop parity path."""
        if (
            not self.supports_adaptive_steps
            and not isinstance(self.steprule, step_module.Constant)
        ):
            raise ValueError(
                f"{type(self).__name__} provides no error estimate; use a "
                "Constant step rule (the latent-force solvers do not support "
                "adaptive steps, matching the reference)."
            )
        time_stopper = _TimeStopper(stop_at) if stop_at is not None else None
        state = self.initialize(pde)
        info = _empty_info()
        yield state, info

        dt = self.steprule.first_dt(pde)
        pbar = _make_progressbar(progressbar, pde.tmax)

        # epsilon guard: a residual step of ~1e-16 would blow up the
        # dt^-(nu+1/2) preconditioner (see constant_step_schedule)
        t_eps = 1e-12 * max(1.0, abs(float(pde.tmax)))
        while float(pde.tmax) - float(state.t) > t_eps:
            if pbar is not None:
                pbar.advance_to(float(state.t), dt=float(dt))
            if time_stopper is not None:
                dt = time_stopper.adjust_dt_to_time_stops(float(state.t), dt)

            state, dt, step_info = self.perform_full_step(state, dt, pde)
            info["num_steps"] += 1
            for key in (
                "num_f_evaluations",
                "num_df_evaluations",
                "num_df_diagonal_evaluations",
                "num_attempted_steps",
            ):
                info[key] += step_info.get(key, 0)
            yield state, info

        if pbar is not None:
            pbar.close(float(state.t), dt=float(dt))

    def perform_full_step(self, state, initial_dt, pde):
        """One accepted step, including the attempt/reject loop.

        Adaptive rules drive the SAME jitted :func:`adaptive_attempt` unit
        as the while_loop drivers, so the generator path follows a
        bitwise-identical trajectory (the consistency the driver tests
        pin). Constant rules keep the plain attempt path.
        """
        if isinstance(self.steprule, step_module.Adaptive):
            return self._perform_full_step_adaptive(state, initial_dt, pde)
        dt = initial_dt
        step_info = dict(
            num_f_evaluations=0,
            num_df_evaluations=0,
            num_df_diagonal_evaluations=0,
            num_attempted_steps=0,
        )
        accepted = False
        proposed_state = None
        while not accepted:
            proposed_state, attempt_info = self.attempt_step(state, dt, pde)
            step_info["num_attempted_steps"] += 1
            for key in (
                "num_f_evaluations",
                "num_df_evaluations",
                "num_df_diagonal_evaluations",
            ):
                step_info[key] += attempt_info.get(key, 0)

            scaled_error = self.steprule.scale_error_estimate(
                unscaled_error_estimate=(
                    dt * proposed_state.error_estimate
                    if proposed_state.error_estimate is not None
                    else None
                ),
                reference_state=proposed_state.reference_state,
            )
            accepted = bool(self.steprule.is_accepted(scaled_error))
            suggested_dt = self.steprule.suggest(
                dt, scaled_error, local_convergence_rate=self.num_derivatives + 1
            )
            if accepted:
                dt = min(float(suggested_dt), float(pde.tmax) - float(proposed_state.t))
            else:
                dt = min(float(suggested_dt), float(pde.tmax) - float(state.t))
            assert dt >= 0, f"Invalid step size: dt={dt}"

        return proposed_state, dt, step_info

    def _perform_full_step_adaptive(self, state, initial_dt, pde):
        step_fn = self._step_function(pde)
        rate = self.num_derivatives + 1
        dt = jnp.asarray(initial_dt)
        tmax = jnp.asarray(pde.tmax, dt.dtype)
        step_info = dict(
            num_f_evaluations=0,
            num_df_evaluations=0,
            num_df_diagonal_evaluations=0,
            num_attempted_steps=0,
        )
        t = state.t
        mean, cov = state.y.mean, state.y.cov_sqrtm
        accepted = False
        while not accepted:
            t_new, mean_new, cov_new, dt_new, acc, error, ref, diff_sq, _ = (
                adaptive_attempt(
                    step_fn, self.steprule, rate, t, mean, cov, dt, tmax
                )
            )
            step_info["num_attempted_steps"] += 1
            step_info["num_f_evaluations"] += 1
            step_info["num_df_evaluations"] += 1
            accepted = bool(acc)
            t, mean, cov, dt = t_new, mean_new, cov_new, dt_new
            if not bool(jnp.isfinite(dt)):
                # A NaN attempt is always rejected (NaN error compares
                # False) and the masked state stays finite — the non-finite
                # suggested dt is the divergence signal. Raising here keeps
                # the accept/reject loop from spinning forever.
                raise FloatingPointError(
                    f"Adaptive solve diverged at t={float(t):.6g}: the "
                    "attempted step produced a non-finite error estimate "
                    "(step size suggestion is NaN). Reduce dt/tolerances "
                    "or use utils.resilience.solve_resilient."
                )
            assert float(dt) >= 0, f"Invalid step size: dt={float(dt)}"
        new_state = PDEFilterState(
            t=t,
            y=rv.MultivariateNormal(mean=mean, cov_sqrtm=cov),
            error_estimate=error,
            reference_state=ref,
            diffusion_squared_local=diff_sq,
        )
        return new_state, dt, step_info

    # -- jitted fast paths ----------------------------------------------------
    # Subclasses provide _scan_attempt(carry, t_next, dt) via make_step_fn().

    @abstractmethod
    def _step_function(self, pde):
        """Return a jitted pure function ``(mean, cov, t_next, dt) ->
        (mean, cov, error, reference, diffusion_sq_local)``.

        Must be called after ``initialize``.
        """
        raise NotImplementedError

    def _solve_constant_scan(self, pde, progressbar=False):
        state0 = self.initialize(pde)
        dt0 = self.steprule.first_dt(pde)
        ts_prev, dts = constant_step_schedule(pde.t0, pde.tmax, dt0)
        ts_next = ts_prev + dts
        step_fn = self._step_function(pde)

        def body(carry, xs):
            mean, cov = carry
            t_next, dt = xs
            mean, cov, error, ref, diff_sq = step_fn(mean, cov, t_next, dt)
            return (mean, cov), (mean, cov, diff_sq)

        (_, _), (means, covs, diffs) = jax.lax.scan(
            body,
            (state0.y.mean, state0.y.cov_sqrtm),
            (jnp.asarray(ts_next), jnp.asarray(dts)),
        )

        num_steps = len(dts)
        info = dict(
            num_f_evaluations=num_steps,
            num_df_evaluations=num_steps,
            num_df_diagonal_evaluations=0,
            num_steps=num_steps,
            num_attempted_steps=num_steps,
        )
        full_ts = jnp.concatenate((jnp.asarray([pde.t0]), jnp.asarray(ts_next)))
        full_means = jnp.concatenate((state0.y.mean[None], means))
        full_covs = jnp.concatenate((state0.y.cov_sqrtm[None], covs))
        return PDESolution(
            t=full_ts,
            mean=full_means,
            cov_sqrtm=full_covs,
            info=info,
            diffusion_squared_calibrated=jnp.mean(diffs),
        )

    def _final_state_constant_scan(self, pde):
        state0 = self.initialize(pde)
        dt0 = self.steprule.first_dt(pde)
        ts_prev, dts = constant_step_schedule(pde.t0, pde.tmax, dt0)
        ts_next = ts_prev + dts
        step_fn = self._step_function(pde)

        def body(carry, xs):
            mean, cov, diff_sum = carry
            t_next, dt = xs
            mean, cov, error, ref, diff_sq = step_fn(mean, cov, t_next, dt)
            return (mean, cov, diff_sum + diff_sq), None

        (mean, cov, diff_sum), _ = jax.lax.scan(
            body,
            (state0.y.mean, state0.y.cov_sqrtm, jnp.zeros(())),
            (jnp.asarray(ts_next), jnp.asarray(dts)),
        )
        num_steps = len(dts)
        diffusion = diff_sum / num_steps
        info = dict(
            num_f_evaluations=num_steps,
            num_df_evaluations=num_steps,
            num_df_diagonal_evaluations=0,
            num_steps=num_steps,
            num_attempted_steps=num_steps,
        )
        final = PDEFilterState(
            t=jnp.asarray(ts_next[-1]),
            y=rv.MultivariateNormal(mean=mean, cov_sqrtm=cov * jnp.sqrt(diffusion)),
            error_estimate=None,
            reference_state=None,
            diffusion_squared_local=diff_sum / num_steps,
        )
        return final, info

    def _final_state_adaptive_whileloop(self, pde):
        state0 = self.initialize(pde)
        dt0 = jnp.asarray(self.steprule.first_dt(pde))
        step_fn = self._step_function(pde)
        steprule = self.steprule
        tmax = pde.tmax
        rate = self.num_derivatives + 1

        # Same residual-step epsilon guard as _solve_adaptive_whileloop: an
        # exact `t < tmax` can demand a ~1e-16 closing step whose dt^-(nu+1/2)
        # preconditioner scaling destroys ~5 digits of precision.
        t_eps = 1e-12 * max(1.0, abs(float(tmax)))

        def cond(carry):
            t, dt = carry[0], carry[3]
            # isfinite(dt): a NaN attempt is permanently rejected (NaN error
            # compares False) and t stops advancing — without this escape
            # the compiled loop would spin on device forever. The host-side
            # check after the loop turns the early exit into an error.
            return (tmax - t > t_eps) & jnp.isfinite(dt)

        def body(carry):
            t, mean, cov, dt, diff_sum, n_steps, n_attempts = carry
            t_new, mean_new, cov_new, dt_new, accepted, _, _, diff_sq, _ = (
                adaptive_attempt(
                    step_fn, steprule, rate, t, mean, cov, dt,
                    jnp.asarray(tmax, dt.dtype),
                )
            )
            diff_new = diff_sum + jnp.where(accepted, diff_sq, 0.0)
            return (
                t_new,
                mean_new,
                cov_new,
                dt_new,
                diff_new,
                n_steps + accepted.astype(jnp.int32),
                n_attempts + 1,
            )

        carry0 = (
            jnp.asarray(pde.t0, dtype=dt0.dtype),
            state0.y.mean,
            state0.y.cov_sqrtm,
            dt0,
            jnp.zeros((), dtype=dt0.dtype),
            jnp.zeros((), dtype=jnp.int32),
            jnp.zeros((), dtype=jnp.int32),
        )
        t, mean, cov, dt, diff_sum, n_steps, n_attempts = jax.lax.while_loop(
            cond, body, carry0
        )
        if not bool(jnp.isfinite(dt)):
            raise FloatingPointError(
                f"Adaptive solve diverged at t={float(t):.6g}: the attempted "
                "step produced a non-finite error estimate. Reduce "
                "dt/tolerances or use utils.resilience.solve_resilient."
            )
        diffusion = diff_sum / jnp.maximum(n_steps, 1)
        info = dict(
            num_f_evaluations=int(n_attempts),
            num_df_evaluations=int(n_attempts),
            num_df_diagonal_evaluations=0,
            num_steps=int(n_steps),
            num_attempted_steps=int(n_attempts),
        )
        final = PDEFilterState(
            t=t,
            y=rv.MultivariateNormal(mean=mean, cov_sqrtm=cov * jnp.sqrt(diffusion)),
            error_estimate=None,
            reference_state=None,
            diffusion_squared_local=diffusion,
        )
        return final, info

    def _solve_adaptive_whileloop(self, pde, *, max_steps):
        """Adaptive full-trajectory solve in ONE lax.while_loop: accepted
        states are written into preallocated buffers (no host sync per step)."""
        state0 = self.initialize(pde)
        dt0 = jnp.asarray(self.steprule.first_dt(pde))
        step_fn = self._step_function(pde)
        steprule = self.steprule
        tmax = float(pde.tmax)
        t_eps = 1e-12 * max(1.0, abs(tmax))
        rate = self.num_derivatives + 1

        mean0, cov0 = state0.y.mean, state0.y.cov_sqrtm
        buf_t = jnp.zeros((max_steps + 1,), dtype=dt0.dtype).at[0].set(pde.t0)
        buf_mean = jnp.zeros((max_steps + 1,) + mean0.shape, mean0.dtype).at[0].set(mean0)
        buf_cov = jnp.zeros((max_steps + 1,) + cov0.shape, cov0.dtype).at[0].set(cov0)
        buf_diff = jnp.zeros((max_steps + 1,), dtype=dt0.dtype)

        def cond(carry):
            t, _, _, dt, *_, idx, _ = carry
            # isfinite(dt): divergence escape — see _final_state_adaptive_whileloop
            return (tmax - t > t_eps) & (idx < max_steps) & jnp.isfinite(dt)

        def body(carry):
            t, mean, cov, dt, bt, bm, bc, bd, idx, n_att = carry
            t_new, mean_new, cov_new, dt_new, accepted, _, _, diff_sq, _ = (
                adaptive_attempt(
                    step_fn, steprule, rate, t, mean, cov, dt,
                    jnp.asarray(tmax, dt.dtype),
                )
            )
            idx_new = idx + accepted.astype(jnp.int32)
            write = idx_new  # only moves when accepted
            bt = bt.at[write].set(jnp.where(accepted, t_new, bt[write]))
            bm = bm.at[write].set(jnp.where(accepted, mean_new, bm[write]))
            bc = bc.at[write].set(jnp.where(accepted, cov_new, bc[write]))
            bd = bd.at[write].set(jnp.where(accepted, diff_sq, bd[write]))
            return (t_new, mean_new, cov_new, dt_new, bt, bm, bc, bd, idx_new, n_att + 1)

        carry0 = (
            jnp.asarray(pde.t0, dt0.dtype),
            mean0,
            cov0,
            dt0,
            buf_t,
            buf_mean,
            buf_cov,
            buf_diff,
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        )
        t, _, _, dt_out, bt, bm, bc, bd, idx, n_att = jax.lax.while_loop(
            cond, body, carry0
        )

        num_steps = int(idx)
        if not bool(jnp.isfinite(dt_out)):
            raise FloatingPointError(
                f"Adaptive solve diverged at t={float(t):.6g}: the attempted "
                "step produced a non-finite error estimate. Reduce "
                "dt/tolerances or use utils.resilience.solve_resilient."
            )
        if tmax - float(t) > t_eps:
            raise RuntimeError(
                f"Adaptive solve needed more than max_steps={max_steps} accepted "
                f"steps (reached t={float(t):.6g} of {tmax}); raise max_steps or "
                "use simulate_final_state/solution_generator."
            )
        sl = slice(0, num_steps + 1)
        info = dict(
            num_f_evaluations=int(n_att),
            num_df_evaluations=int(n_att),
            num_df_diagonal_evaluations=0,
            num_steps=num_steps,
            num_attempted_steps=int(n_att),
        )
        return PDESolution(
            t=bt[sl],
            mean=bm[sl],
            cov_sqrtm=bc[sl],
            info=info,
            diffusion_squared_calibrated=jnp.sum(bd) / max(num_steps, 1),
        )

    def _solve_generator(self, pde, *, stop_at=None, progressbar=False):
        times, means, cov_sqrtms, diffusions = [], [], [], []
        info = _empty_info()
        first = True
        for state, info in self.solution_generator(
            pde, stop_at=stop_at, progressbar=progressbar
        ):
            times.append(state.t)
            means.append(state.y.mean)
            cov_sqrtms.append(state.y.cov_sqrtm)
            if not first:
                diffusions.append(state.diffusion_squared_local)
            first = False
        return PDESolution(
            t=jnp.stack([jnp.asarray(t) for t in times]),
            mean=jnp.stack(means),
            cov_sqrtm=jnp.stack(cov_sqrtms),
            info=info,
            diffusion_squared_calibrated=(
                jnp.mean(jnp.stack(diffusions)) if diffusions else jnp.asarray(1.0)
            ),
        )


class _TimeStopper:
    """Clamp dt so the solver lands exactly on requested output times."""

    def __init__(self, locations: Iterable):
        self._locations = iter(locations)
        self._next_location = next(self._locations)

    def adjust_dt_to_time_stops(self, t, dt):
        if t >= self._next_location:
            try:
                self._next_location = next(self._locations)
            except StopIteration:
                self._next_location = np.inf
        if t + dt > self._next_location:
            dt = self._next_location - t
        return dt


class _ProgressBar:
    def __init__(self, tmax, steps=100):
        import tqdm

        self._tmax = float(tmax)
        self._increment = self._tmax / steps
        self._threshold = self._increment
        self._bar = tqdm.tqdm(total=steps)

    def advance_to(self, t, dt):
        while t + dt >= self._threshold:
            self._bar.update()
            self._threshold += self._increment
        self._bar.set_description(f"t={t:.4f}, dt={dt:.2E}")

    def close(self, t, dt):
        self._bar.update()
        self._bar.set_description(f"t={t:.4f}, dt={dt:.2E}")
        self._bar.close()


def _make_progressbar(enabled, tmax):
    if not enabled:
        return None
    try:
        return _ProgressBar(tmax)
    except ImportError:
        return None
