"""Failure detection and recovery for long solves.

The reference's only retry machinery is adaptive step rejection
(SURVEY.md §5). This module adds production-grade resilience on top of the
drivers: periodic checkpointing, NaN/Inf detection at step granularity, and
automatic restart from the last good state with a reduced step size.
"""

import dataclasses
import pathlib
from typing import Optional

import jax.numpy as jnp

from pnmol_tpu.odetools import step as step_module
from pnmol_tpu.utils import checkpoint as checkpoint_module


@dataclasses.dataclass
class ResilienceReport:
    num_steps: int = 0
    num_checkpoints: int = 0
    num_failures: int = 0
    num_restarts: int = 0
    final_dt: Optional[float] = None


def _state_is_finite(state):
    return bool(
        jnp.all(jnp.isfinite(state.y.mean)) and jnp.all(jnp.isfinite(state.y.cov_sqrtm))
    )


def solve_resilient(
    solver,
    pde,
    *,
    checkpoint_dir,
    checkpoint_every=50,
    max_restarts=3,
    dt_backoff=0.5,
):
    """Run ``solver`` on ``pde`` to ``tmax`` with checkpoint/restart.

    Steps through the jitted attempt-step kernel; every ``checkpoint_every``
    accepted steps the state is persisted. A non-finite state triggers a
    reload of the last checkpoint and a restart with ``dt * dt_backoff``.
    Returns ``(final_state, ResilienceReport)``.

    Adaptive rules are supported (round-3 addition; the round-2 version
    raised NotImplementedError here): attempts run through the SAME jitted
    :func:`pnmol_tpu.solvers.pdefilter.adaptive_attempt` unit the drivers
    share (no duplicated controller math), with NaN detection at attempt
    granularity — a non-finite attempt can never loop the accept/reject
    controller forever, because it restarts from the checkpoint instead.
    """
    from pnmol_tpu.solvers import pdefilter as pdefilter_module

    adaptive = isinstance(solver.steprule, step_module.Adaptive)
    if not adaptive and not isinstance(solver.steprule, step_module.Constant):
        raise NotImplementedError(
            "solve_resilient requires a Constant or Adaptive step rule."
        )
    if adaptive and not solver.supports_adaptive_steps:
        raise ValueError(f"{type(solver).__name__} has no error estimate.")

    checkpoint_dir = pathlib.Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    report = ResilienceReport()

    state = solver.initialize(pde)
    if adaptive:
        dt = float(solver.steprule.first_dt(pde))
        step_fn = solver._step_function(pde)
        rate = solver.num_derivatives + 1
    else:
        dt = float(solver.steprule.dt)
    ckpt_path = checkpoint_dir / "latest"
    checkpoint_module.save_state(ckpt_path, state, extra={"dt": jnp.asarray(dt)})
    report.num_checkpoints += 1

    diffusion_sum, diffusion_count = 0.0, 0
    restarts = 0
    steps_since_ckpt = 0

    tmax = float(pde.tmax)
    t_eps = 1e-12 * max(1.0, abs(tmax))

    def _restart():
        nonlocal state, dt, restarts, steps_since_ckpt
        report.num_failures += 1
        if restarts >= max_restarts:
            raise FloatingPointError(
                f"Solve diverged at t={float(state.t):.6g} after "
                f"{max_restarts} restarts."
            )
        restarts += 1
        report.num_restarts += 1
        state, extra = checkpoint_module.load_state(ckpt_path)
        dt = float(extra.get("dt", jnp.asarray(dt))) * dt_backoff
        steps_since_ckpt = 0

    while tmax - float(state.t) > t_eps:
        this_dt = min(dt, tmax - float(state.t))

        if adaptive:
            # one ACCEPTED step via the shared adaptive_attempt unit, with
            # NaN policing per attempt
            t_c = state.t
            mean_c, cov_c = state.y.mean, state.y.cov_sqrtm
            dt_c = jnp.asarray(this_dt, mean_c.dtype)
            failed = False
            while True:
                (t_c, mean_c, cov_c, dt_c, acc, error, ref, diff_sq, _) = (
                    pdefilter_module.adaptive_attempt(
                        step_fn, solver.steprule, rate, t_c, mean_c, cov_c,
                        dt_c, jnp.asarray(tmax, mean_c.dtype),
                    )
                )
                # A NaN-producing attempt is always REJECTED (NaN error
                # compares False), and adaptive_attempt masks the rejected
                # state back to the old finite values — so the state check
                # alone never fires for it. The controller outputs (dt, the
                # raw error estimate) are NOT masked: a non-finite dt/error
                # is the rejected-NaN-attempt signature and must restart,
                # or the accept/reject loop spins forever with dt = NaN.
                if not bool(
                    jnp.all(jnp.isfinite(mean_c))
                    and jnp.all(jnp.isfinite(cov_c))
                    and jnp.isfinite(dt_c)
                    and jnp.all(jnp.isfinite(error))
                ):
                    failed = True
                    break
                if bool(acc):
                    break
            if failed:
                _restart()
                continue
            proposed = state._replace(
                t=t_c,
                y=state.y._replace(mean=mean_c, cov_sqrtm=cov_c),
                error_estimate=error,
                reference_state=ref,
                diffusion_squared_local=diff_sq,
            )
            next_dt = float(dt_c)
        else:
            proposed, _ = solver.attempt_step(state, this_dt, pde)
            next_dt = dt
            if not _state_is_finite(proposed):
                _restart()
                continue

        state = proposed
        dt = next_dt
        report.num_steps += 1
        diffusion_sum += float(proposed.diffusion_squared_local)
        diffusion_count += 1
        steps_since_ckpt += 1
        if steps_since_ckpt >= checkpoint_every:
            checkpoint_module.save_state(
                ckpt_path, state, extra={"dt": jnp.asarray(dt)}
            )
            report.num_checkpoints += 1
            steps_since_ckpt = 0

    report.final_dt = dt
    diffusion = diffusion_sum / max(diffusion_count, 1)
    final = state._replace(
        y=state.y._replace(cov_sqrtm=state.y.cov_sqrtm * jnp.sqrt(diffusion))
    )
    return final, report
