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
    reload of the last checkpoint and a constant-step restart with
    ``dt * dt_backoff``. Returns ``(final_state, ResilienceReport)``.

    Only constant step rules are supported (the adaptive rule has its own
    rejection loop; combining both retry layers is deliberate future work).
    """
    if not isinstance(solver.steprule, step_module.Constant):
        raise NotImplementedError("solve_resilient currently requires Constant steps.")

    checkpoint_dir = pathlib.Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    report = ResilienceReport()

    state = solver.initialize(pde)
    dt = float(solver.steprule.dt)
    ckpt_path = checkpoint_dir / "latest"
    checkpoint_module.save_state(ckpt_path, state, extra={"dt": jnp.asarray(dt)})
    report.num_checkpoints += 1

    diffusion_sum, diffusion_count = 0.0, 0
    restarts = 0
    steps_since_ckpt = 0

    tmax = float(pde.tmax)
    t_eps = 1e-12 * max(1.0, abs(tmax))
    while tmax - float(state.t) > t_eps:
        this_dt = min(dt, tmax - float(state.t))
        proposed, _ = solver.attempt_step(state, this_dt, pde)

        if not _state_is_finite(proposed):
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
            continue

        state = proposed
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
