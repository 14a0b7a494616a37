"""Step-size selection rules.

Capability parity with ``/root/reference/src/pnmol/odetools/step.py``:
``Constant`` steps and a PI-like ``Adaptive`` controller. Rules are frozen
dataclasses, so they are hashable static arguments for jitted drivers, and
every decision function (``suggest`` / ``is_accepted`` / ``scale_error_estimate``)
is a pure jnp expression usable inside ``lax.while_loop``.
"""

import abc
import dataclasses
from typing import Tuple

import jax.numpy as jnp


class StepRule(abc.ABC):
    """Step-size selection rule."""

    @abc.abstractmethod
    def suggest(self, previous_dt, scaled_error_estimate, local_convergence_rate=None):
        raise NotImplementedError

    @abc.abstractmethod
    def is_accepted(self, scaled_error_estimate):
        raise NotImplementedError

    def scale_error_estimate(self, unscaled_error_estimate, reference_state):
        raise NotImplementedError

    def first_dt(self, discretized_pde):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Constant(StepRule):
    """Fixed step size."""

    dt: float
    min_step: float = 1e-15
    max_step: float = 1e15

    def suggest(self, previous_dt, scaled_error_estimate, local_convergence_rate=None):
        return self.dt

    def is_accepted(self, scaled_error_estimate):
        return True

    def scale_error_estimate(self, unscaled_error_estimate, reference_state):
        # Constant steps never consult the error estimate.
        return None

    def first_dt(self, discretized_pde):
        return self.dt


@dataclasses.dataclass(frozen=True)
class Adaptive(StepRule):
    """Proportional step control on the RMS-normalized, tolerance-scaled error.

    Accept iff the scaled error is below 1; the next step is scaled by
    ``safety * (1 / error)^(1 / rate)`` clamped into ``max_changes``
    (reference: ``step.py:58-107``).
    """

    abstol: float = 1e-4
    reltol: float = 1e-2
    max_changes: Tuple[float, float] = (0.2, 10.0)
    safety_scale: float = 0.95
    min_step: float = 1e-15
    max_step: float = 1e15

    def suggest(self, previous_dt, scaled_error_estimate, local_convergence_rate=None):
        if local_convergence_rate is None:
            raise ValueError("Please provide a local convergence rate.")
        small, large = self.max_changes
        change = self.safety_scale * (1.0 / scaled_error_estimate) ** (
            1.0 / local_convergence_rate
        )
        return jnp.clip(change, small, large) * previous_dt

    def is_accepted(self, scaled_error_estimate):
        return scaled_error_estimate < 1

    def scale_error_estimate(self, unscaled_error_estimate, reference_state):
        tolerance = self.abstol + self.reltol * reference_state
        ratio = unscaled_error_estimate / tolerance
        dim = ratio.size if ratio.ndim > 0 else 1
        return jnp.linalg.norm(ratio) / jnp.sqrt(dim)

    def first_dt(self, discretized_pde):
        from pnmol_tpu.models import mixins

        if not isinstance(discretized_pde, mixins.NonLinearMixIn):
            return propose_first_dt_linear(
                discretized_pde.L, discretized_pde.t0, discretized_pde.y0
            )
        return propose_first_dt(
            discretized_pde.f, discretized_pde.t0, discretized_pde.y0
        )


def propose_first_dt(f, t0, y0):
    """Heuristic first step: 0.01 * ||y0|| / ||f(t0, y0)||."""
    norm_y0 = jnp.linalg.norm(y0)
    norm_dy0 = jnp.linalg.norm(f(t0, y0))
    return 0.01 * norm_y0 / norm_dy0


def propose_first_dt_linear(L, _, y0):
    """Linear-PDE special case of :func:`propose_first_dt` using L @ y0."""
    norm_y0 = jnp.linalg.norm(y0)
    norm_dy0 = jnp.linalg.norm(L @ y0)
    return 0.01 * norm_y0 / norm_dy0
