"""Step-rule behavior: accept/reject thresholds, suggestion clamping, first dt."""

import jax.numpy as jnp
import pytest

from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step


def test_constant_rule():
    rule = step.Constant(dt=0.1)
    assert rule.is_accepted(jnp.inf)
    assert rule.suggest(0.5, None) == 0.1
    assert rule.scale_error_estimate(None, None) is None


def test_adaptive_accept_reject():
    rule = step.Adaptive(abstol=1e-4, reltol=1e-2)
    assert bool(rule.is_accepted(jnp.asarray(0.5)))
    assert not bool(rule.is_accepted(jnp.asarray(2.0)))


def test_adaptive_suggest_monotone():
    rule = step.Adaptive()
    dt = 0.1
    small_err = rule.suggest(dt, jnp.asarray(1e-4), local_convergence_rate=3)
    large_err = rule.suggest(dt, jnp.asarray(1e4), local_convergence_rate=3)
    assert float(small_err) > dt  # grow on small error
    assert float(large_err) < dt  # shrink on large error
    # clamped into max_changes
    assert float(small_err) <= 10.0 * dt + 1e-12
    assert float(large_err) >= 0.2 * dt - 1e-12


def test_adaptive_suggest_requires_rate():
    rule = step.Adaptive()
    with pytest.raises(ValueError):
        rule.suggest(0.1, jnp.asarray(1.0))


def test_scale_error_estimate_rms():
    rule = step.Adaptive(abstol=1.0, reltol=0.0)
    err = jnp.array([2.0, 2.0, 2.0, 2.0])
    ref = jnp.zeros(4)
    assert jnp.allclose(rule.scale_error_estimate(err, ref), 2.0)


def test_first_dt_linear_and_nonlinear():
    heat = examples.heat_1d_discretized(dx=0.2)
    rule = step.Adaptive()
    dt_lin = rule.first_dt(heat)
    assert float(dt_lin) > 0.0

    spruce = examples.spruce_budworm_1d_discretized(dx=0.2)
    dt_nl = rule.first_dt(spruce)
    assert float(dt_nl) > 0.0


def test_propose_first_dt_values():
    L = -2.0 * jnp.eye(3)
    y0 = jnp.ones(3)
    dt = step.propose_first_dt_linear(L, 0.0, y0)
    assert jnp.allclose(dt, 0.01 * jnp.linalg.norm(y0) / jnp.linalg.norm(L @ y0))
