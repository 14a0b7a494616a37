"""Reference integrators: DP5 accuracy, visible exhaustion, stiff LSODA path."""

import jax
import jax.numpy as jnp
import numpy as np

from pnmol_tpu.odetools import reference_solver


def _decay(t, y):
    return -y


def test_dopri5_matches_exact_solution():
    sol = reference_solver.solve_ivp_dopri5(
        _decay, (0.0, 2.0), jnp.asarray([1.0, 3.0]), jnp.asarray([1.0, 2.0]),
        rtol=1e-10, atol=1e-12,
    )
    exact = jnp.stack([jnp.exp(-sol.t), 3.0 * jnp.exp(-sol.t)], axis=1)
    assert jnp.allclose(sol.y, exact, rtol=1e-8)


def test_dopri5_exhaustion_is_visible_not_zero():
    """When the step budget runs out before tmax, unreached evaluation points
    are NaN — never silently zero (the failure mode that produced an all-zero
    ground truth for stiff fine-dx systems in an earlier revision)."""
    sol = reference_solver.solve_ivp_dopri5(
        _decay, (0.0, 10.0), jnp.asarray([1.0]), jnp.asarray([10.0]),
        rtol=1e-12, atol=1e-14, max_steps=3,
    )
    assert int(sol.num_steps) == 3
    assert bool(jnp.all(jnp.isnan(sol.y)))


def test_lsoda_stiff_path_matches_dopri5_on_easy_problem():
    t_eval = jnp.asarray([0.5, 1.5])
    y0 = jnp.asarray([2.0, -1.0])
    a = reference_solver.solve_ivp_dopri5(
        _decay, (0.0, 2.0), y0, t_eval, rtol=1e-11, atol=1e-13
    )
    b = reference_solver.solve_ivp_stiff(
        _decay, (0.0, 2.0), y0, t_eval, rtol=1e-11, atol=1e-13,
        jac=lambda t, y: -jnp.eye(2),
    )
    assert jnp.allclose(a.y, b.y, rtol=1e-8)


def test_lsoda_handles_stiff_system():
    """A genuinely stiff linear system (lambda = -1e5) that explicit DP5
    cannot finish in a small budget; LSODA solves it directly."""
    lam = -1e5

    def f(t, y):
        return lam * (y - jnp.cos(t))

    sol = reference_solver.solve_ivp_stiff(
        f, (0.0, 1.0), jnp.asarray([0.0]), jnp.asarray([1.0]),
        rtol=1e-8, atol=1e-10, jac=lambda t, y: lam * jnp.eye(1),
    )
    # quasi-steady solution: y ~ cos(t) + sin(t)/lam
    assert np.isclose(float(sol.y[-1, 0]), np.cos(1.0), atol=1e-4)
