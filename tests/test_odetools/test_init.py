"""Initialization routines: TaylorMode exactness, Stack shapes, RK agreement."""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu.odetools import init, ivp


@pytest.fixture
def threebody():
    return ivp.threebody()


@pytest.fixture
def vanderpol():
    return ivp.vanderpol(stiffness_constant=1.0)


def test_taylor_mode_matches_autodiff_derivatives(vanderpol):
    """TaylorMode derivatives equal nested total time-derivatives of f."""
    problem = vanderpol
    num_derivatives = 4
    m0 = init.TaylorMode.taylor_mode(
        fun=problem.f, y0=problem.y0, t0=problem.t0, num_derivatives=num_derivatives
    )
    assert m0.shape == (num_derivatives + 1, 2)

    # Oracle: high-order derivatives via nested jvp along the flow
    f = problem.f

    def d0(t, y):
        return y

    def lift(deriv):
        def next_deriv(t, y):
            dy_dt = jax.jacfwd(deriv, argnums=0)(t, y)
            dy_dy = jax.jacfwd(deriv, argnums=1)(t, y)
            return dy_dt + dy_dy @ f(t, y)

        return next_deriv

    deriv = d0
    for order in range(num_derivatives + 1):
        val = deriv(problem.t0, problem.y0)
        assert jnp.allclose(m0[order], val, rtol=1e-8, atol=1e-8), order
        deriv = lift(deriv)


def test_taylor_mode_low_orders(vanderpol):
    m0 = init.TaylorMode.taylor_mode(
        fun=vanderpol.f, y0=vanderpol.y0, t0=vanderpol.t0, num_derivatives=0
    )
    assert m0.shape == (1, 2)
    m1 = init.TaylorMode.taylor_mode(
        fun=vanderpol.f, y0=vanderpol.y0, t0=vanderpol.t0, num_derivatives=1
    )
    assert jnp.allclose(m1[1], vanderpol.f(vanderpol.t0, vanderpol.y0))


def test_stack_init(vanderpol):
    routine = init.Stack(use_df=True)
    m, sc = routine(
        f=vanderpol.f,
        df=vanderpol.df,
        y0=vanderpol.y0,
        t0=vanderpol.t0,
        num_derivatives=4,
        wp_diffusion_sqrtm=None,
    )
    assert m.shape == (5, 2)
    assert jnp.allclose(m[0], vanderpol.y0)
    assert jnp.allclose(m[1], vanderpol.f(vanderpol.t0, vanderpol.y0))
    assert jnp.allclose(sc[:3, :3], 0.0)
    assert jnp.allclose(jnp.diag(sc)[3:], 1e3)


def test_stack_init_no_df(vanderpol):
    m, sc = init.Stack(use_df=False)(
        f=vanderpol.f,
        df=None,
        y0=vanderpol.y0,
        t0=vanderpol.t0,
        num_derivatives=3,
        wp_diffusion_sqrtm=None,
    )
    assert m.shape == (4, 2)
    assert jnp.allclose(m[2:], 0.0)


def test_rk_data_fixed_steps(vanderpol):
    ts, ys = init.RungeKutta.rk_data(
        f=vanderpol.f, t0=0.0, dt=0.01, num_steps=4, y0=vanderpol.y0
    )
    assert ts.shape == (4,)
    assert ys.shape == (4, 2)
    assert jnp.allclose(ys[0], vanderpol.y0)
    assert jnp.allclose(jnp.diff(ts), 0.01)


def test_rk_init_close_to_taylor_mode():
    """RK-fitted Nordsieck stack approximates the exact Taylor coefficients
    (reference setup: vanderpol(10), nu=4, dt=0.01, 2*nu+1 data points,
    rtol 1e-1 — ``tests/test_odetools/test_init.py:271-277``)."""
    problem = ivp.vanderpol(stiffness_constant=10.0)
    nu = 4
    tm = init.TaylorMode.taylor_mode(
        fun=problem.f, y0=problem.y0, t0=problem.t0, num_derivatives=nu
    )
    ts, ys = init.RungeKutta.rk_data(
        f=problem.f, t0=problem.t0, dt=0.01, num_steps=2 * nu + 1, y0=problem.y0
    )
    m0, sc0 = init.Stack(use_df=True)(
        f=problem.f, df=problem.df, y0=problem.y0, t0=problem.t0,
        num_derivatives=nu, wp_diffusion_sqrtm=None,
    )
    m, sc = init.RungeKutta.rk_init_improve(
        m=m0, sc=sc0, t0=problem.t0, ts=ts, ys=ys, wp_diffusion_sqrtm=jnp.eye(1)
    )
    assert m.shape == tm.shape
    rel = jnp.linalg.norm(m - tm, axis=1) / (1e-12 + jnp.linalg.norm(tm, axis=1))
    assert jnp.all(rel < 1e-1)
    assert not jnp.any(jnp.isnan(sc))


def test_rk_init_call_entrypoint():
    """The __call__ adapter (nu+1 data points) runs and fixes low derivatives."""
    problem = ivp.vanderpol(stiffness_constant=1.0)
    m, sc = init.RungeKutta(dt=0.01)(
        f=problem.f,
        df=problem.df,
        y0=problem.y0,
        t0=problem.t0,
        num_derivatives=3,
        wp_diffusion_sqrtm=jnp.eye(1),
    )
    assert m.shape == (4, 2)
    assert jnp.allclose(m[0], problem.y0, rtol=1e-6, atol=1e-8)
    assert not jnp.any(jnp.isnan(sc))
