"""Initial-value-problem container (in-house replacement for tornadox.ivp).

The reference imports ``tornadox.ivp.InitialValueProblem`` as the target of
its method-of-lines conversion (``/root/reference/src/pnmol/pde/mixins.py:189``)
and as the input of its MOL baseline solvers. This framework provides the
equivalent container plus the classic ODE test problems used in tests.
"""

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class InitialValueProblem:
    r"""IVP :math:`\dot y = f(t, y),\ y(t_0) = y_0` with optional Jacobian."""

    f: Callable
    y0: jnp.ndarray
    t0: float
    tmax: float
    df: Optional[Callable] = None
    df_diagonal: Optional[Callable] = None

    @property
    def dimension(self):
        return self.y0.shape[0] if self.y0.ndim > 0 else 1

    @property
    def t_span(self):
        return self.t0, self.tmax


def threebody(tmax=17.0652165601579625588917206249):
    """Restricted three-body problem (standard ODE-filter test problem)."""

    @jax.jit
    def f(_, Y):
        y1, y2, dy1, dy2 = Y
        mu = 0.012277471
        mp = 1.0 - mu
        D1 = ((y1 + mu) ** 2 + y2**2) ** 1.5
        D2 = ((y1 - mp) ** 2 + y2**2) ** 1.5
        ddy1 = y1 + 2.0 * dy2 - mp * (y1 + mu) / D1 - mu * (y1 - mp) / D2
        ddy2 = y2 - 2.0 * dy1 - mp * y2 / D1 - mu * y2 / D2
        return jnp.array([dy1, dy2, ddy1, ddy2])

    df = jax.jit(jax.jacfwd(f, argnums=1))
    y0 = jnp.array([0.994, 0.0, 0.0, -2.00158510637908252240537862224])
    return InitialValueProblem(f=f, df=df, y0=y0, t0=0.0, tmax=tmax)


def vanderpol(t0=0.0, tmax=30.0, y0=None, stiffness_constant=1e1):
    """Van der Pol oscillator."""

    @jax.jit
    def f(_, Y):
        return jnp.array([Y[1], stiffness_constant * ((1.0 - Y[0] ** 2) * Y[1] - Y[0])])

    df = jax.jit(jax.jacfwd(f, argnums=1))
    if y0 is None:
        y0 = jnp.array([2.0, 0.0])
    return InitialValueProblem(f=f, df=df, y0=y0, t0=t0, tmax=tmax)
