r"""Differential operators: callables mapping functions to functions.

Capability parity with ``/root/reference/src/pnmol/diffops.py`` — the same
algebra (``+ - * @``, ``compose_with``) and the same factories (divergence,
gradient, gradient_by_dimension, laplace, identity, power, scalar_mult,
constant). Built on JAX autodiff, so operators can be pushed through kernel
functions (``diffop(k.pairwise, argnums=0)``) for probabilistic finite
differences, and everything stays composable with jit/vmap.

Examples
--------
>>> import jax.numpy as jnp
>>> fun = lambda x: jnp.linalg.norm(x) ** 2
>>> t0, x0 = 2.0, jnp.ones(2)
>>> I, P, DD = identity(), power(3), laplace()
>>> float(I(fun)(t0, x0))
2.0
>>> float(P(fun)(t0, x0))
8.0
>>> float(DD(fun)(t0, x0))
4.0
>>> op = I + P * DD
>>> float(op(fun)(t0, x0))  # 2 + 8 * 4
34.0
>>> float(P.compose_with(DD)(fun)(t0, x0))  # (lap f)^3
64.0
"""

import operator
import typing

import jax
import jax.numpy as jnp


class DifferentialOperator:
    """A transform ``fun -> fun`` supporting pointwise algebra and composition.

    The wrapped transform receives ``(fun, argnums)`` and returns a function
    of the same signature as ``fun``; ``argnums`` selects which argument the
    derivative acts on (needed to differentiate two-argument kernels).
    """

    def __init__(self, transform: typing.Callable):
        self._transform = transform

    def __call__(self, fun: typing.Callable, argnums: int = 0) -> typing.Callable:
        return self._transform(fun, argnums=argnums)

    def __repr__(self):
        return "<DifferentialOperator object>"

    def _pointwise(self, other, binop):
        def combined(fun, argnums=0):
            left = self(fun, argnums=argnums)
            right = other(fun, argnums=argnums)

            def evaluate(*args):
                return binop(left(*args), right(*args))

            return evaluate

        return DifferentialOperator(combined)

    def __add__(self, other):
        return self._pointwise(other, operator.add)

    def __sub__(self, other):
        return self._pointwise(other, operator.sub)

    def __mul__(self, other):
        return self._pointwise(other, operator.mul)

    def __matmul__(self, other):
        def matmul_like(a, b):
            if a.ndim < 1:
                a = a.reshape(-1, 1)
            if b.ndim < 1:
                b = b.reshape(1, -1)
            return a @ b

        return self._pointwise(other, matmul_like)

    def compose_with(self, other: "DifferentialOperator") -> "DifferentialOperator":
        """Operator composition: (self o other)(fun) = self(other(fun))."""

        def composed(fun, argnums=0):
            return self(other(fun, argnums=argnums), argnums=argnums)

        return DifferentialOperator(composed)


def divergence():
    """Divergence as the trace of the Jacobian."""

    def transform(fun, argnums=0):
        jac = jax.jacrev(fun, argnums=argnums)
        return lambda *args: jnp.trace(jac(*args))

    return DifferentialOperator(transform)


def gradient():
    """Gradient of a scalar-valued function."""

    def transform(fun, argnums=0):
        def as_scalar(*args, **kwargs):
            return fun(*args, **kwargs).squeeze()

        return jax.grad(as_scalar, argnums=argnums)

    return DifferentialOperator(transform)


def gradient_by_dimension(output_coordinate=0):
    """Jacobian row of a vector-valued function for one output coordinate."""

    def transform(fun, argnums=0):
        jac = jax.jacrev(fun, argnums=argnums)
        return lambda *args: jac(*args)[output_coordinate]

    return DifferentialOperator(transform)


def directional_derivative(direction):
    """Advection operator ``v . grad(.)`` with a constant velocity ``v``.

    Beyond the reference factory set: needed for the advection-diffusion
    model family (BASELINE.md's 3-D N=1e5 scale configuration).
    """
    v = jnp.asarray(direction)

    def transform(fun, argnums=0):
        grad_fun = gradient()(fun, argnums=argnums)
        return lambda *args: jnp.dot(v, grad_fun(*args))

    return DifferentialOperator(transform)


def laplace():
    """Laplace operator, implemented as divergence(gradient(.))."""

    def transform(fun, argnums=0):
        grad_fun = gradient()(fun, argnums=argnums)
        return divergence()(grad_fun, argnums=argnums)

    return DifferentialOperator(transform)


def identity():
    """Identity operator."""
    return DifferentialOperator(lambda fun, argnums=0: fun)


def power(order):
    """Pointwise power: fun -> fun**order."""

    def transform(fun, argnums=0):
        return lambda *args: fun(*args) ** order

    return DifferentialOperator(transform)


def scalar_mult(scalar):
    """Pointwise scaling: fun -> scalar * fun."""

    def transform(fun, argnums=0):
        return lambda *args: scalar * fun(*args)

    return DifferentialOperator(transform)


def constant(scalar):
    """Constant operator: fun -> (x -> scalar)."""

    def transform(fun, argnums=0):
        return lambda *args: scalar

    return DifferentialOperator(transform)
