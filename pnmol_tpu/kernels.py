"""Covariance kernels with shape-polymorphic Gram evaluation.

Capability parity with ``/root/reference/src/pnmol/kernels.py``: the same
call convention (scalar pair -> scalar; equal-shape ``(N, d)`` -> diagonal
``(N,)``; ``(N, d) x (d, K)`` -> full Gram ``(N, K)``, i.e. callers pass
``k(X, Y.T)`` for a Gram matrix), kernel addition, ``duplicate`` for
block-diagonal system kernels, and grid-search MLE of the input scale.

TPU-first deltas: kernels are frozen dataclasses (hashable, safe as jit
static arguments), Gram assembly is a single nested-vmap batch that XLA fuses
into one elementwise pipeline, and the MLE sweep evaluates *all* trial scales
as one vmapped computation.
"""

import abc
import dataclasses
import functools

import jax
import jax.numpy as jnp
import jax.scipy.linalg


class Kernel(abc.ABC):
    """Covariance kernel interface."""

    #: True if k(x, y) depends on x - y only. Stationary kernels unlock the
    #: stencil-dedupe fast path in :mod:`pnmol_tpu.discretize` (uniform grids
    #: have O(1) distinct stencil systems instead of N).
    stationary: bool = False

    @abc.abstractmethod
    def __call__(self, X, Y):
        raise NotImplementedError


def _gram_dispatch(pairwise, X, Y):
    """Shape-polymorphic evaluation of a pairwise kernel function."""
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if X.ndim <= 1 and Y.ndim <= 1 and X.ndim == Y.ndim:
        return pairwise(X, Y)
    if X.shape == Y.shape:
        return jax.vmap(pairwise, (0, 0))(X, Y)
    # Full Gram matrix: X (N, d), Y (d, K) -> (N, K)
    row = jax.vmap(pairwise, (0, None))
    return jax.vmap(row, (None, 1), 1)(X, Y)


class PairwiseKernel(Kernel):
    """Kernel defined through a function of two points."""

    @abc.abstractmethod
    def pairwise(self, x, y):
        raise NotImplementedError

    def __call__(self, X, Y):
        return _gram_dispatch(self.pairwise, X, Y)

    def __add__(self, other):
        self_pairwise, other_pairwise = self.pairwise, other.pairwise

        def summed(x, y):
            return self_pairwise(x, y) + other_pairwise(x, y)

        out = Lambda(summed)
        # a sum of stationary kernels is stationary
        out.stationary = self.stationary and getattr(other, "stationary", False)
        return out

    def __str__(self):
        return f"{self.__class__.__name__}()"


class Lambda(PairwiseKernel):
    """Wrap an arbitrary pairwise function as a kernel."""

    def __init__(self, fun, /):
        self._fun = fun

    def pairwise(self, x, y):
        return self._fun(x, y)

    def __hash__(self):
        return hash(self._fun)

    def __eq__(self, other):
        return isinstance(other, Lambda) and self._fun is other._fun


def _sqdist(x, y):
    diff = x - y
    return jnp.dot(diff, diff)


@dataclasses.dataclass(frozen=True)
class RadialKernel(PairwiseKernel):
    r"""k(x, y) = output_scale^2 * phi(||x - y|| * input_scale).

    Gram evaluation fast path: radial kernels assemble their full Gram matrix
    through the MXU distance trick (|x|^2 + |y|^2 - 2 x.y fused with the
    radial profile) — a tiled Pallas kernel on TPU for large N, a vectorized
    jnp version elsewhere (see :mod:`pnmol_tpu.ops.pallas_gram`). The
    pairwise form remains the autodiff surface for the discretization layer.
    """

    input_scale: float = 1.0
    output_scale: float = 1.0

    stationary = True

    # subclass marker for the fused Gram path (None disables it)
    _PHI_NAME = None
    _PALLAS_MIN_ELEMS = 512 * 512

    @property
    def input_scale_squared(self):
        return self.input_scale**2

    @property
    def output_scale_squared(self):
        return self.output_scale**2

    def __call__(self, X, Y):
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        if (
            self._PHI_NAME is not None
            and X.ndim == 2
            and Y.ndim == 2
            and X.shape != Y.shape
            and X.shape[1] == Y.shape[0]
        ):
            # Full-Gram convention: callers pass (X, Y.T).
            from pnmol_tpu.ops import pallas_gram

            points_y = Y.T
            static_scales = isinstance(self.input_scale, (int, float)) and isinstance(
                self.output_scale, (int, float)
            )
            if (
                static_scales
                and jax.default_backend() == "tpu"
                and X.shape[0] * points_y.shape[0] >= self._PALLAS_MIN_ELEMS
            ):
                return pallas_gram.gram_radial(
                    X,
                    points_y,
                    self.input_scale,
                    self.output_scale,
                    phi_name=self._PHI_NAME,
                )
            return pallas_gram.gram_fast_jnp(
                X,
                points_y,
                self.input_scale,
                self.output_scale,
                phi_name=self._PHI_NAME,
            )
        return _gram_dispatch(self.pairwise, X, Y)


@dataclasses.dataclass(frozen=True)
class SquareExponential(RadialKernel):
    _PHI_NAME = "squared_exponential"

    def pairwise(self, x, y):
        r2 = _sqdist(x, y) * self.input_scale_squared
        return self.output_scale_squared * jnp.exp(-r2 / 2.0)


@dataclasses.dataclass(frozen=True)
class Matern52(RadialKernel):
    """Matern(5/2). Not twice differentiable at x = y; the discretization layer
    patches the removable singularity (see ``pnmol_tpu.discretize``)."""

    _PHI_NAME = "matern52"

    def pairwise(self, x, y):
        r2 = _sqdist(x, y)
        scaled = jnp.sqrt(5.0 * r2 * self.input_scale_squared)
        poly = 1.0 + scaled + scaled**2 / 3.0
        return self.output_scale_squared * poly * jnp.exp(-scaled)


@dataclasses.dataclass(frozen=True)
class Polynomial(PairwiseKernel):
    """k(x, y) = (x . y + const)^order."""

    order: int = 2
    const: float = 1.0

    def pairwise(self, x, y):
        return (jnp.dot(x, y) + self.const) ** self.order


@dataclasses.dataclass(frozen=True)
class WhiteNoise(PairwiseKernel):
    """k(x, y) = output_scale^2 * 1[x == y]."""

    output_scale: float = 1.0

    stationary = True

    def pairwise(self, x, y):
        return self.output_scale**2 * jnp.all(x == y)


class StackedKernel(Kernel):
    """Stack of kernels whose Gram matrix is block-diagonal (PDE systems)."""

    def __init__(self, *, kernel_list):
        self.kernel_list = list(kernel_list)

    def __call__(self, X, Y):
        grams = [k(X, Y) for k in self.kernel_list]
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        if X.shape == Y.shape:
            return jnp.concatenate(grams)
        return jax.scipy.linalg.block_diag(*grams)


# Backwards-compatible alias (reference name: _StackedKernel).
_StackedKernel = StackedKernel


def duplicate(kernel, num):
    """``num`` copies of ``kernel`` stacked into a block-diagonal Gram."""
    return StackedKernel(kernel_list=[kernel] * num)


# ---------------------------------------------------------------------------
# Hyperparameter calibration
# ---------------------------------------------------------------------------


def log_likelihood(gram_matrix, y, n):
    """GP log marginal likelihood via one Cholesky (stable: no determinant of
    the raw Gram as in the reference's ``kernels.py:206-211``)."""
    chol = jnp.linalg.cholesky(gram_matrix)
    white = jax.scipy.linalg.solve_triangular(chol, y, lower=True)
    maha = white @ white
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(chol)))
    return -0.5 * (maha + logdet + n * jnp.log(2.0 * jnp.pi))


def input_scale_to_log_likelihood(input_scale, mesh_points, data, kernel_type):
    kernel = kernel_type(input_scale=input_scale)
    K = kernel(mesh_points, mesh_points.T)
    return log_likelihood(gram_matrix=K, y=data, n=data.shape[0])


def mle_input_scale_gradient(
    *, mesh_points, data, kernel_type, initial_scale=1.0, num_steps=100,
    learning_rate=0.1
):
    """Gradient-based MLE of the input scale (adam on the log-scale).

    Complements the reference's grid search (``kernels.py:186-196``) —
    possible here because the whole likelihood (Gram assembly + Cholesky) is
    differentiable. Returns the optimized scale as a float.
    """
    import optax

    data = jnp.asarray(data)
    n = data.shape[0]

    def neg_log_likelihood(log_scale):
        kernel = kernel_type(input_scale=jnp.exp(log_scale))
        gram = kernel(mesh_points, mesh_points.T) + 1e-10 * jnp.eye(n)
        return -log_likelihood(gram_matrix=gram, y=data, n=n)

    value_and_grad = jax.jit(jax.value_and_grad(neg_log_likelihood))
    optimizer = optax.adam(learning_rate)
    params = jnp.log(jnp.asarray(initial_scale, dtype=data.dtype))
    opt_state = optimizer.init(params)

    @jax.jit
    def update(params, opt_state):
        value, grads = value_and_grad(params)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, value

    for _ in range(num_steps):
        params, opt_state, _ = update(params, opt_state)
    return float(jnp.exp(params))


def mle_input_scale(*, mesh_points, data, kernel_type, input_scale_trials):
    """Grid-search MLE of the input scale: one vmapped sweep over all trials."""
    sweep = jax.jit(
        jax.vmap(
            functools.partial(
                input_scale_to_log_likelihood,
                mesh_points=mesh_points,
                data=data,
                kernel_type=kernel_type,
            )
        ),
        static_argnames=(),
    )
    values = sweep(jnp.asarray(input_scale_trials))
    # Singular Grams (tiny scales) produce NaN likelihoods; mask them out so
    # argmax picks the best *valid* trial.
    values = jnp.where(jnp.isnan(values), -jnp.inf, values)
    return input_scale_trials[jnp.argmax(values)]
