"""Integrated-Wiener-process (IWP) priors with Kronecker-structured operators.

Capability parity with ``/root/reference/src/pnmol/base/iwp.py``, rebuilt
around a *point-major Nordsieck layout* so that every structural matrix is
applied as a small batched matmul instead of a dense ``(D, D)`` product.

Layout
------
The state stacks, for each of ``d`` spatial points, the value and its first
``nu`` time-derivatives (the Nordsieck stack of size ``n = nu + 1``). We store
means as ``(n, d)`` matrices ``M`` (row i = i-th derivative at all points) and
define the flat basis *point-major*:

    x[j * n + i] = M[i, j]        (i.e. ``x = M.T.ravel()`` = Fortran ravel)

which matches the reference's ``reshape((-1,), order="F")`` convention
(``/root/reference/src/pnmol/white.py:104``). In this basis:

* transition  = kron(I_d, A_1d)          -> batched (n x n) matmul,
* preconditioner = kron(I_d, diag(p))    -> broadcast scale,
* derivative projection E_i = kron(I_d, e_i) -> a slice,
* process noise factor = kron(B, L_Q1d)  (B = spatial diffusion factor).

Applying the first three to a ``(D, K)`` covariance factor costs
``O(n^2 d K)`` = ``O(n D K)`` instead of the reference's dense ``O(D^2 K)``
— a factor-``d`` FLOP saving that also maps onto the MXU as one big batched
matmul. Dense materializations are kept as methods for initialization and
oracle tests.

The 1-D closed forms (flipped lower Pascal matrix for the transition, flipped
Hilbert matrix for the process noise — ``iwp.py:24-30``) are computed exactly
with integer arithmetic rather than through scipy.
"""

import functools
import math
from functools import cached_property

import jax
import jax.numpy as jnp



# ---------------------------------------------------------------------------
# Closed-form 1-D system matrices
# ---------------------------------------------------------------------------


def pascal_lower(n: int):
    """Lower-triangular Pascal matrix P[i, j] = C(i, j), exact."""
    return [[math.comb(i, j) if j <= i else 0 for j in range(n)] for i in range(n)]


def hilbert(n: int):
    """Hilbert matrix H[i, j] = 1 / (i + j + 1), exact rationals -> float."""
    return [[1.0 / (i + j + 1) for j in range(n)] for i in range(n)]


@functools.lru_cache(maxsize=None)
def system_matrices_1d(num_derivatives: int, dtype_name: str):
    """Preconditioned 1-D transition A_1d and noise Cholesky L_Q1d.

    A_1d is the flipped lower Pascal matrix, Q_1d the flipped Hilbert matrix
    (reference: ``iwp.py:24-30``).

    Computed with host numpy: the lru_cache is shared across traced and
    eager callers, and a jnp op executed while a trace is active would
    poison the cache with a tracer (UnexpectedTracerError on the next
    eager call).
    """
    import numpy as np

    n = num_derivatives + 1
    dtype = np.dtype(dtype_name)
    A = np.ascontiguousarray(np.flip(np.asarray(pascal_lower(n), dtype=dtype)))
    Q = np.flip(np.asarray(hilbert(n), dtype=np.float64))
    LQ = np.linalg.cholesky(Q).astype(dtype)
    # plain numpy out: even jnp.asarray would produce (and cache) a tracer
    # when called under an active trace. Read-only: the cache hands the SAME
    # arrays to every caller, so an in-place mutation anywhere would silently
    # corrupt all later calls.
    A.setflags(write=False)
    LQ.setflags(write=False)
    return A, LQ


def nordsieck_scales_1d(num_derivatives: int, dt):
    """Diagonal Nordsieck preconditioner scales and inverse scales, shape (n,).

    p[i] = |dt|^(nu + 1/2 - i) / (nu - i)!   (reference: ``iwp.py:55-62``).
    """
    powers = jnp.arange(num_derivatives, -1, -1, dtype=jnp.result_type(dt, 0.5))
    scales = jnp.asarray(
        [math.factorial(k) for k in range(num_derivatives, -1, -1)],
        dtype=powers.dtype,
    )
    powers = powers + 0.5
    abs_dt = jnp.abs(dt)
    scaling = abs_dt**powers / scales
    scaling_inv = abs_dt ** (-powers) * scales
    return scaling, scaling_inv


# ---------------------------------------------------------------------------
# Structured applications (the hot-path operators)
# ---------------------------------------------------------------------------


def apply_stack_matrix(A_1d, X):
    """Compute kron(I_d, A_1d) @ X without materializing the Kronecker product.

    X has shape (D,) or (D, K) with D = d * n in the point-major basis.
    """
    n = A_1d.shape[0]
    if X.ndim == 1:
        return (X.reshape(-1, n) @ A_1d.T).reshape(-1)
    K = X.shape[1]
    Xr = X.reshape(-1, n, K)
    out = jnp.einsum("ab,dbk->dak", A_1d, Xr, preferred_element_type=Xr.dtype)
    return out.reshape(-1, K)


def scale_stack(p, X):
    """Compute kron(I_d, diag(p)) @ X (p has shape (n,))."""
    n = p.shape[0]
    if X.ndim == 1:
        return (X.reshape(-1, n) * p[None, :]).reshape(-1)
    K = X.shape[1]
    return (X.reshape(-1, n, K) * p[None, :, None]).reshape(-1, K)


def project_derivative(X, i, n):
    """Compute E_i @ X where E_i = kron(I_d, e_i): select derivative ``i``.

    Returns shape (d,) for vectors and (d, K) for matrices.
    """
    if X.ndim == 1:
        return X.reshape(-1, n)[:, i]
    K = X.shape[1]
    return X.reshape(-1, n, K)[:, i, :]


def point_major_perm(n, d):
    """Permutation mapping derivative-major flat index (k*d + i) to the
    point-major basis (i*n + k): perm[p] = (p % n) * d + p // n. The single
    source of truth for the layout gather used by :func:`kron_point_major`
    and the init block assembly."""
    idx = jnp.arange(n * d)
    return (idx % n) * d + idx // n


def kron_point_major(A_spatial, B_deriv):
    """``jnp.kron(A_spatial, B_deriv)`` assembled TPU-friendly.

    ``jnp.kron`` broadcasts to a ``(d, n, d, n)`` intermediate whose tiny
    trailing axis (n = nu+1) TPU tiling pads to 128 — a ~42x HBM blow-up at
    large d (observed OOM at N=4096). Build ``kron(B, A)`` instead (trailing
    axis d, padding-free) and apply the point-major permutation
    ``(i,k) <-> (k,i)`` with two gathers; every intermediate is 2-D or has a
    large trailing axis.
    """
    d = A_spatial.shape[0]
    n = B_deriv.shape[0]
    big = (
        B_deriv[:, None, :, None] * A_spatial[None, :, None, :]
    ).reshape(n * d, n * d)  # kron(B_deriv, A_spatial)
    perm = point_major_perm(n, d)
    return big[perm][:, perm]


def mean_to_flat(M):
    """(n, d) mean matrix -> point-major flat vector (reference order='F')."""
    return M.T.reshape(-1)


def flat_to_mean(x, n):
    """Point-major flat vector -> (n, d) mean matrix."""
    return x.reshape(-1, n).T


# ---------------------------------------------------------------------------
# Prior container
# ---------------------------------------------------------------------------


class IntegratedWienerTransition:
    """nu-times integrated Wiener process over ``d`` spatial points.

    The spatial correlation enters through ``wp_diffusion_sqrtm`` (a ``(d, d)``
    factor, e.g. the kernel Gram Cholesky), which becomes the Kronecker left
    factor of the process-noise Cholesky (reference: ``iwp.py:43-53``).
    """

    def __init__(self, *, num_derivatives, wiener_process_dimension, wp_diffusion_sqrtm):
        self.num_derivatives = int(num_derivatives)
        self.wiener_process_dimension = int(wiener_process_dimension)
        self.wp_diffusion_sqrtm = wp_diffusion_sqrtm

    # -- shapes -------------------------------------------------------------

    @property
    def n(self):
        return self.num_derivatives + 1

    @property
    def state_dimension(self):
        return self.wiener_process_dimension * self.n

    @property
    def _dtype(self):
        return jnp.asarray(self.wp_diffusion_sqrtm).dtype

    # -- 1-D building blocks ------------------------------------------------

    @cached_property
    def preconditioned_discretize_1d(self):
        return system_matrices_1d(self.num_derivatives, str(self._dtype))

    def nordsieck_preconditioner_1d_raw(self, dt):
        return nordsieck_scales_1d(self.num_derivatives, dt)

    def nordsieck_preconditioner_1d(self, dt):
        p, p_inv = self.nordsieck_preconditioner_1d_raw(dt)
        return jnp.diag(p), jnp.diag(p_inv)

    # -- dense materializations (init / tests) -------------------------------

    @cached_property
    def preconditioned_discretize(self):
        """Dense (A, L_Q): kron(I_d, A_1d), kron(wp_diffusion_sqrtm, L_Q1d)."""
        A_1d, L_Q1d = self.preconditioned_discretize_1d
        eye = jnp.eye(self.wiener_process_dimension, dtype=A_1d.dtype)
        A = kron_point_major(eye, A_1d)
        L_Q = kron_point_major(self.wp_diffusion_sqrtm, L_Q1d)
        return A, L_Q

    def nordsieck_preconditioner(self, dt):
        p, p_inv = self.nordsieck_preconditioner_1d_raw(dt)
        eye = jnp.eye(self.wiener_process_dimension, dtype=p.dtype)
        return jnp.kron(eye, jnp.diag(p)), jnp.kron(eye, jnp.diag(p_inv))

    def non_preconditioned_discretize(self, dt):
        """Dense (A(dt), L_Q(dt)) in the raw (unpreconditioned) coordinates."""
        P, P_inv = self.nordsieck_preconditioner(dt)
        A_pre, LQ_pre = self.preconditioned_discretize
        return P @ A_pre @ P_inv, P @ LQ_pre

    def projection_matrix_1d(self, derivative):
        return jnp.eye(1, self.n, derivative, dtype=self._dtype)

    def projection_matrix(self, derivative):
        eye = jnp.eye(self.wiener_process_dimension, dtype=self._dtype)
        return jnp.kron(eye, self.projection_matrix_1d(derivative))

    # -- structured noise factor ---------------------------------------------

    @cached_property
    def process_noise_factor(self):
        """kron(wp_diffusion_sqrtm, L_Q1d), materialized once per solve.

        Needed as an explicit QR input in the propagation step; constant in
        preconditioned coordinates, so this is setup cost, not step cost.
        """
        _, L_Q1d = self.preconditioned_discretize_1d
        return kron_point_major(self.wp_diffusion_sqrtm, L_Q1d)
