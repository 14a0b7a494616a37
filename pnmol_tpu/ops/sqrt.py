"""Square-root Kalman linear algebra (QR-based, never forms full covariances).

Capability parity with ``/root/reference/src/pnmol/base/sqrt.py``. Two API
tiers:

* Dense tier (``propagate_cholesky_factor``, ``update_sqrt``,
  ``update_sqrt_no_meascov``): takes the measurement matrix ``H`` explicitly,
  mirrors the reference semantics bit-for-bit (same block layouts, same
  triangular conventions). Used at initialization time and as the oracle in
  equivalence tests.

* Product tier (``update_sqrt_from_products``): takes the *precomputed*
  product ``H @ C`` instead of ``H``. The PDE-filter hot loop computes that
  product with structured (Kronecker/slice) operators, so the ``(m, D)``
  measurement matrix is never materialized and the only O(D^2)-sized
  intermediates are covariance factors. On TPU this keeps the per-step work
  dominated by one tall QR (MXU-tiled by XLA) instead of redundant matmuls.

Math: for a predicted factor C (lower-triangular-ish, D x D), a measurement
matrix H (m x D) and measurement-noise factor R (m x m), one QR of

    [ (H C)^T   C^T ]
    [  R^T       0  ]            ((D + m) x (m + D))

yields an upper factor whose blocks contain the innovation factor (R1), the
gain (via a single triangular solve with R2), and the posterior factor (R3).
The reference pads the noise rows to a (2D x m+D) matrix
(``sqrt.py:55-65``); the Gram matrix is identical, so this build uses the
smaller stack.
"""


import jax
import jax.numpy as jnp
import jax.scipy.linalg


def triu_qr(mat):
    """Upper triangular factor of a QR decomposition, shape (min(M,N), N)."""
    return jnp.linalg.qr(mat, mode="r")


@jax.jit
def sqrtm_to_cholesky(St):
    """Lower factor L with L L^T = St^T St, from a 'right' square root St."""
    return triu_qr(St).T


@jax.jit
def propagate_cholesky_factor(S1, S2):
    """Cholesky-like factor of S1 S1^T + S2 S2^T via one QR of the stacked roots.

    Reference semantics: ``/root/reference/src/pnmol/base/sqrt.py:8-23``.
    """
    return sqrtm_to_cholesky(jnp.concatenate((S1.T, S2.T), axis=0))


batched_propagate_cholesky_factor = jax.vmap(propagate_cholesky_factor)
batched_sqrtm_to_cholesky = jax.vmap(sqrtm_to_cholesky)


@jax.jit
def update_sqrt_from_products(HC, C, meascov_sqrtm):
    """Square-root Kalman update from the precomputed product ``HC = H @ C``.

    Parameters
    ----------
    HC:
        Product of measurement matrix and covariance factor, shape (m, D).
    C:
        Covariance Cholesky factor, shape (D, D).
    meascov_sqrtm:
        Measurement-noise factor R, shape (m, m).

    Returns
    -------
    (posterior_cov_factor (D, D), gain (D, m), innovation_factor (m, m))
    """
    m, D = HC.shape
    top = jnp.concatenate((HC.T, C.T), axis=1)  # (D, m + D)
    bottom = jnp.concatenate(
        (meascov_sqrtm.T, jnp.zeros((m, D), dtype=HC.dtype)), axis=1
    )  # (m, m + D)
    R = triu_qr(jnp.concatenate((top, bottom), axis=0))  # (m + D, m + D)
    R1 = R[:m, :m]
    R2 = R[:m, m:]
    R3 = R[m:, m:]
    gain = jax.scipy.linalg.solve_triangular(R1, R2, lower=False).T
    return R3.T, gain, R1.T


@jax.jit
def update_sqrt(transition_matrix, cov_cholesky, meascov_sqrtm):
    """Square-root update with an explicit measurement matrix.

    Reference semantics: ``/root/reference/src/pnmol/base/sqrt.py:33-73``.
    """
    HC = transition_matrix @ cov_cholesky
    return update_sqrt_from_products(HC, cov_cholesky, meascov_sqrtm)


@jax.jit
def update_sqrt_no_meascov_from_products(HC, C):
    """Noise-free variant of :func:`update_sqrt_from_products`.

    Reference semantics: ``/root/reference/src/pnmol/base/sqrt.py:76-95``.
    """
    m = HC.shape[0]
    zeros = jnp.zeros((m, m), dtype=HC.dtype)
    return update_sqrt_from_products(HC, C, zeros)


@jax.jit
def update_sqrt_no_meascov(transition_matrix, cov_cholesky):
    """Noise-free square-root update with an explicit measurement matrix."""
    HC = transition_matrix @ cov_cholesky
    return update_sqrt_no_meascov_from_products(HC, cov_cholesky)


@jax.jit
def fused_predict_update(HACl, ACl, HQl, Ql, meascov_sqrtm):
    """Combined predict + update in ONE QR (the classical pre-array form).

    For predicted covariance P = (A Cl)(A Cl)^T + Ql Ql^T and measurement
    (H, R), the QR of

        [ (H A Cl)^T   (A Cl)^T ]
        [ (H Ql)^T      Ql^T    ]        ((2D + m) x (m + D))
        [  R^T           0      ]

    has the Gram [[H P H^T + R R^T, H P], [P H^T, P]], so its upper factor
    contains the innovation factor, the gain, and the posterior factor — the
    same quantities the two-QR pipeline (propagate_cholesky_factor followed
    by update_sqrt) produces, in a single MXU-friendly factorization with no
    intermediate predicted factor materialized.

    Returns (posterior_cov_factor (D, D), gain (D, m), innovation_factor (m, m)).
    """
    m, D = HACl.shape
    top = jnp.concatenate((HACl.T, ACl.T), axis=1)  # (D, m + D)
    mid = jnp.concatenate((HQl.T, Ql.T), axis=1)  # (D, m + D)
    bottom = jnp.concatenate(
        (meascov_sqrtm.T, jnp.zeros((m, D), dtype=HACl.dtype)), axis=1
    )
    R = triu_qr(jnp.concatenate((top, mid, bottom), axis=0))
    R1 = R[:m, :m]
    R2 = R[:m, m:]
    R3 = R[m:, m:]
    gain = jax.scipy.linalg.solve_triangular(R1, R2, lower=False).T
    return R3.T, gain, R1.T


@jax.jit
def update_sqrt_from_products_blocks(HC, C, meascov_sqrtm):
    """:func:`update_sqrt_from_products` without the gain solve.

    Returns the raw factor blocks ``(posterior_cov_factor (D, D),
    cross_factor L21 (D, m), innovation_factor L1 (m, m))`` with
    ``S_xz = L21 @ L1^T``. The Kalman gain is ``L21 @ L1^{-1}`` — but a
    filter step never needs it as a matrix: the mean update is
    ``K @ z = L21 @ (L1^{-1} z)``, and ``L1^{-1} z`` is exactly the whitened
    residual the diffusion calibration computes anyway, so one shared
    *vector* triangular solve replaces the (m, m) x (D rhs) matrix solve
    (2 ms/step at N=512, a ~7 GB XLA expansion at N=1e4 — measured,
    docs/SCALE.md round 3).
    """
    m, D = HC.shape
    top = jnp.concatenate((HC.T, C.T), axis=1)
    bottom = jnp.concatenate(
        (meascov_sqrtm.T, jnp.zeros((m, D), dtype=HC.dtype)), axis=1
    )
    R = triu_qr(jnp.concatenate((top, bottom), axis=0))
    return R[m:, m:].T, R[:m, m:].T, R[:m, :m].T


@jax.jit
def fused_predict_update_blocks(HACl, ACl, HQl, Ql, meascov_sqrtm):
    """:func:`fused_predict_update` without the gain solve (see
    :func:`update_sqrt_from_products_blocks` for the block contract)."""
    m, D = HACl.shape
    top = jnp.concatenate((HACl.T, ACl.T), axis=1)
    mid = jnp.concatenate((HQl.T, Ql.T), axis=1)
    bottom = jnp.concatenate(
        (meascov_sqrtm.T, jnp.zeros((m, D), dtype=HACl.dtype)), axis=1
    )
    R = triu_qr(jnp.concatenate((top, mid, bottom), axis=0))
    return R[m:, m:].T, R[:m, m:].T, R[:m, :m].T


def batched_update_sqrt(batched_transition_matrix, batched_cov_cholesky):
    """vmap-batched noise-free updates (homogeneous shapes, unlike the
    reference's Python loop at ``sqrt.py:98-111``)."""
    return jax.vmap(update_sqrt_no_meascov)(
        batched_transition_matrix, batched_cov_cholesky
    )
