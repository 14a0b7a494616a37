"""Blocked triangular solves with O(matrix) memory.

XLA's TPU triangular-solve expander keeps ~18 shrinking (n, n) temporaries
live at once for an (n, n) triangular factor against a wide right-hand
side — ~7 GB at n = 1e4, measured via ``compiled.memory_analysis()``
(docs/SCALE.md round 3). The initialization's closed-form y0 gain
(``cho_solve`` with a (d, d) RHS) and the sqrt-update gain solve
(``L1^{-1} L21`` with a (m, 2d) RHS) both hit it, and at N = 1e4 those
temporaries — not the factorization itself — are what overflow the chip.

This module is the O(1)-extra-buffer replacement: a right-looking panel
substitution where each panel is one small (b, b) XLA triangular solve and
the eliminations are plain (rows, b) x (b, K) MXU matmuls under masks.
FLOPs ~ n^2 K (vs the optimal n^2 K / 2 — the masked full-width update),
memory ~ L + B + one (rows, K) temp. Single-device counterpart of
``pnmol_tpu.parallel.sharded_linalg.blocked_tri_solve_lower``.
"""

import jax
import jax.numpy as jnp


def _roundup(x: int, q: int) -> int:
    return -(-x // q) * q


def tri_solve_lower_blocked(L, B, *, transpose: bool = False,
                            panel: int = 1024,
                            precision=jax.lax.Precision.HIGHEST):
    """``L^{-1} B`` (or ``L^{-T} B``) for lower-triangular ``L``, blocked.

    Matches ``jax.scipy.linalg.solve_triangular(L, B, lower=True[,
    trans=1])`` to roundoff. ``B`` may be 1-D or 2-D.
    """
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    n = L.shape[0]
    K = B.shape[1]
    dtype = B.dtype
    b = min(panel, _roundup(n, 8))
    n_pad = _roundup(n, b)
    if n_pad > n:
        L = jnp.pad(L, ((0, n_pad - n), (0, n_pad - n)))
        pad_diag = jnp.arange(n, n_pad)
        L = L.at[pad_diag, pad_diag].set(1.0)
        B = jnp.pad(B, ((0, n_pad - n), (0, 0)))
    n_panels = n_pad // b
    rows = jnp.arange(n_pad)[:, None]

    def fwd(pj, X):
        j = jnp.asarray(pj * b, jnp.int32)
        zi = jnp.zeros((), jnp.int32)
        Ljj = jax.lax.dynamic_slice(L, (j, j), (b, b))
        Bp = jax.lax.dynamic_slice(X, (j, zi), (b, K))
        Xp = jax.scipy.linalg.solve_triangular(Ljj, Bp, lower=True)
        X = jax.lax.dynamic_update_slice(X, Xp, (j, zi))
        Lcols = jax.lax.dynamic_slice(L, (zi, j), (n_pad, b))
        upd = jnp.dot(Lcols, Xp, precision=precision)
        return X - jnp.where(rows >= j + b, upd, jnp.zeros((), dtype))

    def bwd(k, X):
        j = jnp.asarray((n_panels - 1 - k) * b, jnp.int32)
        zi = jnp.zeros((), jnp.int32)
        Ljj = jax.lax.dynamic_slice(L, (j, j), (b, b))
        Bp = jax.lax.dynamic_slice(X, (j, zi), (b, K))
        Xp = jax.scipy.linalg.solve_triangular(Ljj, Bp, lower=True, trans=1)
        X = jax.lax.dynamic_update_slice(X, Xp, (j, zi))
        # rows above eliminate via the L^T coupling L[j:j+b, :]^T
        Lrows = jax.lax.dynamic_slice(L, (j, zi), (b, n_pad))
        upd = jnp.dot(Lrows.T, Xp, precision=precision)
        return X - jnp.where(rows < j, upd, jnp.zeros((), dtype))

    X = jax.lax.fori_loop(0, n_panels, bwd if transpose else fwd, B)
    X = X[:n]
    return X[:, 0] if vec else X


def cho_solve_blocked(L, B, *, panel: int = 1024):
    """``(L L^T)^{-1} B`` from a lower Cholesky factor, blocked."""
    Y = tri_solve_lower_blocked(L, B, panel=panel)
    return tri_solve_lower_blocked(L, Y, transpose=True, panel=panel)


def tri_solve_upper_blocked(U, B, *, panel: int = 1024,
                            precision=jax.lax.Precision.HIGHEST):
    """``U^{-1} B`` for UPPER-triangular ``U``, blocked backward
    substitution — no ``U.T`` copy (a second (n, n) buffer is real memory
    at the DARE solver's D = 2e4 shapes, ``ops/dare._qr_solve``).

    Matches ``jax.scipy.linalg.solve_triangular(U, B, lower=False)`` to
    roundoff. ``B`` may be 1-D or 2-D.
    """
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    n = U.shape[0]
    K = B.shape[1]
    dtype = B.dtype
    b = min(panel, _roundup(n, 8))
    n_pad = _roundup(n, b)
    if n_pad > n:
        U = jnp.pad(U, ((0, n_pad - n), (0, n_pad - n)))
        pad_diag = jnp.arange(n, n_pad)
        U = U.at[pad_diag, pad_diag].set(1.0)
        B = jnp.pad(B, ((0, n_pad - n), (0, 0)))
    n_panels = n_pad // b
    rows = jnp.arange(n_pad)[:, None]

    def bwd(k, X):
        j = jnp.asarray((n_panels - 1 - k) * b, jnp.int32)
        zi = jnp.zeros((), jnp.int32)
        Ujj = jax.lax.dynamic_slice(U, (j, j), (b, b))
        Bp = jax.lax.dynamic_slice(X, (j, zi), (b, K))
        Xp = jax.scipy.linalg.solve_triangular(Ujj, Bp, lower=False)
        X = jax.lax.dynamic_update_slice(X, Xp, (j, zi))
        # rows above eliminate via their U[:, j:j+b] column strip
        Ucols = jax.lax.dynamic_slice(U, (zi, j), (n_pad, b))
        upd = jnp.dot(Ucols, Xp, precision=precision)
        return X - jnp.where(rows < j, upd, jnp.zeros((), dtype))

    X = jax.lax.fori_loop(0, n_panels, bwd, B)
    X = X[:n]
    return X[:, 0] if vec else X
