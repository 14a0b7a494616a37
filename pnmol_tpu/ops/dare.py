"""Doubling solver for the discrete algebraic Riccati equation (DARE).

The steady-state mode freezes the fixed point of the covariance half of the
Kalman recursion (``pnmol_tpu.solvers.white.converge_white_steady_state``).
Iterating the per-step recursion converges only at the closed loop's own
mixing rate — ``1 - O(lambda_min * dt)`` per iteration, i.e. ``O(1/dt)``
full-QR iterations for a fixed accuracy (the reference re-runs that exact
recursion every step forever: ``/root/reference/src/pnmol/white.py:96-146``).

This module computes the fixed point directly with the **structure-preserving
doubling algorithm** (SDA): the one-step Riccati map is a linear-fractional
(Moebius) transform of the symplectic matrix, so composing the map with
itself squares that matrix — iteration ``k`` of SDA represents the
``2^k``-step map. Convergence is quadratic: ``~log2(1/(lambda_min*dt))``
iterations of dense matmuls plus one QR-based solve each, instead of
``O(1/dt)`` QR factorizations of the full pre-array.

Form solved (filter/estimation DARE, predicted covariance):

    Sigma = A Sigma A^T + Q - A Sigma H^T (R + H Sigma H^T)^{-1} H Sigma A^T
          = A Sigma (I + G Sigma)^{-1} A^T + Q,      G = H^T R^{-1} H.

SDA iterates the triple ``(A_k, G_k, H_k)`` representing the ``2^k``-step map
``X -> H_k + A_k^T X (I + G_k X)^{-1} A_k`` with ``A_0 = A^T``, ``G_0 = G``,
``H_0 = Q``; ``H_k -> Sigma`` and ``A_k -> 0`` quadratically (Chu, Fan & Lin,
"Structure-preserving doubling algorithms", 2005 — public algorithm).

TPU notes: every solve against ``W = I + G_k H_k`` goes through one QR of
``W`` shared by all right-hand sides (LU is unsupported in f64 on TPU; QR
is, and ``W`` has eigenvalues >= 1 so the QR is safe). All matmuls run at
``default_matmul_precision("highest")`` — the fixed point feeds a frozen
gain whose accuracy sets closed-loop stability (docs/SCALE.md
"Steady-state mode").
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg


class SDAResult(NamedTuple):
    """Fixed point + diagnostics of one SDA run (a pytree)."""

    sigma: jnp.ndarray  # (D, D) predicted-covariance fixed point
    iterations: jnp.ndarray  # () int32 doubling iterations taken
    delta: jnp.ndarray  # () last relative max-abs change of H_k
    anorm: jnp.ndarray  # () max-abs of the final A_k (-> 0 quadratically)


def _qr_solve(W, *rhs):
    """Solve ``W x = b`` for each rhs via one shared QR of ``W``.

    QR (not LU): works in f64 on TPU, and ``W = I + G H`` with G, H PSD has
    eigenvalues >= 1, so no pivoting is needed for stability. Past
    D >= 4096 the upper solve runs blocked: XLA's triangular-solve
    expander keeps ~18 shrinking (D, K) temporaries live for a wide RHS —
    at the N=1e4 steady seed (D = 2e4) those temps alone exceed a 16 GB
    chip (measured OOM, docs/SCALE.md round 5; same wall as round 3's
    init gain solve, ``ops/trisolve``).
    """
    Qm, Rm = jnp.linalg.qr(W)
    if W.shape[0] >= 4096:
        from pnmol_tpu.ops import trisolve

        return tuple(
            trisolve.tri_solve_upper_blocked(Rm, Qm.T @ b) for b in rhs
        )
    return tuple(
        jax.scipy.linalg.solve_triangular(Rm, Qm.T @ b, lower=False)
        for b in rhs
    )


@functools.partial(jax.jit, static_argnames=("chunk", "solver"),
                   donate_argnums=(0, 1, 2))
def _sda_chunk(Ak, Gk, Hk, it, tol, *, chunk, solver):
    """Run up to ``chunk`` doubling iterations on device (donated carries).

    The ``W = I + G H`` solve has two forms: the shared QR
    (``solver="qr"``, small D), and — past D >= 4096 — the SPD Woodbury
    form through the PSD structure (``solver="chol"``): ``H = C C^T``
    (Cholesky), ``M = I + C^T G C`` (SPD, >= I), and the HALF-projector
    ``Y = Lm^{-1} C^T`` (``M = Lm Lm^T``) so that the Woodbury projector
    is ``P = C M^{-1} C^T = Y^T Y`` and ``W^{-1} B = B - G Y^T (Y B)``
    for every rhs. Same O(D^3)-class FLOPs as the QR form, but no
    (D, D) orthogonal factor, no QR workspace, ONE lower triangular
    solve (no upper phase), and — the round-5 OOM fix at the N=1e4 f32
    seed (D = 2e4, one (D, D) = 1.6 GB) — only ``Y`` stays live through
    the update phase: materializing ``P`` itself put the peak at ~9
    resident (D, D) buffers vs ~7 for the ``Y`` form, the difference
    between ResourceExhausted and fitting a 16 GB chip next to the
    solver cache. `optimization_barrier` fences the phases so XLA's
    scheduler retires each phase's temporaries before the next
    allocates, and the update phase is ordered to drop ``WinvA`` before
    ``H_new`` allocates. ``H_k`` is PD along the iteration (``H_0 = Q >
    0`` and the update adds a PSD term), so the factorization is safe;
    a relative eps jitter guards f32 conditioning.
    """
    dtype = Hk.dtype
    D = Hk.shape[0]
    use_chol = solver == "chol"
    eye = None if use_chol else jnp.eye(D, dtype=dtype)
    diag = jnp.arange(D)

    def chol_half_projector(Gk, Hk):
        from pnmol_tpu.ops import trisolve

        jit_eps = 16.0 * jnp.finfo(dtype).eps * jnp.max(jnp.abs(Hk))
        C = jnp.linalg.cholesky(Hk.at[diag, diag].add(jit_eps))
        M = (C.T @ (Gk @ C)).at[diag, diag].add(1.0)
        Lm = jnp.linalg.cholesky(0.5 * (M + M.T))
        if D >= 4096:
            return trisolve.tri_solve_lower_blocked(Lm, C.T)
        return jax.scipy.linalg.solve_triangular(Lm, C.T, lower=True)

    def body(carry):
        Ak, Gk, Hk, it, local, _ = carry
        if use_chol:
            Y = chol_half_projector(Gk, Hk)
            # fence: everything the factorization needed (C, M, Lm) is
            # dead past here — keep the scheduler from interleaving the
            # updates' allocations with the factorization's
            Ak, Gk, Hk, Y = jax.lax.optimization_barrier((Ak, Gk, Hk, Y))
            WinvA = Ak - Gk @ (Y.T @ (Y @ Ak))
            # both consumers of WinvA (t2, A_new) run before H_new
            # allocates, so WinvA retires first — peak stays at 7 buffers
            t2 = Hk @ WinvA
            A_new = Ak @ WinvA
            Ak, Gk, Hk, Y, t2, A_new = jax.lax.optimization_barrier(
                (Ak, Gk, Hk, Y, t2, A_new)
            )
            H_new = Hk + Ak.T @ t2
            Ak, Gk, Y, A_new, H_new = jax.lax.optimization_barrier(
                (Ak, Gk, Y, A_new, H_new)
            )
            WinvG = Gk - Gk @ (Y.T @ (Y @ Gk))
            G_new = Gk + Ak @ (WinvG @ Ak.T)
        else:
            W = eye + Gk @ Hk
            WinvA, WinvG = _qr_solve(W, Ak, Gk)
            A_new = Ak @ WinvA
            G_new = Gk + Ak @ (WinvG @ Ak.T)
            H_new = Hk + Ak.T @ (Hk @ WinvA)
        # the exact iterates are symmetric; roundoff asymmetry compounds
        # through the quadratic composition, so re-symmetrize each step
        G_new = 0.5 * (G_new + G_new.T)
        H_new = 0.5 * (H_new + H_new.T)
        delta = jnp.max(jnp.abs(H_new - Hk)) / (
            jnp.max(jnp.abs(H_new)) + jnp.finfo(dtype).tiny
        )
        return A_new, G_new, H_new, it + 1, local + 1, delta

    def cond(carry):
        _, _, _, it, local, delta = carry
        return jnp.logical_and(
            local < chunk, jnp.logical_or(it < 1, delta >= tol)
        )

    init = (Ak, Gk, Hk, it, jnp.zeros((), jnp.int32),
            jnp.asarray(jnp.inf, dtype))
    with jax.default_matmul_precision("highest"):
        Ak, Gk, Hk, it, _, delta = jax.lax.while_loop(cond, body, init)
    return Ak, Gk, Hk, it, delta


def sda(A, G, Q, *, tol=1e-12, max_iters=64, chunk=None, donate=False,
        solver=None):
    """Solve ``Sigma = A Sigma (I + G Sigma)^{-1} A^T + Q`` by doubling.

    Parameters: ``A`` (D, D) transition, ``G = H^T R^{-1} H`` (D, D) PSD
    information matrix, ``Q`` (D, D) PSD process noise. Returns
    :class:`SDAResult`; ``sigma`` is the PREDICTED-covariance fixed point
    (apply one measurement update for the filtered one).

    Stops when the relative max-abs change of the iterate falls below
    ``tol`` or after ``max_iters`` doublings — iteration ``k`` covers
    ``2^k`` recursion steps, so 64 is astronomically more than any mixing
    time; typical exit is ~15-25.

    ``chunk`` bounds how many doublings run per device execution, with a
    host-side convergence check between chunks (same reason as the chunked
    Riccati recursion: remote relays kill executions past ~5 minutes, and
    one f64 doubling at D ~ 5e3 is tens of seconds of emulated-f64 QR +
    matmuls — observed TPU worker crash from one unchunked while_loop).
    Default: 4 per execution on accelerators, unchunked on CPU. The
    carried triple is DONATED between chunks, so only one generation of
    the three (D, D) iterates is ever resident.

    ``donate=True`` additionally consumes the caller's ``G`` and ``Q``
    buffers as the first-chunk carries (the caller must treat them as
    freed). At the N=1e4 seed shapes the three defensive copies are
    ~5 GB of doubled liveness — the difference between the f32 seed
    fitting a 16 GB chip and ResourceExhausted (docs/SCALE.md round 4).
    """
    dtype = Q.dtype
    if chunk is None:
        chunk = max_iters if jax.default_backend() == "cpu" else 4
    chunk = max(1, min(chunk, max_iters))

    Ak = A.T.astype(dtype)  # the transpose materializes a fresh buffer
    if donate:
        Gk = G.astype(dtype)
        Hk = Q
    else:
        Gk = G.astype(dtype) + 0  # donated carry: never consume caller's G
        Hk = Q + 0  # donated carry: never consume the caller's Q buffer
    del A, G, Q
    if solver is None:
        # past D >= 4096 the QR body's peak liveness is the binding
        # constraint on a 16 GB chip; the Cholesky-projector body fits
        # (see _sda_chunk). ``solver=`` overrides for tests/experiments.
        solver = "chol" if Hk.shape[0] >= 4096 else "qr"
    it = jnp.zeros((), jnp.int32)
    delta = float("inf")
    while int(it) < max_iters and (int(it) == 0 or delta >= tol):
        Ak, Gk, Hk, it, delta_arr = _sda_chunk(
            Ak, Gk, Hk, it, jnp.asarray(tol, dtype), chunk=chunk,
            solver=solver,
        )
        delta = float(delta_arr)
    return SDAResult(
        sigma=Hk, iterations=it, delta=delta_arr,
        anorm=jnp.max(jnp.abs(Ak)),
    )


@jax.jit
def dare_residual(sigma, A, G, Q):
    """Relative max-abs residual of the DARE at ``sigma``.

    ``||Sigma - (A Sigma (I + G Sigma)^{-1} A^T + Q)||_max / ||Sigma||_max``
    — a convergence certificate independent of the iteration's own delta.
    """
    eye = jnp.eye(Q.shape[0], dtype=Q.dtype)
    with jax.default_matmul_precision("highest"):
        # Sigma (I + G Sigma)^{-1} = (I + Sigma G)^{-1} Sigma (push-through;
        # the two factors do NOT commute, so the solve must be on the left)
        (X,) = _qr_solve(eye + sigma @ G, sigma)
        F = A @ (X @ A.T) + Q
        return jnp.max(jnp.abs(sigma - F)) / (
            jnp.max(jnp.abs(sigma)) + jnp.finfo(Q.dtype).tiny
        )


@functools.partial(jax.jit, static_argnames=("apply_T", "num_iters"))
def closed_loop_growth(apply_T, v0, num_iters=256, operands=None):
    """Estimate the spectral radius of the frozen closed loop by power
    iteration on a matvec-only operator ``apply_T`` (renormalized each
    step; the growth estimate is the geometric mean of the step norms).

    The mean-only steady-state step propagates the (scaled) state through
    ``T = (I - K H) A``; ``rho(T) < 1`` certifies the frozen-gain recursion
    is stable regardless of the convergence delta that produced the gain —
    the actionable diagnostic VERDICT asked for (a delta alone says nothing
    about the slow modes the gain error perturbs).

    ``operands``: a pytree passed through to ``apply_T(operands, v)`` as a
    RUNTIME argument. Closing the frozen blocks over ``apply_T`` instead
    serializes them as constants into the remote compile request — HTTP
    413 past ~0.5 GB on the axon relay (observed at N=5184: the (D, m)
    gain alone is 0.23 GB).
    """
    dtype = v0.dtype

    def body(carry, _):
        v, log_acc = carry
        w = apply_T(v) if operands is None else apply_T(operands, v)
        nrm = jnp.linalg.norm(w)
        v = w / (nrm + jnp.finfo(dtype).tiny)
        return (v, log_acc + jnp.log(nrm)), None

    v0 = v0 / jnp.linalg.norm(v0)
    with jax.default_matmul_precision("highest"):
        (v, log_acc), _ = jax.lax.scan(
            body, (v0, jnp.zeros((), dtype)), None, length=num_iters
        )
    return jnp.exp(log_acc / num_iters)
