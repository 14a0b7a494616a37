"""White-noise EK1 PDE filters: discretization error as measurement noise.

Capability parity with ``/root/reference/src/pnmol/white.py`` (same math:
Gram-Cholesky IWP prior, sqrt-update initialization on y0 and the linearized
PDE measurement, per-step quasi-MLE diffusion, error estimate from the dense
innovation covariance).

TPU-first shape of the step kernel: the state lives in the point-major
Nordsieck layout of :mod:`pnmol_tpu.ops.iwp`, so

* the transition and preconditioner apply as batched small matmuls /
  broadcast scales (never a dense ``(D, D)`` kron product),
* the measurement matrix ``H`` is never materialized — only products
  ``H @ X`` via derivative slices and one ``(d, d) @ (d, D)`` matmul,
* the per-step cost concentrates in exactly two QR factorizations
  (propagate + update), which XLA tiles onto the MXU,

and the whole step is a single jitted pure function consumed by the scan /
while-loop drivers in :mod:`pnmol_tpu.solvers.pdefilter`.
"""

import functools
import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from pnmol_tpu.ops import iwp, rv, sqrt
from pnmol_tpu.solvers import pdefilter
from pnmol_tpu.utils import profiling


class WhiteSolverCache(NamedTuple):
    """Per-problem constants of the white-noise step kernel (a pytree)."""

    A1d: jnp.ndarray  # (n, n) preconditioned 1-D transition
    Ql: jnp.ndarray  # (D, D) preconditioned noise factor kron(chol_gram, LQ1d)
    L: jnp.ndarray  # (d, d) differentiation matrix
    B: jnp.ndarray  # (b, d) boundary operator
    E_bc_sqrtm: jnp.ndarray  # (d + b, d + b) blockdiag(E_sqrtm, R_sqrtm)


def _measurement_operator(cache, G, p, n, matmul=None):
    """Return X -> H @ X for the EK1 measurement, without materializing H.

    ``H = [p1 * E1 - G (p0 * E0); p0 * B E0]`` in preconditioned coordinates
    (G = Jx for linear problems, Jx + L for semilinear ones).

    ``matmul(Op, X)`` overrides the two operator products — the seam the
    distributed tier uses for its ring matmul: GSPMD's own partitioning of
    ``L @ X0`` (row-sharded L, column-sharded X0) ALL-GATHERS L, ~49
    GB/device at the N=1e5 3-D shapes (docs/SCALE.md round 4).
    """

    def apply_H(X):
        X0 = iwp.project_derivative(X, 0, n)
        X1 = iwp.project_derivative(X, 1, n)
        if matmul is None:
            ode_rows = p[1] * X1 - G @ (p[0] * X0)
            bc_rows = cache.B @ (p[0] * X0)
        else:
            X0s = p[0] * X0
            ode_rows = p[1] * X1 - matmul(G, X0s)
            bc_rows = matmul(cache.B, X0s)
        return jnp.concatenate((ode_rows, bc_rows), axis=0)

    return apply_H


def _linearize(pde_f, pde_df, L, t, m_at, linear: bool, ek_order: int = 1):
    """EK{0,1} linearization at the predicted point: (G, shift).

    ``ek_order=1`` (EK1) linearizes ``f`` with its Jacobian; ``ek_order=0``
    (EK0) uses the zeroth-order model ``f(u) ~ f(m)`` — same innovation
    MEAN (``z = u' - L u - f(m)``), but the measurement operator carries
    only ``L``, so the covariance/gain never see the Jacobian (and ``df``
    is never evaluated). Reference measurement-model seam:
    ``/root/reference/src/pnmol/white.py:189-208``. For linear problems the
    two coincide exactly (the "Jacobian" IS ``L``).
    """
    if linear:
        return L, jnp.zeros_like(m_at)
    fx = pde_f(t, m_at)
    if ek_order == 0:
        return L, -fx
    Jx = pde_df(t, m_at)
    return Jx + L, Jx @ m_at - fx


@functools.partial(
    jax.jit,
    static_argnames=("num_derivatives", "f", "df", "linear", "fused",
                     "factorization", "meascov_dt_scaled", "propagate_band",
                     "ek_order"),
)
def white_attempt_step(cache, mean, cov_sqrtm, t_next, dt, *, num_derivatives,
                       f, df, linear, fused, factorization=None,
                       meascov_dt_scaled=False, propagate_band=None,
                       ek_order=1):
    """One white-noise EK1 attempt step (module-level jit: compilations are
    shared across solver instances with the same shapes and statics).

    Semantics identical to the reference ``attempt_step``
    (``/root/reference/src/pnmol/white.py:96-146``); see
    :func:`make_white_step_fn` for the calling convention.
    """
    n = num_derivatives + 1
    d = mean.shape[1]
    m_dim = d + cache.B.shape[0]
    p, p_inv = iwp.nordsieck_scales_1d(num_derivatives, dt)

    # Optional dt-scaled measurement noise: treat the discretization error as
    # a white noise in *time* with spectral density E E^T, so each step's
    # measurement covariance is dt * E E^T (factor sqrt(dt) E). The
    # reference's fixed per-step E (white.py:169-186) makes very small steps
    # counterproductive on nonlinear problems — the documented PNMOL-white
    # floor (tests/test_solvers/test_convergence.py); this variant removes
    # the floor at the cost of deviating from the paper's calibration.
    E_bc = cache.E_bc_sqrtm
    if meascov_dt_scaled:
        E_bc = jnp.sqrt(dt) * E_bc

    # [Precondition]
    M = mean * p_inv[:, None]
    Cl = iwp.scale_stack(p_inv, cov_sqrtm)

    # [Predict mean]
    Mp = cache.A1d @ M

    # [Linearize] (EK1 at the predicted point)
    m_at = p[0] * Mp[0]
    G, shift = _linearize(f, df, cache.L, t_next, m_at, linear, ek_order)
    apply_H = _measurement_operator(
        cache, G, p, n,
        matmul=getattr(factorization, "operator_matmul", None),
    )

    # [Residual] z = H mp + [shift; 0]
    z_ode = p[1] * Mp[1] - G @ m_at + shift
    z_bc = cache.B @ m_at
    z = jnp.concatenate((z_ode, z_bc))

    # [Error estimate] S = H Q H^T + E E^T on the small (m, m) system.
    # S is SPD: solve via Cholesky (TPU-friendly; LU is not supported in
    # f64 on TPU and slower in any case). The distributed tier routes this
    # through its ``innovation_whiten`` hook: ``cholesky`` cannot be GSPMD-
    # partitioned, so the dense path REPLICATES the (m, m) S on every
    # device (~61 GB at the N=1e5 3-D shapes — docs/SCALE.md round 4).
    HQl = apply_H(cache.Ql)
    whiten_hook = getattr(factorization, "innovation_whiten", None)
    if whiten_hook is not None:
        diag_S, whitened = whiten_hook(HQl, E_bc, z)
        sigma_squared = z @ whitened / m_dim
        error = jnp.sqrt(diag_S) * jnp.sqrt(sigma_squared)
    else:
        S = HQl @ HQl.T + E_bc @ E_bc.T
        S_chol = jnp.linalg.cholesky(S)
        whitened = jax.scipy.linalg.cho_solve((S_chol, True), z)
        sigma_squared = z @ whitened / m_dim
        error = jnp.sqrt(jnp.diag(S)) * jnp.sqrt(sigma_squared)
    error = dt * error[:d]  # drop boundary rows; dt-weight as the reference

    # [Predict + update covariance]
    # Every pipeline below produces the raw factor blocks (Cl_new, L21, Sl)
    # with S_xz = L21 Sl^T: the Kalman gain K = L21 Sl^{-1} is never
    # materialized, because the mean update only needs
    # K @ z = L21 @ (Sl^{-1} z) — and Sl^{-1} z is exactly the whitened
    # residual the diffusion calibration needs. One shared VECTOR triangular
    # solve replaces the (m, m) x (D rhs) matrix gain solve (measured
    # 2 ms/step at N=512; a multi-GB XLA trisolve expansion and an (D, m)
    # gain buffer at N=1e4 — docs/SCALE.md round 3).
    ACl = iwp.apply_stack_matrix(cache.A1d, Cl)
    if factorization is not None and not fused and hasattr(
        factorization, "propagate"
    ):
        # two-QR pipeline through the custom factorization (memory-lighter:
        # the fused pre-array is the HBM peak at the largest single-chip N).
        # ``propagate_band`` exploits the propagate pre-array's triangular
        # structure (Ql = kron(chol_gram, LQ1d) is lower-triangular in the
        # point-major layout): "banded" windows the sweep to row support
        # D + r (~40% fewer trailing FLOPs, no precondition on Cl);
        # "interleaved" interleaves the point blocks of ACl and Ql for row
        # support 2r + n (~5x fewer FLOPs) — valid ONLY when the state
        # factor is lower-triangular, which the solver guarantees by
        # re-triangularizing the init factor (every step's posterior factor
        # is triangular by construction of the blocked LQ).
        prop = factorization.propagate
        if propagate_band == "interleaved" and hasattr(prop, "interleaved"):
            Clp = prop.interleaved(ACl, cache.Ql, n)
        elif propagate_band is not None and hasattr(prop, "banded"):
            Clp = prop.banded(ACl, cache.Ql)
        else:
            Clp = prop(ACl, cache.Ql)
        HClp = apply_H(Clp)
        upd = factorization.update_from_products
        if propagate_band is not None and hasattr(upd, "blocks_banded"):
            # the update pre-array is (D+1, 1)-banded whenever the
            # measurement-noise factor is lower-triangular (always true for
            # the discretization layer's E_sqrtm / R_sqrtm): ~15% fewer
            # update FLOPs at m ~ D/2
            Cl_new, L21, Sl = upd.blocks_banded(HClp, Clp, E_bc)
        elif hasattr(upd, "blocks"):
            Cl_new, L21, Sl = upd.blocks(HClp, Clp, E_bc)
        else:
            Cl_new, L21, Sl = sqrt.update_sqrt_from_products_blocks(
                HClp, Clp, E_bc
            )
    elif factorization is not None:
        # pluggable pre-array factorization (e.g. the distributed blocked QR
        # in pnmol_tpu.parallel.sharded_linalg); same contract as
        # sqrt.fused_predict_update. Hooks carrying a ``.blocks`` attribute
        # skip their gain solve entirely.
        HACl = apply_H(ACl)
        if propagate_band is not None and hasattr(
            factorization, "blocks_banded"
        ):
            Cl_new, L21, Sl = factorization.blocks_banded(
                HACl, ACl, HQl, cache.Ql, E_bc
            )
        elif hasattr(factorization, "blocks"):
            Cl_new, L21, Sl = factorization.blocks(
                HACl, ACl, HQl, cache.Ql, E_bc
            )
        else:
            Cl_new, K, Sl = factorization(HACl, ACl, HQl, cache.Ql, E_bc)
            L21 = None
    elif fused:
        # one pre-array QR; HQl is shared with the error estimate above
        HACl = apply_H(ACl)
        Cl_new, L21, Sl = sqrt.fused_predict_update_blocks(
            HACl, ACl, HQl, cache.Ql, E_bc
        )
    else:
        Clp = sqrt.propagate_cholesky_factor(ACl, cache.Ql)
        HClp = apply_H(Clp)
        Cl_new, L21, Sl = sqrt.update_sqrt_from_products_blocks(
            HClp, Clp, E_bc
        )

    # [Calibrate + mean update] whitened residual via the LOWER solve
    # Sl w = z; the true Mahalanobis form z^T S^{-1} z with S = Sl Sl^T.
    # (The reference solves against Sl^T — ``white.py:125`` — which yields
    # z^T (R1 R1^T)^{-1} z instead and silently depends on the QR sign
    # convention; the lower solve is invariant.)
    residual_white = jax.scipy.linalg.solve_triangular(Sl, z, lower=True)
    diffusion_sq = residual_white @ residual_white / m_dim
    if L21 is not None:
        m_new_flat = iwp.mean_to_flat(Mp) - L21 @ residual_white
    else:  # legacy hook contract: explicit gain
        m_new_flat = iwp.mean_to_flat(Mp) - K @ z

    # [Un-precondition]
    M_new = iwp.flat_to_mean(m_new_flat, n) * p[:, None]
    C_new = iwp.scale_stack(p, Cl_new)
    reference = jnp.abs(M_new[0])
    return M_new, C_new, error, reference, diffusion_sq


def make_white_step_fn(*, cache: WhiteSolverCache, num_derivatives: int,
                       f: Optional[Callable], df: Optional[Callable],
                       linear: bool, fused: bool = True, factorization=None,
                       meascov_dt_scaled: bool = False, propagate_band=None,
                       ek_order: int = 1):
    """Bind a cache to the shared step kernel.

    Returns ``step(mean (n,d), cov (D,D), t_next, dt) ->
    (mean, cov, error_estimate (d,), reference (d,), diffusion_sq ())``.

    ``fused=True`` (default) runs predict+update as ONE pre-array QR
    (:func:`pnmol_tpu.ops.sqrt.fused_predict_update`) — mathematically
    identical Gram, fewer launches; ``fused=False`` keeps the reference's
    two-QR pipeline (used by the oracle equivalence tests).
    ``factorization`` overrides the pre-array factorization with a custom
    callable ``(HACl, ACl, HQl, Ql, R) -> (posterior_factor, gain,
    innovation_factor)`` — the hook the distributed blocked QR plugs into.
    """
    return functools.partial(
        white_attempt_step,
        cache,
        num_derivatives=num_derivatives,
        f=f,
        df=df,
        linear=linear,
        fused=fused,
        factorization=factorization,
        meascov_dt_scaled=meascov_dt_scaled,
        propagate_band=propagate_band,
        ek_order=ek_order,
    )


class SteadyStateCache(NamedTuple):
    """Frozen factor blocks of the steady-state (stationary) white step."""

    cov_inf: jnp.ndarray  # (D, D) stationary posterior factor (unprecond.)
    L21: jnp.ndarray  # (D, m) stationary cross block (preconditioned)
    Sl: jnp.ndarray  # (m, m) stationary innovation factor (preconditioned)
    Sl_inv: jnp.ndarray  # (m, m) explicit inverse of Sl: the step whitens
    # residuals with a matvec instead of a vector triangular solve (which
    # is latency-bound on TPU); computed once, by one m-RHS trisolve
    err_vec: jnp.ndarray  # (d,) dt * sqrt(diag(S_infty)) error-estimate base
    iterations: jnp.ndarray  # () number of Riccati iterations run
    delta: jnp.ndarray  # () final relative change of the Gram diagonal


def _triangular_inverse(Sl):
    """Explicit inverse of a lower-triangular factor (one m-RHS solve).

    Large factors route through the blocked O(matrix)-memory substitution:
    XLA's trisolve expander plans ~18 live (m, m) temporaries for wide RHS
    (the round-3 N=1e4 wall — see ops/trisolve.py).
    """
    m = Sl.shape[0]
    eye = jnp.eye(m, dtype=Sl.dtype)
    if m >= 4096:
        from pnmol_tpu.ops import trisolve

        return trisolve.tri_solve_lower_blocked(Sl, eye)
    return jax.scipy.linalg.solve_triangular(Sl, eye, lower=True)


def converge_white_steady_state(cache, cov_sqrtm, dt, *, num_derivatives,
                                fused=True, factorization=None,
                                propagate_band=None, meascov_dt_scaled=False,
                                tol=1e-8, max_iters=200, harvest=True):
    """Iterate the white step's covariance recursion to its fixed point.

    ``harvest=False`` skips the frozen-block extraction (the extra
    cov_step + L21/Sl/Sl_inv/err_vec work) and returns dummies in those
    slots — the chunked host loop (:func:`run_steady_convergence`) only
    reads ``(cov_inf, iterations, delta)`` between chunks, and fusing the
    harvest into every chunk's XLA program both re-did its work per chunk
    and co-scheduled its ~3-4 GB of outputs/temps with the sweep's peak
    (the round-5 polish OOM at N=1e4). The final harvest runs as its own
    jit with ``max_iters=0``.

    For LINEAR problems at constant ``dt`` the measurement operator is
    time-invariant, so the covariance half of the Kalman recursion is
    data-independent: ``Cl_{k+1} = F(Cl_k)`` converges to the square-root
    solution of the discrete algebraic Riccati equation. This runs that
    recursion (the exact per-step pipeline — same QRs, same factorization
    hook) inside one ``lax.while_loop`` until the covariance Gram diagonal
    is stationary to ``tol`` (relative), then returns the frozen blocks the
    mean-only steady-state step consumes.

    A capability beyond the reference (which re-factorizes the identical
    pre-array every step): after convergence each step costs O(D*m) matmul
    work instead of O((D+m)^3) QR work. Classical steady-state Kalman
    filtering; exactness is up to the convergence tolerance of the
    transient (see docs/SCALE.md "Steady-state mode").
    """
    n = num_derivatives + 1
    D = cov_sqrtm.shape[0]
    d = D // n
    m_dim = d + cache.B.shape[0]
    p, p_inv = iwp.nordsieck_scales_1d(num_derivatives, dt)
    E_bc = cache.E_bc_sqrtm
    if meascov_dt_scaled:
        E_bc = jnp.sqrt(dt) * E_bc
    apply_H = _measurement_operator(
        cache, cache.L, p, n,
        matmul=getattr(factorization, "operator_matmul", None),
    )

    def cov_step(C_unpre):
        """One covariance-only white step (mirrors white_attempt_step)."""
        Cl = iwp.scale_stack(p_inv, C_unpre)
        ACl = iwp.apply_stack_matrix(cache.A1d, Cl)
        if factorization is not None and not fused and hasattr(
            factorization, "propagate"
        ):
            prop = factorization.propagate
            if propagate_band == "interleaved" and hasattr(prop, "interleaved"):
                Clp = prop.interleaved(ACl, cache.Ql, n)
            elif propagate_band is not None and hasattr(prop, "banded"):
                Clp = prop.banded(ACl, cache.Ql)
            else:
                Clp = prop(ACl, cache.Ql)
            HClp = apply_H(Clp)
            upd = factorization.update_from_products
            if propagate_band is not None and hasattr(upd, "blocks_banded"):
                Cl_new, L21, Sl = upd.blocks_banded(HClp, Clp, E_bc)
            elif hasattr(upd, "blocks"):
                Cl_new, L21, Sl = upd.blocks(HClp, Clp, E_bc)
            else:
                Cl_new, L21, Sl = sqrt.update_sqrt_from_products_blocks(
                    HClp, Clp, E_bc
                )
        elif factorization is not None:
            HACl = apply_H(ACl)
            HQl = apply_H(cache.Ql)
            if hasattr(factorization, "blocks"):
                Cl_new, L21, Sl = factorization.blocks(
                    HACl, ACl, HQl, cache.Ql, E_bc
                )
            else:
                Cl_new, K, Sl = factorization(HACl, ACl, HQl, cache.Ql, E_bc)
                L21 = K @ Sl  # back out the cross block: S_xz = K S = L21 Sl^T
        elif fused:
            HACl = apply_H(ACl)
            HQl = apply_H(cache.Ql)
            Cl_new, L21, Sl = sqrt.fused_predict_update_blocks(
                HACl, ACl, HQl, cache.Ql, E_bc
            )
        else:
            Clp = sqrt.propagate_cholesky_factor(ACl, cache.Ql)
            HClp = apply_H(Clp)
            Cl_new, L21, Sl = sqrt.update_sqrt_from_products_blocks(
                HClp, Clp, E_bc
            )
        return iwp.scale_stack(p, Cl_new), L21, Sl

    # The while_loop carries ONLY the (D, D) factor: carrying (L21, Sl) too
    # would double-buffer an extra (D, m) + (m, m) through every iteration —
    # at N=1e4 that ~1.8 GB is the difference between fitting and OOM. The
    # frozen blocks come from one extra cov_step AFTER convergence, which
    # also pairs them with the converged factor itself rather than with the
    # penultimate iterate.
    def body(carry):
        C, it, _ = carry
        C_new, _, _ = cov_step(C)
        diag_old = jnp.sum(C * C, axis=1)
        diag_new = jnp.sum(C_new * C_new, axis=1)
        delta = jnp.max(jnp.abs(diag_new - diag_old)) / (
            jnp.max(diag_new) + jnp.finfo(C.dtype).tiny
        )
        return C_new, it + 1, delta

    def cond(carry):
        _, it, delta = carry
        return jnp.logical_and(it < max_iters,
                               jnp.logical_or(it < 2, delta >= tol))

    dtype = cov_sqrtm.dtype
    init = (
        cov_sqrtm,
        jnp.zeros((), jnp.int32),
        jnp.asarray(jnp.inf, dtype),
    )
    # The recursion and the frozen blocks need full-precision matmuls: at
    # the TPU default (single-pass bf16) the Gram-diagonal delta floors at
    # ~3e-3 — the fixed point is never certified — and the frozen gain is
    # bf16-grade, which leaves the mean recursion marginally unstable
    # (observed: flat heat trajectories at D ~ 1e4). "highest" here is the
    # correctness requirement, not a tuning choice; no-op on CPU.
    with jax.default_matmul_precision("highest"):
        C_conv, iters, delta = jax.lax.while_loop(cond, body, init)
        if not harvest:
            dummy = jnp.zeros((1, 1), dtype)
            return SteadyStateCache(
                cov_inf=C_conv, L21=dummy, Sl=dummy, Sl_inv=dummy,
                err_vec=jnp.zeros((d,), dtype), iterations=iters,
                delta=delta,
            )
        C_inf, L21, Sl = cov_step(C_conv)

        HQl = apply_H(cache.Ql)
        # diag(S) only: row norms — the full (m, m) S Gram (plus the
        # E_bc one) is ~1 GB of dead output at N=1e4
        s_diag = jnp.sum(HQl * HQl, axis=1) + jnp.sum(E_bc * E_bc, axis=1)
        err_vec = dt * jnp.sqrt(s_diag)[:d]
        Sl_inv = _triangular_inverse(Sl)
    return SteadyStateCache(cov_inf=C_inf, L21=L21, Sl=Sl, Sl_inv=Sl_inv,
                            err_vec=err_vec, iterations=iters, delta=delta)


def white_dense_system(cache, dt, *, num_derivatives, meascov_dt_scaled=False):
    """Dense ``(A, H, Q, R, p)`` of the scaled-coordinate step recursion.

    The per-step covariance map (``cov_step`` in
    :func:`converge_white_steady_state`) conjugates by the Nordsieck scales,
    which cancel between consecutive steps — so the recursion's fixed point
    lives in scaled coordinates with time-invariant dense operators:
    transition ``A = kron(I_d, A1d)``, measurement ``H`` (the operator
    :func:`_measurement_operator` applied to the identity), process noise
    ``Q = Ql Ql^T`` and measurement noise ``R = E_bc E_bc^T``. Used only by
    the one-time doubling seed — the step kernels never materialize these.
    """
    n = num_derivatives + 1
    D = cache.Ql.shape[0]
    dtype = cache.Ql.dtype
    dt = jnp.asarray(dt, dtype)
    p, _ = iwp.nordsieck_scales_1d(num_derivatives, dt)
    E_bc = cache.E_bc_sqrtm
    if meascov_dt_scaled:
        E_bc = jnp.sqrt(dt) * E_bc
    eye = jnp.eye(D, dtype=dtype)
    A = iwp.apply_stack_matrix(cache.A1d, eye)
    H = _measurement_operator(cache, cache.L, p, n)(eye)
    Q = cache.Ql @ cache.Ql.T
    R = E_bc @ E_bc.T
    return A, H, Q, R, p


@jax.jit
def _factored_dare_residual(sigma, Wh, A1d, Ql):
    """DARE residual without dense ``A``/``G``/``Q`` operands.

    Algebra: with ``sigma = C C^T`` (PD) and ``G = Wh^T Wh``,
    ``sigma (I + G sigma)^{-1} = C (I + C^T G C)^{-1} C^T = Y^T Y`` where
    ``M = I + Z^T Z`` (``Z = Wh C``), ``M = Lm Lm^T``, ``Y = Lm^{-1} C^T``
    — the same half-projector trick as the SDA chol body. The transition
    applies through the Kronecker point-block structure
    (:func:`pnmol_tpu.ops.iwp.apply_stack_matrix`) and the process noise
    through its factor, so the (D, D) dense ``A``, ``G``, ``Q`` of
    :func:`pnmol_tpu.ops.dare.dare_residual` are never rebuilt — at the
    N=1e4 f32 seed that rebuild (A + Q + eye + G0, ~6.4 GB) was the
    post-loop memory peak (round 5). Matches the dense residual to
    roundoff (tests/test_solvers/test_steady_state.py).
    """
    from pnmol_tpu.ops import trisolve

    D = sigma.shape[0]
    dtype = sigma.dtype
    diag = jnp.arange(D)
    with jax.default_matmul_precision("highest"):
        sig = 0.5 * (sigma + sigma.T)
        jit_eps = 16.0 * jnp.finfo(dtype).eps * jnp.max(jnp.abs(sig))
        C = jnp.linalg.cholesky(sig.at[diag, diag].add(jit_eps))
        Z = Wh @ C  # (m, D)
        M = (Z.T @ Z).at[diag, diag].add(1.0)
        Lm = jnp.linalg.cholesky(0.5 * (M + M.T))
        if D >= 4096:
            Y = trisolve.tri_solve_lower_blocked(Lm, C.T)
        else:
            Y = jax.scipy.linalg.solve_triangular(Lm, C.T, lower=True)
        X = Y.T @ Y  # sigma (I + G sigma)^{-1}, symmetric
        # A X A^T = A (A X)^T for symmetric X — no explicit transpose of
        # the result needed
        T1 = iwp.apply_stack_matrix(A1d, X)
        F = iwp.apply_stack_matrix(A1d, T1.T) + Ql @ Ql.T
        return jnp.max(jnp.abs(sig - F)) / (
            jnp.max(jnp.abs(sig)) + jnp.finfo(dtype).tiny
        )


def steady_state_sda_seed(cache, dt, *, num_derivatives,
                          meascov_dt_scaled=False, bc_nugget=1e-6,
                          max_iters=64, tol=None, update_fn=None):
    """Solve the steady-state covariance directly by doubling (SDA).

    Returns ``(C0, info)``: ``C0`` the stationary POSTERIOR factor in the
    unpreconditioned basis (the seed for the exact square-root polish that
    produces the frozen blocks), ``info`` a dict of diagnostics
    (``sda_iterations``, ``sda_delta``, ``dare_residual``).

    Replaces the ``O(1/dt)``-iteration fixed-point recursion with
    ``~log2(1/(lambda_min*dt))`` doubling iterations
    (:mod:`pnmol_tpu.ops.dare`). Dirichlet problems carry EXACT boundary
    measurements (``R_sqrtm = 0`` — models/mixins.py), so the SDA
    initialization ``G0 = H^T R^{-1} H`` floors ``diag(R)`` at
    ``bc_nugget^2`` times the innovation scale; the bias this adds is
    ``O(bc_nugget^2)`` relative (the prior innovation dominates those rows)
    and the FILTERED update below uses the exact noise factor again (one
    square-root measurement update of the predicted fixed point's
    Cholesky factor — fully on device; see :func:`sda_seed_from_dense`).
    """
    import numpy as _np

    # cache MOVE: callers may pass the cache as a one-element list — the
    # seed then owns the only live reference, and can host-stash the
    # cache's big blocks (Ql (D, D), E_bc (m, m)) through the doubling
    # loop. With multi-frame references those blocks stay resident on the
    # chip for the whole loop (2 GB at the N=1e4 f32 seed — measured
    # ResourceExhausted, round 5). The restored cache is pushed back into
    # the same list before returning.
    boxed = isinstance(cache, list)
    if boxed:
        box = cache
        cache = box.pop()

    # ownership-transfer convention for the dense operands too: they go
    # straight into a dict WITHOUT local names — a caller-frame reference
    # would keep each device buffer alive through the doubling loop even
    # after the callee drops/donates it (1.6 GB per (D, D) at this size)
    ops = {}
    ops["A"], ops["H"], ops["Q"], ops["R"], p = white_dense_system(
        cache, dt, num_derivatives=num_derivatives,
        meascov_dt_scaled=meascov_dt_scaled,
    )

    stash = boxed and jax.default_backend() != "cpu"
    holder = {"cache": cache}
    if stash:
        Ql_host = _np.asarray(cache.Ql)
        Ebc_host = _np.asarray(cache.E_bc_sqrtm)
        dummy = jnp.zeros((1, 1), cache.Ql.dtype)
        holder["cache"] = cache._replace(Ql=dummy, E_bc_sqrtm=dummy)
    del cache

    def _restore():
        c = holder["cache"]
        if stash and c.Ql.shape == (1, 1):
            c = c._replace(
                Ql=jnp.asarray(Ql_host), E_bc_sqrtm=jnp.asarray(Ebc_host)
            )
            holder["cache"] = c
        return c

    def meascov_fn():
        # restores ONLY the (m, m) noise factor: the posterior update
        # that consumes it never reads Ql (which residual_fn re-stashed)
        c = holder["cache"]
        if stash and c.E_bc_sqrtm.shape == (1, 1):
            c = c._replace(E_bc_sqrtm=jnp.asarray(Ebc_host))
            holder["cache"] = c
        E_bc = c.E_bc_sqrtm
        if meascov_dt_scaled:
            E_bc = jnp.sqrt(jnp.asarray(dt, E_bc.dtype)) * E_bc
        return E_bc

    def residual_fn(sigma, Wh):
        c = _restore()
        r = float(_factored_dare_residual(sigma, Wh, c.A1d, c.Ql))
        if stash:
            # the posterior update next never reads Ql: send it back to
            # host until the final restore (1.6 GB at the N=1e4 seed)
            holder["cache"] = holder["cache"]._replace(
                Ql=jnp.zeros((1, 1), holder["cache"].Ql.dtype)
            )
        return r

    out = sda_seed_from_dense(
        ops, p, meascov_sqrtm=meascov_fn, bc_nugget=bc_nugget,
        max_iters=max_iters, tol=tol, residual_fn=residual_fn,
        update_fn=update_fn,
    )
    if boxed:
        box.append(_restore())
    return out


def _wide_lower_solve(L, B):
    """``L^{-1} B`` routed through the blocked panel solve past the XLA
    triangular-solve expander's wall (~18 live shrinking (m, K) temps for a
    wide RHS — at the N=1e4 seed shapes, m ~ 1e4 x K = 2e4, those temps
    alone OOM a 16 GB chip; measured round 5, same wall as ops/trisolve)."""
    if L.shape[0] >= 4096:
        from pnmol_tpu.ops import trisolve

        return trisolve.tri_solve_lower_blocked(L, B)
    return jax.scipy.linalg.solve_triangular(L, B, lower=True)


def sda_seed_from_dense(ops, p, *, meascov_sqrtm=None, bc_nugget=1e-6,
                        max_iters=64, tol=None, residual_fn=None,
                        update_fn=None):
    """Shared SDA-seed core over a dense ``(A, H, Q, R)`` system.

    ``ops`` is a dict ``{"A", "H", "Q", "R"}`` whose entries this function
    POPS — an ownership transfer. Callers must not keep their own
    references to the arrays (build the dict without local names, as
    :func:`steady_state_sda_seed` does): a surviving caller-frame
    reference keeps the device buffer alive through the doubling loop,
    and at the N=1e4 seed shapes every stray (D, D)/(m, D) is 0.8-1.6 GB
    of the 16 GB chip. See :func:`steady_state_sda_seed` for the
    nugget/jitter rationale.

    ``meascov_sqrtm`` is the (m, m) noise FACTOR (``R = E E^T``), or a
    CALLABLE returning it (resolved only after the doubling loop, so the
    factor need not be device-resident during it); when omitted it is
    derived as ``chol(R + eps I)``, which is exact for the zero and
    full-rank cases the seeds produce.

    ``update_fn``: the square-root measurement-update primitive for the
    posterior factor (``(HC, C, R) -> (posterior, L21, Sl)``), default
    :func:`pnmol_tpu.ops.sqrt.update_sqrt_from_products`. Callers at
    scale pass their problem-sized Pallas hook
    (:func:`resolve_householder_hooks`' init update): the plain XLA QR of
    the ((D+m), (m+D)) update pre-array was the post-loop OOM at the
    N=1e4 f32 seed (round 5) — the blocked LQ runs it in O(matrix)
    memory, exactly as it does for the init QR at the same shapes.

    ``residual_fn(sigma, Wh) -> residual``: when given, the dense
    ``A``/``Q``/``G0`` buffers are DONATED into the doubling loop (no
    rebuild — the residual certificate is computed operator-form from the
    whitened measurement ``Wh = Lr^{-1} H``, e.g.
    :func:`_factored_dare_residual`), and ``H``/``Wh`` are STASHED TO
    HOST across the loop. At the N=1e4 f32 seed shapes the combined
    liveness this removes (dense rebuild ~6.4 GB post-loop, ~1.6 GB
    through it) is the difference between fitting a 16 GB chip and
    ResourceExhausted (docs/SCALE.md rounds 4-5). Without it the dense
    :func:`pnmol_tpu.ops.dare.dare_residual` runs on the retained
    operands (the small-problem path).
    """
    import numpy as _np

    from pnmol_tpu.ops import dare

    with jax.default_matmul_precision("highest"):
        A = ops.pop("A")
        H = ops.pop("H")
        Q = ops.pop("Q")
        R = ops.pop("R")
        dtype = Q.dtype
        if tol is None:
            tol = 1e-12 if dtype == jnp.float64 else 1e-6

        # invertible R for G0: floor the diagonal at bc_nugget^2 * the
        # innovation scale (max over diag(R) and diag(H Q H^T); the
        # products stay (m, D) — no (m, m) Gram is materialized here)
        HQ_gram_diag = jnp.sum((H @ Q) * H, axis=1)
        scale = jnp.maximum(jnp.max(jnp.diag(R)), jnp.max(HQ_gram_diag))
        nug = (bc_nugget ** 2) * scale
        R_eps = R + nug * jnp.eye(R.shape[0], dtype=dtype)
        if meascov_sqrtm is not None:
            del R  # only diag(R) was needed; drop the (m, m) buffer
        Lr = jnp.linalg.cholesky(R_eps)
        Wh = _wide_lower_solve(Lr, H)
        G0 = Wh.T @ Wh
        del R_eps

        if residual_fn is None:
            del Wh
            res = dare.sda(A, G0, Q, tol=tol, max_iters=max_iters)
            residual = dare.dare_residual(res.sigma, A, G0, Q)
            del A, Q, Lr
        else:
            del Lr  # the certificate + posterior update never read it
            # host-stash H/Wh through the doubling loop: both are only
            # read again afterwards, and on the 16 GB chip their ~1.6 GB
            # is real headroom for the loop's (D, D) working set
            stash = jax.default_backend() != "cpu"
            if stash:
                H_host, Wh_host = _np.asarray(H), _np.asarray(Wh)
                del H, Wh
            from pnmol_tpu.utils import debug as debug_util

            debug_util.dump_live_arrays("pre_sda")
            res = dare.sda(A, G0, Q, tol=tol, max_iters=max_iters,
                           donate=True)
            del A, Q  # consumed by the donated doubling carries
            if stash:
                Wh = jnp.asarray(Wh_host)
                del Wh_host
            residual = residual_fn(res.sigma, Wh)
            # pull the certificate to host NOW: it sequences the
            # residual's working set ahead of the posterior update's —
            # their (D, D) peaks must not overlap on a 16 GB chip
            residual = float(residual)
            del Wh
            if stash:
                H = jnp.asarray(H_host)
                del H_host
        del G0

        # Filtered stationary FACTOR without ever forming the filtered
        # covariance P (P is rank-deficient along the exactly-constrained
        # boundary directions — zero-noise rows drop rank every update —
        # so chol(P) NaNs and an eigh of the dense (D, D) P was the
        # round-4 scale wall: host LAPACK eigh is hours at D = 2e4 on this
        # box, and TPU's QDWH eigh NaNs in f64 on v5e). Instead: Cholesky
        # the PREDICTED fixed point (PD — ``sigma >= Q > 0`` in the PSD
        # order, and the preconditioned Q is well-conditioned), then apply
        # ONE exact square-root measurement update with the exact noise
        # factor. The update pre-array QR handles exactly-zero noise rows
        # the same way the per-step pipeline does every step, and returns
        # the lower-triangular posterior factor directly.
        sda_iterations = int(res.iterations)
        sda_delta = float(res.delta)
        sigma = 0.5 * (res.sigma + res.sigma.T)
        del res  # only sigma (and the scalars above) survive
        C_pred = jnp.linalg.cholesky(sigma)
        if meascov_sqrtm is None:
            meascov_sqrtm = jnp.where(
                jnp.max(jnp.diag(R)) > 0,
                jnp.linalg.cholesky(
                    R + nug * jnp.eye(R.shape[0], dtype=dtype)),
                jnp.zeros_like(R),
            )
        elif callable(meascov_sqrtm):
            meascov_sqrtm = meascov_sqrtm()
        if not bool(jnp.all(jnp.isfinite(C_pred))):
            # f32 fallback: cond(sigma) can exceed f32's Cholesky range on
            # stiff fine-dx systems; retry with an eps-scaled jitter (the
            # seed feeds a polish that re-derives the factor through the
            # exact pipeline, so the jitter bias is one-shot)
            jit_eps = jnp.finfo(dtype).eps * jnp.max(jnp.diag(sigma))
            C_pred = jnp.linalg.cholesky(
                sigma + jit_eps * jnp.eye(sigma.shape[0], dtype=dtype)
            )
        del sigma  # C_pred carries it from here
        HC = H @ C_pred
        del H
        # the update runs JITTED with donated operands: run eagerly, the
        # ((D+m), (m+D)) pre-array assembly materializes every concat
        # (~10 GB transient at the N=1e4 shapes — the round-5 OOM after
        # the loop itself fit), while under jit XLA owns the liveness,
        # reuses the donated HC/C_pred, and DCEs the unused L21/Sl blocks
        update = update_fn or sqrt.update_sqrt_from_products
        donate = () if jax.default_backend() == "cpu" else (0, 1)
        C_post = jax.jit(
            lambda HC_, C_, E_: update(HC_, C_, E_)[0],
            donate_argnums=donate,
        )(HC, C_pred, meascov_sqrtm)
        del HC, C_pred
        C0 = iwp.scale_stack(p, C_post)
    info = {
        "sda_iterations": sda_iterations,
        "sda_delta": sda_delta,
        "dare_residual": float(residual),
    }
    return C0, info


def steady_closed_loop_radius(cache, steady, dt, *, num_derivatives,
                              num_iters=256):
    """Spectral-radius estimate of the frozen closed loop ``T = (I - K H) A``.

    Matvec-only power iteration (O(D*m) per iteration — no dense T), on the
    exact operator the mean-only step applies
    (:func:`make_steady_state_white_step`). ``rho < 1`` certifies the
    frozen-gain recursion is stable independent of the convergence delta
    that produced the gain — the actionable stability diagnostic for
    steady-state runs (docs/SCALE.md "Steady-state mode").
    """
    from pnmol_tpu.ops import dare

    n = num_derivatives + 1
    D = cache.Ql.shape[0]
    dtype = cache.Ql.dtype
    p, _ = iwp.nordsieck_scales_1d(num_derivatives, jnp.asarray(dt, dtype))

    # frozen blocks ride as RUNTIME arguments — closed over they become
    # compile-request constants (HTTP 413 on the relay past ~0.5 GB; the
    # (D, m) gain alone is 0.23 GB at N=5184). The (D, D) stationary
    # factor and (m, m) Sl are not read by the matvec: strip them.
    dummy = jnp.zeros((1, 1), dtype)
    operands = (cache, steady._replace(cov_inf=dummy, Sl=dummy), p)

    def apply_T(ops, v):
        cache_, steady_, p_ = ops
        apply_H = _measurement_operator(cache_, cache_.L, p_, n)
        va = iwp.apply_stack_matrix(cache_.A1d, v)
        z = apply_H(va)
        return va - steady_.L21 @ (steady_.Sl_inv @ z)

    v0 = jax.random.normal(jax.random.PRNGKey(0), (D,), dtype=dtype)
    return dare.closed_loop_growth(apply_T, v0, num_iters, operands=operands)


def run_steady_convergence(converge_fn, cache, C0, dt0, opts, default_tol,
                           seed_fn=None, diagnostics=None,
                           **converge_kwargs):
    """Chunked host-loop driver for the Riccati convergence (white + latent).

    ``opts`` keys: ``tol``, ``max_iters`` (200), ``chunk_iters``, ``dtype``,
    ``seed`` (bool, default True when a ``seed_fn`` is available).
    Chunks bound single-device executions (remote relays kill executions
    past ~5 minutes) and let convergence be checked host-side between them.

    ``seed_fn(cache, dt) -> (C0, info)`` — when given (and ``opts["seed"]``
    is not False) the initial factor is replaced by the doubling (SDA)
    solution of the DARE (:func:`steady_state_sda_seed`): the exact
    square-root recursion below then only POLISHES (a couple of iterations
    to re-derive the frozen blocks through the real pipeline) instead of
    converging from scratch at the closed loop's O(1/dt) mixing rate. Seed
    diagnostics merge into the ``diagnostics`` dict if one is passed.

    ``C0`` may be passed as a one-element list (a MOVE): the function pops
    it so the caller's frame holds no reference — when the SDA seed runs,
    the incoming init factor is dead weight through the doubling loop
    (1.6 GB at the N=1e4 f32 shapes; the seed replaces it entirely), and
    a caller-frame reference would keep it resident.

    ``opts["dtype"]="float64"`` runs the RECURSION in f64 on an f32 problem
    and casts the frozen blocks back: at D ~ 1e4 the f32 QR noise times the
    covariance conditioning exceeds any useful stationarity tolerance (the
    delta floors at ~7e-3 and the frozen gain inherits ~1e-2 error — enough
    to push the frozen closed loop's slow modes across the unit circle).
    The one-time f64 cost is the mixed-precision policy working as intended;
    the override forces the plain XLA two-QR pipeline (the Pallas hooks are
    f32-only, and the fused pre-array at f64 is the known memory wall).
    """
    import contextlib

    if isinstance(C0, list):  # move semantics — take ownership
        (C0,) = (C0.pop(),)
    # the cache may arrive boxed too: the seed then owns the only live
    # reference and host-stashes the cache's big blocks through its
    # doubling loop (see steady_state_sda_seed). The final cache is
    # pushed back into the same list for the caller.
    cache_box = cache if isinstance(cache, list) else None
    if cache_box is not None:
        cache = cache_box.pop()
    out_dtype = C0.dtype
    ric_dtype = opts.get("dtype")
    promote = ric_dtype is not None and jnp.dtype(ric_dtype) != out_dtype
    # only the promote path must retain the original-dtype cache for the
    # box return (its working copy is a cast); holding a second reference
    # otherwise would defeat the seed's host-stash
    cache_in = cache if promote else None
    # under the X32 policy jax_enable_x64 is off and astype(float64)
    # silently truncates back to f32 — the promotion needs the scoped
    # enable_x64 around BOTH the casts and the converge traces
    x64_scope = (
        jax.enable_x64(True) if promote else contextlib.nullcontext()
    )
    with x64_scope:
        if promote:
            ric_dtype = jnp.dtype(ric_dtype)
            converge_kwargs = dict(
                converge_kwargs, factorization=None, fused=False,
                propagate_band=None,
            )
            if seed_fn is not None:
                # the Pallas update hook is f32-only; the promoted seed
                # falls back to the plain XLA update (outer partial
                # keyword overrides the inner binding)
                seed_fn = functools.partial(seed_fn, update_fn=None)
            cache = jax.tree.map(
                lambda x: x.astype(ric_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                cache,
            )
            C0 = C0.astype(ric_dtype)
            dt0 = dt0.astype(ric_dtype)
            default_tol = 1e-8

        use_seed = seed_fn is not None and opts.get("seed", True)
        if use_seed:
            from pnmol_tpu.utils import debug as debug_util

            # the seed replaces the init factor: free it BEFORE the
            # doubling loop (with the list-move convention above this is
            # the last reference)
            C0 = None
            debug_util.dump_live_arrays("pre_seed")
            if cache_box is not None and not promote:
                # pass ownership into the seed so it can host-stash the
                # cache's big blocks through the doubling loop (promote
                # keeps cache_in pinned anyway — it is the small-D path)
                seed_box = [cache]
                del cache
                C0, seed_info = seed_fn(seed_box, dt0)
                cache = seed_box.pop()
            else:
                C0, seed_info = seed_fn(cache, dt0)
            if diagnostics is not None:
                diagnostics.update(seed_info)

        donate = () if jax.default_backend() == "cpu" else (1,)
        # seeded default cap is small: past the seed's accuracy the
        # recursion improves at 1 - O(lambda_min dt) per iteration, so
        # burning the unseeded 200-cap would buy nothing — and the Gram-
        # diagonal delta often floors just above tol at the seed's own
        # roundoff (the dare_residual is the real convergence certificate)
        max_iters = opts.get("max_iters", 4 if use_seed else 200)
        # seeded runs only need a delta reading + the frozen-block step:
        # the recursion's own contraction (1 - O(lambda_min dt)) would take
        # O(1/dt) iterations to IMPROVE on the seed anyway
        default_chunk = 2 if use_seed else (10 if promote else 50)
        chunk = min(opts.get("chunk_iters", default_chunk), max_iters)
        tol = opts.get("tol", default_tol)
        # chunked loop WITHOUT the frozen-block harvest (harvest=False):
        # fused into every chunk's XLA program, the harvest both re-did
        # its work per chunk and co-scheduled its outputs/temps with the
        # sweep peak — the round-5 polish OOM at N=1e4. One final
        # max_iters=0 call extracts the blocks from the converged factor.
        converge = jax.jit(functools.partial(
            converge_fn, tol=tol, max_iters=chunk, harvest=False,
            **converge_kwargs,
        ), donate_argnums=donate)
        harvest = jax.jit(functools.partial(
            converge_fn, tol=tol, max_iters=0, harvest=True,
            **converge_kwargs,
        ), donate_argnums=donate)

        total_iters, delta, C_cur = 0, float("inf"), C0
        while total_iters < max_iters and (total_iters == 0 or delta >= tol):
            sc = converge(cache, C_cur, dt0)
            C_cur = sc.cov_inf
            delta = float(sc.delta)
            total_iters += int(sc.iterations)
        delta_arr = sc.delta
        sc = harvest(cache, C_cur, dt0)
        sc = sc._replace(
            iterations=jnp.asarray(total_iters, dtype=sc.iterations.dtype),
            delta=delta_arr,
        )
    if promote:
        sc = type(sc)(**{
            k: (v.astype(out_dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v)
            for k, v in sc._asdict().items()
        })
    if cache_box is not None:
        cache_box.append(cache_in if promote else cache)
    return sc


def make_steady_state_white_step(*, cache: WhiteSolverCache,
                                 steady: SteadyStateCache,
                                 num_derivatives: int):
    """Mean-only white step with frozen stationary factors.

    Same ``(mean, cov, t_next, dt) -> (mean, cov, error, reference,
    diffusion_sq)`` contract as :func:`make_white_step_fn`; the covariance
    argument passes through unchanged (callers seed the solve with
    ``steady.cov_inf``). Per-step cost: one (d, d) matvec for the residual,
    one (m, m) vector triangular solve, one (D, m) matvec for the gain
    application — O(D^2)-free.
    """
    n = num_derivatives + 1

    def step(mean, cov, t_next, dt):
        # full-precision matvecs: the closed loop (A - K H A) sits near the
        # unit circle in its slow modes, and bf16 gain application drifts it
        # across (see converge_white_steady_state); no-op on CPU
        with jax.default_matmul_precision("highest"):
            p, p_inv = iwp.nordsieck_scales_1d(num_derivatives, dt)
            M = mean * p_inv[:, None]
            Mp = cache.A1d @ M
            m_at = p[0] * Mp[0]
            z = jnp.concatenate(
                (p[1] * Mp[1] - cache.L @ m_at, cache.B @ m_at)
            )
            # whiten with the precomputed inverse: a matvec keeps the step
            # on the MXU; a vector trisolve is latency-bound on TPU
            residual_white = steady.Sl_inv @ z
            diffusion_sq = residual_white @ residual_white / z.shape[0]
            m_new_flat = iwp.mean_to_flat(Mp) - steady.L21 @ residual_white
            M_new = iwp.flat_to_mean(m_new_flat, n) * p[:, None]
            error = steady.err_vec * jnp.sqrt(diffusion_sq)
        return M_new, cov, error, jnp.abs(M_new[0]), diffusion_sq

    return step


def _evaluate_ode_dense(*, L, B, E_sqrtm, R_sqrtm, f, df, linear, E0, E1, m_flat, t):
    """Dense measurement assembly, used once at initialization."""
    m_at = E0 @ m_flat
    if linear:
        G, shift = L, jnp.zeros_like(m_at)
    else:
        fx = f(t, m_at)
        Jx = df(t, m_at)
        G, shift = Jx + L, Jx @ m_at - fx
    H = jnp.vstack((E1 - G @ E0, B @ E0))
    z = H @ m_flat + jnp.concatenate((shift, jnp.zeros(B.shape[0], dtype=shift.dtype)))
    E_bc_sqrtm = jax.scipy.linalg.block_diag(E_sqrtm, R_sqrtm)
    return z, H, E_bc_sqrtm


def structured_init_y0(gram, chol_gram, y0, diffuse_scale, nugget, n):
    """Closed-form sqrt-update of the Kronecker prior on the y0 observation.

    The diffuse prior has mean zero and covariance ``kron(G, s^2 I_n)``
    (factor ``kron(chol_gram, s I_n)``); observing the 0-th derivative block
    ``E0 = kron(I_d, e0^T)`` with noise ``nugget^2 I_d`` gives, in closed form,

        S  = s^2 G + nugget^2 I            (innovation covariance)
        W  = s^2 G S^{-1}                  (gain restricted to derivative 0)
        m  = W y0 on the derivative-0 row, zero elsewhere
        P  = blockdiag_over_derivatives(nugget^2 W, s^2 G, ..., s^2 G)

    so the posterior factor is *derivative-block-diagonal* in the point-major
    layout: ``chol(nugget^2 W)`` on derivative 0 and ``s chol_gram`` on the
    rest. Mean and covariance are identical to
    ``sqrt.update_sqrt(E0, kron(chol_gram, s I_n), nugget I)`` (the factor
    differs by a right orthogonal transform, which is irrelevant downstream)
    — but nothing of size ``(D, D+d)`` is ever QR-factorized and no dense
    f64 Kronecker product is materialized, which is what capped round 1 at
    N=2048 (reference semantics: ``/root/reference/src/pnmol/white.py:24-39``).

    Returns ``(u0 (d,), blocks)`` — the conditioned mean's derivative-0 row
    and the per-derivative factor blocks ``[chol(nugget^2 W), s chol_gram,
    ...]`` (everything stays O(d^2); assemble the dense working-set factor
    with :func:`point_major_blockdiag`).
    """
    d = gram.shape[0]
    dtype = gram.dtype
    s = jnp.asarray(diffuse_scale, dtype)
    # nugget on the diagonal via indexed add: a dense jnp.eye(d) literal
    # gets constant-folded at compile time, which at d = 1e4 (0.4 GB
    # literal) blows up the XLA compile-helper's host memory
    diag = jnp.arange(d)
    S0 = (s**2 * gram).at[diag, diag].add(nugget**2)
    S0_chol = jnp.linalg.cholesky(S0)
    if d >= 4096:
        # XLA's triangular-solve expander plans ~18 live (d, d) temporaries
        # for a (d, d) RHS (15.5 GB at d = 1e4, measured via
        # memory_analysis) — the blocked panel substitution is O(matrix)
        from pnmol_tpu.ops import trisolve

        W = s**2 * trisolve.cho_solve_blocked(S0_chol, gram).T
    else:
        W = s**2 * jax.scipy.linalg.cho_solve((S0_chol, True), gram).T  # s^2 G S^-1
    u0 = W @ y0
    # chol(nugget^2 W) = nugget * chol(W): scale outside to keep the factor
    # well inside the dtype's range for tiny nuggets.
    C00 = nugget * jnp.linalg.cholesky(0.5 * (W + W.T))
    return u0, [C00] + [s * chol_gram] * (n - 1)


def reduced_init_pde_update(blocks, HCsub, E_bc_nugget, z_pde, u0,
                            init_update):
    """Initialization PDE update on the derivative-{0,1} sub-state.

    The init measurement ``H = [E1 - G E0; B E0]`` (reference
    ``/root/reference/src/pnmol/white.py:42-56``) touches only derivative
    blocks 0 and 1, and the post-y0 prior factor is derivative-block-
    diagonal — so the gain rows of every derivative >= 2 are exactly zero
    and those blocks pass through the update untouched. The QR therefore
    runs on the ``(2d + m) x (m + 2d)`` sub-array instead of the full
    ``(D + m) x (m + D)`` one: ~2.3x fewer factorization FLOPs at nu=2 and
    a proportionally smaller single-chip memory peak (the init QR is THE
    peak allocation at large N — docs/SCALE.md).

    Parameters: ``blocks`` = per-derivative factor blocks (derivative-major,
    ``n`` entries of shape (d', d')); ``HCsub`` = the measurement applied to
    ``blockdiag(blocks[0], blocks[1])``, shape (m, 2d'); ``z_pde`` the
    residual; ``u0`` the conditioned derivative-0 mean. Returns the
    point-major ``(m0_flat, C0)`` of the FULL state.
    """
    d_ = blocks[0].shape[0]
    n = len(blocks)
    dtype = HCsub.dtype
    Csub = jax.scipy.linalg.block_diag(blocks[0], blocks[1])
    # As in the step kernels, the gain is only ever applied to the residual
    # VECTOR: updates exposing raw blocks skip the (m, m) x (2d' rhs) matrix
    # gain solve (and its (2d', m) gain buffer — 0.8 GB at N=1e4) for one
    # vector triangular solve.
    blocks_fn = getattr(init_update, "blocks", None)
    if blocks_fn is None and init_update is sqrt.update_sqrt_from_products:
        blocks_fn = sqrt.update_sqrt_from_products_blocks
    if blocks_fn is not None:
        C0sub, L21, L1 = blocks_fn(HCsub, Csub, E_bc_nugget)
        corr = L21 @ jax.scipy.linalg.solve_triangular(L1, z_pde, lower=True)
    else:  # legacy contract (e.g. the distributed sharded update)
        C0sub, kgain, _ = init_update(HCsub, Csub, E_bc_nugget)
        corr = kgain @ z_pde  # (2d',)
    m0_dm = jnp.concatenate(
        [u0 - corr[:d_], -corr[d_:]]
        + [jnp.zeros((d_ * (n - 2),), dtype)]
    ) if n > 2 else jnp.concatenate([u0 - corr[:d_], -corr[d_:]])
    bd = jax.scipy.linalg.block_diag(C0sub, *blocks[2:])
    from pnmol_tpu.ops import iwp as iwp_module

    perm = iwp_module.point_major_perm(n, d_)
    # Rows must live in the point-major state basis; the COLUMN basis of a
    # covariance factor is arbitrary, so keep the derivative-major columns:
    # bd[perm] is a row-permuted (block-)triangular factor whose column
    # panels have exactly the triangular factor's Grams — a full [perm][:,
    # perm] conjugation scrambles the per-panel conditioning and measurably
    # degrades the Gram-based distributed QR downstream (eps*cond(panel)).
    return m0_dm[perm], bd[perm]


def point_major_blockdiag(blocks):
    """Assemble a per-derivative block-diagonal operator in point-major layout.

    ``blocks`` is a list of ``n`` matrices ``(d, d)``; the result ``C`` is the
    ``(D, D)`` matrix with ``C[(i,k), (j,l)] = delta_kl blocks[k][i,j]`` in
    the point-major flat basis (point index outer, derivative inner).

    Implementation note: built as a derivative-major ``block_diag`` plus a
    permutation *gather*, keeping every intermediate 2-D. A 4-D
    ``(d, n, d, n)`` scatter assembly has a tiny trailing axis that TPU tiling
    pads 3 -> 128 (a 42x HBM blow-up at N=4096 — observed OOM).
    """
    n = len(blocks)
    d = blocks[0].shape[0]
    bd = jax.scipy.linalg.block_diag(*blocks)  # derivative-major (D, D)
    perm = iwp.point_major_perm(n, d)
    return bd[perm][:, perm]


def resolve_householder_hooks(d: int, *, pair_columns: bool = False):
    """(step factorization, init update) Pallas-Householder hooks sized for a
    problem with ``d`` state points (latent solvers pass ``2d``).

    Wider blocks shorten the sweep's scan and deepen the MXU trailing
    contractions at large problems; since the scan-bodied sweep (round 3)
    the traced graph no longer scales with the leaf count, so the sizes are
    a pure performance choice. ``pair_columns`` forms two reflectors per
    leaf slab pass (rank-2 update) in the step factorization — the measured
    A/B for it lives in ``experiments/pair_probe.py``, which must size its
    configs through THIS helper so probe conclusions transfer to the solver.
    """
    from pnmol_tpu.ops import qr_householder

    leaf = 64 if d >= 8192 else 32
    block = 256 if d >= 4096 else 128
    factorization = qr_householder.make_householder_lq_factorization(
        leaf=leaf, block=block, pair_columns=pair_columns
    )
    init_update = qr_householder.make_householder_update_from_products(
        leaf=leaf, block=block
    )
    return factorization, init_update


class _WhiteNoiseEK1Base(pdefilter.PDEFilter):
    """Shared initialization and step plumbing of the white-noise solvers.

    ``meascov_dt_scaled=True`` treats the discretization error as a white
    noise in time (per-step measurement covariance ``dt * E E^T``), removing
    the reference's small-dt accuracy floor on nonlinear problems at the
    cost of deviating from the paper's calibration. Default off (reference
    semantics).

    ``factorization`` swaps the pre-array factorization of the step kernel
    (``(HACl, ACl, HQl, Ql, R) -> (posterior_factor, gain, innovation)``).
    Accepted values:

    * ``None`` (default): one fused pre-array QR through XLA's Householder.
    * ``"householder"``: the Pallas blocked Householder LQ
      (:func:`pnmol_tpu.ops.qr_householder.make_householder_lq_factorization`)
      — same Householder stability, measured faster than XLA's QR on TPU
      (docs/SCALE.md).
    * any callable — e.g.
      ``parallel.sharded_filter.make_distributed_factorization(mesh=...)``:
      the all-matmul panel factorization, 2.5x faster than XLA's QR on the
      MXU but with an eps*cond posterior-factor error in f32 (exact in
      f64); see docs/SCALE.md. A callable is a jit *static* compared by
      object identity — reuse ONE instance across solvers, or every solver
      recompiles the step kernel. A callable carrying a ``.blocks``
      attribute (``(...) -> (posterior, L21, innovation)``) skips its gain
      solve: the step computes ``K @ z = L21 @ (Sl^{-1} z)`` from the
      calibration's whitened residual, so the gain matrix never exists.
    """

    LINEAR: bool = True
    EK_ORDER: int = 1

    def __init__(self, *args, meascov_dt_scaled=False, factorization=None,
                 fused=True, propagate_band=None, steady_state=False,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.meascov_dt_scaled = meascov_dt_scaled
        # Steady-state (stationary) mode: for LINEAR problems with a
        # Constant step rule, run the data-independent covariance recursion
        # to its Riccati fixed point once at initialization and freeze it —
        # every subsequent step is a mean-only O(D*m) update (classical
        # steady-state Kalman filtering; a capability beyond the reference).
        # True, or a dict with "tol" (default 1e-8) / "max_iters" (200).
        # Approximation: the transient covariance (and the gain during it)
        # is replaced by the stationary one; see docs/SCALE.md.
        self.steady_state = steady_state
        self.steady_cache = None
        self._init_update = None
        self._factorization_spec = factorization
        # the "householder" string resolves lazily in initialize(): the
        # leaf/block sizes scale with the problem, and re-initializing the
        # same solver on a different-sized PDE must re-resolve them
        self._factorization_d = None
        self.factorization = None if factorization == "householder" else factorization
        # two-QR pipeline controls: ``fused=False`` + a factorization hook
        # runs predict and update as separate LQs (the memory-lighter large-N
        # form); ``propagate_band`` ("banded" | "interleaved") additionally
        # exploits the propagate pre-array's triangular structure — see
        # white_attempt_step. "interleaved" makes initialize()
        # re-triangularize the init factor (the validity precondition).
        self.fused = fused
        self.propagate_band = propagate_band

    @property
    def E0(self):
        """Dense derivative-0 projection; lazy (O(d*D)) — experiments only."""
        return self.iwp.projection_matrix(0)

    @property
    def E1(self):
        return self.iwp.projection_matrix(1)

    def initialize(self, pde):
        n, d = self.num_derivatives + 1, pde.L.shape[0]
        # PNMOL_INIT_PROFILE=1: forced-completion wall-clock per setup
        # phase (large-N init is the dominant one-time cost — docs/SCALE.md
        # round-4 "Initialization breakdown"); self.init_profile holds it
        mark = profiling.PhaseTimer(
            os.environ.get("PNMOL_INIT_PROFILE") == "1"
        )

        if self._factorization_spec == "householder" and (
            self._factorization_d != d
        ):
            # the initialization's (D+m) x (m+D) QR is the single-chip
            # memory peak at large N; _init_update routes it through the
            # blocked LQ too
            self.factorization, self._init_update = resolve_householder_hooks(d)
            self._factorization_d = d

        f = getattr(pde, "f", None)
        df = getattr(pde, "df", None)
        # The conditioning nugget is dtype-aware: the reference's 1e-10
        # (white.py:33) is below float32 resolution and NaNs the f32 path.
        dtype = jnp.asarray(pde.y0).dtype
        nugget_scale = 1e-10 if jnp.finfo(dtype).eps < 1e-10 else 1e-5

        linear = self.LINEAR
        ek_order = self.EK_ORDER
        t0 = pde.t0
        num_derivatives = self.num_derivatives
        spatial_kernel = self.spatial_kernel
        diffuse_scale = self.diffuse_prior_scale
        init_update = self._init_update or sqrt.update_sqrt_from_products

        # Small problems run the setup eagerly: each jitted phase costs a
        # compile roundtrip (expensive on the remote-TPU relay; ~400 s of
        # one-time build at N=512), and the memory pressure the phases
        # exist to control only appears at large N.
        if d >= 4096:
            wrap = jax.jit

            def wrap_donate(fn):
                donate = () if jax.default_backend() == "cpu" else (0, 1, 2)
                return jax.jit(fn, donate_argnums=donate)
        else:
            def wrap(fn):
                return fn

            wrap_donate = wrap

        # The setup runs as THREE jitted phases so XLA owns the lifetime
        # of the large intermediates within each, and no phase's peak
        # exceeds the chip. Run eagerly, every transient (Gram, kron
        # assembly, block-diag gathers, init pre-array) holds its own
        # device buffer and at N=1e4 the accumulation alone exhausts a
        # 16 GB chip. One mega-jit is not enough either: XLA's blocked
        # triangular-solve expansion (the closed-form y0 gain) keeps ~18
        # shrinking (d, d) temporaries live at once (~6 GB at N=1e4), so
        # the solve gets a phase of its own, away from the factorization
        # sweep's working set. Cache-only constants (Ql, E_bc) come last so
        # they are never co-resident with the init pre-array.
        def _phase_prior(X, y0):
            gram = spatial_kernel(X, X.T)
            chol_gram = jnp.linalg.cholesky(gram)
            u0, y0_blocks = structured_init_y0(
                gram, chol_gram, y0, diffuse_scale, nugget_scale, n
            )
            return chol_gram, u0, y0_blocks[0]

        chol_gram, u0, C00 = mark("prior_gram_cholesky_y0", wrap(_phase_prior)(
            pde.mesh_spatial.points, jnp.asarray(pde.y0)
        ))

        def _phase_measure(chol_gram, u0, C00, L, B, E_sqrtm, R_sqrtm):
            trans = iwp.IntegratedWienerTransition(
                num_derivatives=num_derivatives,
                wiener_process_dimension=d,
                wp_diffusion_sqrtm=chol_gram,
            )
            A1d = trans.preconditioned_discretize_1d[0]
            E_bc = jax.scipy.linalg.block_diag(E_sqrtm, R_sqrtm)
            scale = jnp.asarray(diffuse_scale, chol_gram.dtype)
            B1 = scale * chol_gram  # derivative>=1 prior factor block

            # After the y0 update the mean is zero except on derivative 0,
            # so the PDE residual z = H m + [shift; 0] collapses to closed
            # form too (z_ode = -L u0 - f(u0); z_bc = B u0).
            if linear:
                G_lin = L
                z_ode = -L @ u0
            else:
                fx = f(t0, u0)
                if ek_order == 0:
                    G_lin = L
                else:
                    Jx = df(t0, u0)
                    G_lin = Jx + L
                z_ode = -L @ u0 - fx
            z_pde = jnp.concatenate((z_ode, B @ u0))

            # H restricted to the derivative-{0,1} sub-state (see
            # reduced_init_pde_update): H @ blockdiag(C00, B1) columnwise
            b_rows = B.shape[0]
            HCsub = jnp.concatenate(
                (
                    jnp.concatenate((-G_lin @ C00, B1), axis=1),
                    jnp.concatenate(
                        (B @ C00, jnp.zeros((b_rows, d), dtype=u0.dtype)),
                        axis=1,
                    ),
                ),
                axis=0,
            )
            # nugget via indexed diagonal add (no (d+b)^2 eye literal:
            # constant-folding one OOM-kills the XLA compile helper)
            mdiag = jnp.arange(d + b_rows)
            E_bc_nugget = E_bc.at[mdiag, mdiag].add(nugget_scale)
            return A1d, B1, HCsub, E_bc_nugget, z_pde

        A1d, B1, HCsub, E_bc_nugget, z_pde = mark(
            "measure_assembly", wrap(_phase_measure)(
                chol_gram, u0, C00, pde.L, pde.B, pde.E_sqrtm, pde.R_sqrtm
            ))

        # The init pre-array QR gets a phase of its own with DONATED
        # operands: HCsub / C00 / E_bc_nugget free into the factorization
        # workspace instead of staying resident beside it.
        def _phase_qr(HCsub, C00, E_bc_nugget, B1, z_pde, u0):
            blocks = [C00] + [B1] * (n - 1)
            return reduced_init_pde_update(
                blocks, HCsub, E_bc_nugget, z_pde, u0, init_update
            )

        m0, C0 = mark("init_update_qr", wrap_donate(_phase_qr)(
            HCsub, C00, E_bc_nugget, B1, z_pde, u0
        ))
        # HCsub/C00/E_bc_nugget were donated into the QR phase, but B1 was
        # not — the frame reference kept the (d, d) block resident through
        # the steady seed's doubling loop (0.4 GB at N=1e4, round 5)
        del HCsub, C00, E_bc_nugget, B1, z_pde

        if self.propagate_band == "interleaved" and not self.fused:
            # The interleaved banded propagate requires a LOWER-TRIANGULAR
            # state factor in the point-major basis; the init factor keeps
            # derivative-major columns (reduced_init_pde_update), so
            # re-triangularize it once here — every subsequent posterior
            # factor is triangular by construction of the update LQ.
            tri = getattr(self.factorization, "tri", None)
            if tri is None:
                def tri(C):
                    return jnp.linalg.qr(C.T)[1].T
            if d >= 4096:
                donate = () if jax.default_backend() == "cpu" else (0,)
                tri = jax.jit(tri, donate_argnums=donate)
            C0 = mark("interleave_retriangularize", tri(C0))

        def _phase_aux(chol_gram, E_sqrtm, R_sqrtm):
            trans = iwp.IntegratedWienerTransition(
                num_derivatives=num_derivatives,
                wiener_process_dimension=d,
                wp_diffusion_sqrtm=chol_gram,
            )
            return (
                trans.process_noise_factor,
                jax.scipy.linalg.block_diag(E_sqrtm, R_sqrtm),
            )

        Ql, E_bc = mark("aux_Ql_Ebc", wrap(_phase_aux)(
            chol_gram, pde.E_sqrtm, pde.R_sqrtm
        ))

        cache = WhiteSolverCache(
            A1d=A1d, Ql=Ql, L=pde.L, B=pde.B, E_bc_sqrtm=E_bc
        )
        # drop the frame-local aliases: during the steady seed the cache
        # moves (boxed) into run_steady_convergence so its big blocks can
        # ride out the doubling loop in host memory — a surviving local
        # name here would pin the device buffers
        del Ql, E_bc
        # an EMPTY options dict means "on, all defaults" — `if steady_state:`
        # would silently disable the mode for it (the round-4 N=1e4 steady
        # bench failure: every auto-resolved option fell back to a default,
        # opts == {} -> falsy -> no steady cache)
        steady_on = (
            bool(self.steady_state) or isinstance(self.steady_state, dict)
        )
        if not steady_on:
            self._cache = cache
            self._step_fn = make_white_step_fn(
                cache=cache,
                num_derivatives=self.num_derivatives,
                f=f,
                df=df,
                linear=self.LINEAR,
                meascov_dt_scaled=self.meascov_dt_scaled,
                factorization=self.factorization,
                fused=self.fused,
                propagate_band=self.propagate_band,
                ek_order=self.EK_ORDER,
            )
        if steady_on:
            from pnmol_tpu.odetools import step as step_module

            if not self.LINEAR:
                raise ValueError(
                    "steady_state mode requires a LINEAR solver: the "
                    "covariance recursion is data-dependent for EK1-"
                    "linearized problems."
                )
            if not isinstance(self.steprule, step_module.Constant):
                raise ValueError(
                    "steady_state mode requires a Constant step rule (the "
                    "stationary factors are specific to one dt)."
                )
            opts = self.steady_state if isinstance(self.steady_state, dict) else {}
            # liveness discipline for the seed's doubling loop (N=1e4 f32:
            # the loop peak plus ~2 GB of externals is the 16 GB chip —
            # measured ResourceExhausted, round 5): the init factor moves
            # into run_steady_convergence via the list convention (the
            # seed replaces it), and the (d, d) Gram factor — only needed
            # again for self.iwp below — rides out the convergence in
            # host memory
            import numpy as _np

            stash_gram = jax.default_backend() != "cpu"
            if stash_gram:
                chol_gram_host = _np.asarray(chol_gram)
                del chol_gram
            C0_box = [C0]
            del C0
            dt0 = jnp.asarray(self.steprule.dt, dtype=m0.dtype)
            # dtype-aware default tolerance: 1e-8 is below f32 resolution of
            # the Gram diagonal, so an f32 run would always burn max_iters
            default_tol = 1e-8 if m0.dtype == jnp.float64 else 1e-5
            seed_fn = functools.partial(
                steady_state_sda_seed,
                num_derivatives=self.num_derivatives,
                meascov_dt_scaled=self.meascov_dt_scaled,
                # posterior update through the problem-sized Pallas hook:
                # plain XLA QR of the ((D+m), (m+D)) update pre-array was
                # the post-doubling OOM at the N=1e4 f32 seed (round 5)
                update_fn=init_update,
                **{k: opts[k] for k in ("bc_nugget",) if k in opts},
            )
            self.steady_diagnostics = {}
            cache_box = [cache]
            del cache
            self.steady_cache = run_steady_convergence(
                converge_white_steady_state, cache_box, C0_box, dt0, opts,
                default_tol,
                seed_fn=seed_fn,
                diagnostics=self.steady_diagnostics,
                num_derivatives=self.num_derivatives,
                fused=self.fused,
                factorization=self.factorization,
                propagate_band=self.propagate_band,
                meascov_dt_scaled=self.meascov_dt_scaled,
            )
            cache = cache_box.pop()
            self._cache = cache
            mark("steady_riccati", self.steady_cache)
            C0 = self.steady_cache.cov_inf
            if stash_gram:
                chol_gram = jnp.asarray(chol_gram_host)
                del chol_gram_host
            self._step_fn = make_steady_state_white_step(
                cache=cache,
                steady=self.steady_cache,
                num_derivatives=self.num_derivatives,
            )

        self.iwp = iwp.IntegratedWienerTransition(
            num_derivatives=self.num_derivatives,
            wiener_process_dimension=d,
            wp_diffusion_sqrtm=chol_gram,
        )
        self.init_profile = mark.profile
        y = rv.MultivariateNormal(mean=iwp.flat_to_mean(m0, n), cov_sqrtm=C0)
        return pdefilter.PDEFilterState(
            t=jnp.asarray(pde.t0, dtype=m0.dtype),
            y=y,
            error_estimate=None,
            reference_state=None,
            diffusion_squared_local=jnp.zeros((), dtype=m0.dtype),
        )

    def _step_function(self, pde):
        return self._step_fn

    def attempt_step(self, state, dt, pde):
        mean, cov, error, reference, diff_sq = self._step_fn(
            state.y.mean, state.y.cov_sqrtm, state.t + dt, jnp.asarray(dt)
        )
        new_state = pdefilter.PDEFilterState(
            t=state.t + dt,
            y=rv.MultivariateNormal(mean=mean, cov_sqrtm=cov),
            error_estimate=error,
            reference_state=reference,
            diffusion_squared_local=diff_sq,
        )
        return new_state, dict(num_f_evaluations=1, num_df_evaluations=1)


class LinearWhiteNoiseEK1(_WhiteNoiseEK1Base):
    """EK1 for linear evolution equations (Jx = L exactly)."""

    LINEAR = True


class SemiLinearWhiteNoiseEK0(_WhiteNoiseEK1Base):
    """EK0 for semilinear problems: zeroth-order measurement model.

    Same innovation mean as EK1 (``z = u' - L u - f(u_pred)``) but the
    measurement operator carries only the discretized linear part ``L`` —
    no Jacobian anywhere (``df`` is never evaluated), so the covariance
    and gain are those of the LINEAR problem. Cheaper linearization,
    coarser credit assignment; the classical EK0/EK1 trade of ODE filters
    (the BASELINE north star names both). On linear problems EK0 == EK1
    exactly.
    """

    LINEAR = False
    EK_ORDER = 0


class SemiLinearWhiteNoiseEK1(_WhiteNoiseEK1Base):
    """EK1 for semilinear evolution equations u_t = L u + f(u)."""

    LINEAR = False
