"""Latent-force EK1 PDE filters: discretization error as an explicit latent state.

Capability parity with ``/root/reference/src/pnmol/latent.py``: a stacked
state-space model of two IWPs — the solution prior (Gram-Cholesky diffusion)
and a latent-force prior (``E_sqrtm`` diffusion) — filtered with *noise-free*
square-root updates, so the discretization error lives in the state rather
than the measurement covariance. Beyond the reference (which has no error
estimate and caps these solvers at constant steps, ``latent.py:218-219``),
the step derives a calibrated ``H Q H^T`` innovation-based error estimate,
so Adaptive step rules work here too.

TPU-first delta: because both stacked processes share the Nordsieck order,
the stack collapses to a *single* IWP over ``2d`` "points" with the
block-diagonal spatial factor (see :mod:`pnmol_tpu.ops.stacked_ssm`). The
reference's order-"F" reshape dance between glued ``(nu+1, 2d)`` means and
flat vectors (``latent.py:165-215``) is the identity in the point-major
layout: the glued mean IS the standard layout with ``d' = 2d``. The step
kernel is therefore the same structured predict/QR/update pipeline as the
white solver, with a latent-aware measurement operator.
"""

import functools
import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from pnmol_tpu.ops import iwp, rv, sqrt, stacked_ssm
from pnmol_tpu.utils import profiling
from pnmol_tpu.solvers import pdefilter
from pnmol_tpu.solvers.white import SteadyStateCache, structured_init_y0


class LatentSolverCache(NamedTuple):
    """Per-problem constants of the latent-force step kernel (a pytree)."""

    A1d: jnp.ndarray  # (n, n)
    Ql: jnp.ndarray  # (2D, 2D) kron(blockdiag(chol_gram, E_sqrtm), LQ1d)
    L: jnp.ndarray  # (d, d)
    B: jnp.ndarray  # (b, d)


def _measurement_operator_latent(cache, G, p, n, d):
    """X -> H @ X for the latent-force measurement, H never materialized.

    ``H = [[p1 E1_s - G (p0 E0_s), -(p0 E0_eps)], [p0 B E0_s, 0]]`` over the
    stacked (state | latent) coordinates (reference: ``latent.py:237-292``).
    """

    def apply_H(X):
        X0 = iwp.project_derivative(X, 0, n)  # (2d, K)
        X1 = iwp.project_derivative(X, 1, n)
        X0_state, X0_eps = X0[:d], X0[d:]
        X1_state = X1[:d]
        ode_rows = p[1] * X1_state - G @ (p[0] * X0_state) - p[0] * X0_eps
        bc_rows = cache.B @ (p[0] * X0_state)
        return jnp.concatenate((ode_rows, bc_rows), axis=0)

    return apply_H


def make_latent_step_fn(*, cache: LatentSolverCache, num_derivatives: int,
                        f: Optional[Callable], df: Optional[Callable],
                        linear: bool, fused: bool = True, factorization=None,
                        propagate_band=None, ek_order: int = 1):
    """Jitted latent-force EK1 attempt-step kernel.

    ``step(mean (n, 2d), cov (2D, 2D), t_next, dt)`` with semantics identical
    to the reference ``attempt_step`` (``latent.py:155-225``).
    ``factorization`` swaps the pre-array factorization exactly as in the
    white solvers (the latent pre-array is the same shape family with a
    zero measurement-noise block).
    """
    return functools.partial(
        latent_attempt_step,
        cache,
        num_derivatives=num_derivatives,
        f=f,
        df=df,
        linear=linear,
        fused=fused,
        factorization=factorization,
        propagate_band=propagate_band,
        ek_order=ek_order,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_derivatives", "f", "df", "linear", "fused",
                     "factorization", "propagate_band", "ek_order"),
)
def latent_attempt_step(cache, mean, cov_sqrtm, t_next, dt, *, num_derivatives,
                        f, df, linear, fused, factorization=None,
                        propagate_band=None, ek_order=1):
    """One latent-force EK1 attempt step (module-level jit: compilations
    shared across solver instances with the same shapes and statics)."""
    n = num_derivatives + 1
    d = cache.L.shape[0]
    m_dim = d + cache.B.shape[0]
    p, p_inv = iwp.nordsieck_scales_1d(num_derivatives, dt)

    # [Precondition] (shared scales for state and latent halves)
    M = mean * p_inv[:, None]
    Cl = iwp.scale_stack(p_inv, cov_sqrtm)

    # [Predict mean]
    Mp = cache.A1d @ M

    # [Linearize] at the predicted state half
    state_at = p[0] * Mp[0, :d]
    eps_at = p[0] * Mp[0, d:]
    from pnmol_tpu.solvers.white import _linearize

    G, shift = _linearize(f, df, cache.L, t_next, state_at, linear, ek_order)
    apply_H = _measurement_operator_latent(cache, G, p, n, d)

    # [Residual] z = H mp + [shift; 0]
    z_ode = p[1] * Mp[1, :d] - G @ state_at - eps_at + shift
    z_bc = cache.B @ state_at
    z = jnp.concatenate((z_ode, z_bc))

    # [Error estimate] S = H Q H^T over the *stacked* process noise (state
    # and latent-force components; there is no measurement noise here), with
    # the same quasi-MLE sigma scaling as the white solver. The reference
    # returns None and caps the latent solvers at constant steps
    # (``/root/reference/src/pnmol/latent.py:218-219``); this estimate is the
    # adaptive-stepping unlock.
    HQl = apply_H(cache.Ql)
    S_err = HQl @ HQl.T
    S_err_chol = jnp.linalg.cholesky(S_err)
    whitened_err = jax.scipy.linalg.cho_solve((S_err_chol, True), z)
    sigma_sq_err = z @ whitened_err / m_dim
    error = dt * (jnp.sqrt(jnp.diag(S_err)) * jnp.sqrt(sigma_sq_err))[:d]

    # [Predict + update covariance] (noise-free measurement). As in the
    # white step, the gain matrix is never materialized: every pipeline
    # yields the raw blocks (Cl_new, L21, Sl) and the mean update reuses
    # the calibration's whitened residual, K @ z = L21 @ (Sl^{-1} z).
    ACl = iwp.apply_stack_matrix(cache.A1d, Cl)
    zeros_R = jnp.zeros((z.shape[0], z.shape[0]), dtype=ACl.dtype)
    if factorization is not None and not fused and hasattr(
        factorization, "propagate"
    ):
        # two-QR pipeline through the custom factorization — the latent
        # fused pre-array is 2x the white one in both dims, so its
        # double-buffered sweep hits the single-chip HBM wall first
        # (docs/SCALE.md "N=1e4 single-chip"). propagate_band exploits the
        # stacked Ql's lower-triangularity exactly as in the white step
        # (kron(blockdiag(chol_gram, E_sqrtm), LQ1d) is lower-triangular in
        # the 2d-point point-major layout).
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
            Cl_new, L21, Sl = upd.blocks_banded(HClp, Clp, zeros_R)
        elif hasattr(upd, "blocks"):
            Cl_new, L21, Sl = upd.blocks(HClp, Clp, zeros_R)
        else:
            Cl_new, L21, Sl = sqrt.update_sqrt_from_products_blocks(
                HClp, Clp, zeros_R
            )
    elif factorization is not None:
        HACl = apply_H(ACl)
        if propagate_band is not None and hasattr(
            factorization, "blocks_banded"
        ):
            Cl_new, L21, Sl = factorization.blocks_banded(
                HACl, ACl, HQl, cache.Ql, zeros_R
            )
        elif hasattr(factorization, "blocks"):
            Cl_new, L21, Sl = factorization.blocks(
                HACl, ACl, HQl, cache.Ql, zeros_R
            )
        else:
            Cl_new, K, Sl = factorization(HACl, ACl, HQl, cache.Ql, zeros_R)
            L21 = None
    elif fused:
        HACl = apply_H(ACl)
        Cl_new, L21, Sl = sqrt.fused_predict_update_blocks(
            HACl, ACl, HQl, cache.Ql, zeros_R
        )
    else:
        Clp = sqrt.propagate_cholesky_factor(ACl, cache.Ql)
        HClp = apply_H(Clp)
        Cl_new, L21, Sl = sqrt.update_sqrt_from_products_blocks(
            HClp, Clp, zeros_R
        )

    # [Calibrate + mean update] true Mahalanobis via the lower solve
    # (sign-invariant; see the note in pnmol_tpu.solvers.white)
    residual_white = jax.scipy.linalg.solve_triangular(Sl, z, lower=True)
    diffusion_sq = residual_white @ residual_white / m_dim
    if L21 is not None:
        m_new_flat = iwp.mean_to_flat(Mp) - L21 @ residual_white
    else:  # legacy hook contract: explicit gain
        m_new_flat = iwp.mean_to_flat(Mp) - K @ z

    # [Un-precondition]
    M_new = iwp.flat_to_mean(m_new_flat, n) * p[:, None]
    C_new = iwp.scale_stack(p, Cl_new)
    return M_new, C_new, error, jnp.abs(M_new[0, :d]), diffusion_sq


def converge_latent_steady_state(cache, cov_sqrtm, dt, *, num_derivatives,
                                 fused=True, factorization=None,
                                 propagate_band=None, tol=1e-8,
                                 max_iters=200, harvest=True):
    """Iterate the latent step's covariance recursion to its fixed point.

    The latent analog of
    :func:`pnmol_tpu.solvers.white.converge_white_steady_state`: for LINEAR
    problems at constant ``dt`` the noise-free update's measurement operator
    is time-invariant, so the covariance half of the stacked recursion is
    data-independent and converges to the square-root solution of its
    discrete algebraic Riccati equation. Runs the exact per-step covariance
    pipeline (same QRs, same factorization hook) in one ``lax.while_loop``
    until the Gram diagonal is stationary to ``tol`` (relative), and returns
    the frozen blocks the mean-only step consumes. A capability beyond the
    reference, which re-factorizes the identical (4D x 2D-shaped) pre-array
    every step (``/root/reference/src/pnmol/latent.py:155-225``).
    """
    n = num_derivatives + 1
    d = cache.L.shape[0]
    D2 = cov_sqrtm.shape[0]  # stacked state dim: 2 * d * n
    m_dim = d + cache.B.shape[0]
    p, p_inv = iwp.nordsieck_scales_1d(num_derivatives, dt)
    apply_H = _measurement_operator_latent(cache, cache.L, p, n, d)
    zeros_R = jnp.zeros((m_dim, m_dim), dtype=cov_sqrtm.dtype)

    def cov_step(C_unpre):
        """One covariance-only latent step (mirrors latent_attempt_step)."""
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
                Cl_new, L21, Sl = upd.blocks_banded(HClp, Clp, zeros_R)
            elif hasattr(upd, "blocks"):
                Cl_new, L21, Sl = upd.blocks(HClp, Clp, zeros_R)
            else:
                Cl_new, L21, Sl = sqrt.update_sqrt_from_products_blocks(
                    HClp, Clp, zeros_R
                )
        elif factorization is not None:
            HACl = apply_H(ACl)
            HQl = apply_H(cache.Ql)
            if hasattr(factorization, "blocks"):
                Cl_new, L21, Sl = factorization.blocks(
                    HACl, ACl, HQl, cache.Ql, zeros_R
                )
            else:
                Cl_new, K, Sl = factorization(HACl, ACl, HQl, cache.Ql,
                                              zeros_R)
                L21 = K @ Sl  # back out the cross block: S_xz = K S = L21 Sl^T
        elif fused:
            HACl = apply_H(ACl)
            HQl = apply_H(cache.Ql)
            Cl_new, L21, Sl = sqrt.fused_predict_update_blocks(
                HACl, ACl, HQl, cache.Ql, zeros_R
            )
        else:
            Clp = sqrt.propagate_cholesky_factor(ACl, cache.Ql)
            HClp = apply_H(Clp)
            Cl_new, L21, Sl = sqrt.update_sqrt_from_products_blocks(
                HClp, Clp, zeros_R
            )
        return iwp.scale_stack(p, Cl_new), L21, Sl

    # Factor-only carry, as in the white converge: the frozen blocks come
    # from one extra cov_step after convergence (memory + consistency).
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
    # full-precision matmuls: the fixed point cannot be certified (nor the
    # frozen gain trusted) at the TPU bf16 default — see the note in
    # pnmol_tpu.solvers.white.converge_white_steady_state; no-op on CPU
    with jax.default_matmul_precision("highest"):
        C_conv, iters, delta = jax.lax.while_loop(cond, body, init)
        if not harvest:
            # chunked-loop form: frozen blocks are extracted once by a
            # final harvest call (see the white analog)
            dummy = jnp.zeros((1, 1), dtype)
            return SteadyStateCache(
                cov_inf=C_conv, L21=dummy, Sl=dummy, Sl_inv=dummy,
                err_vec=jnp.zeros((d,), dtype), iterations=iters,
                delta=delta,
            )
        C_inf, L21, Sl = cov_step(C_conv)

        HQl = apply_H(cache.Ql)
        # diag only — no (m, m) S Gram
        err_vec = dt * jnp.sqrt(jnp.sum(HQl * HQl, axis=1))[:d]
        from pnmol_tpu.solvers.white import _triangular_inverse

        Sl_inv = _triangular_inverse(Sl)
    return SteadyStateCache(cov_inf=C_inf, L21=L21, Sl=Sl, Sl_inv=Sl_inv,
                            err_vec=err_vec, iterations=iters, delta=delta)


def latent_dense_system(cache, dt, *, num_derivatives):
    """Dense ``(A, H, Q, R, p)`` of the scaled stacked recursion.

    The latent analog of
    :func:`pnmol_tpu.solvers.white.white_dense_system`: transition
    ``kron(I_2d, A1d)`` over the stacked (state | latent) points,
    measurement from :func:`_measurement_operator_latent` applied to the
    identity, and EXACTLY-ZERO measurement noise (the latent solvers use
    noise-free updates — the discretization error lives in the state).
    Used only by the one-time doubling seed.
    """
    n = num_derivatives + 1
    d = cache.L.shape[0]
    D2 = cache.Ql.shape[0]
    dtype = cache.Ql.dtype
    dt = jnp.asarray(dt, dtype)
    p, _ = iwp.nordsieck_scales_1d(num_derivatives, dt)
    eye = jnp.eye(D2, dtype=dtype)
    A = iwp.apply_stack_matrix(cache.A1d, eye)
    H = _measurement_operator_latent(cache, cache.L, p, n, d)(eye)
    Q = cache.Ql @ cache.Ql.T
    m_dim = d + cache.B.shape[0]
    R = jnp.zeros((m_dim, m_dim), dtype=dtype)
    return A, H, Q, R, p


def steady_closed_loop_radius(cache, steady, dt, *, num_derivatives,
                              num_iters=256):
    """Spectral radius of the frozen latent closed loop (see the white
    analog :func:`pnmol_tpu.solvers.white.steady_closed_loop_radius`).

    Note: the latent prior's epsilon half is a non-mean-reverting IWP
    whose integrator modes are undetectable, so they sit AT the unit
    circle as Jordan blocks: ``||T^k|| ~ k^nu`` and the finite-k growth
    estimate reads ``1 + O(nu log k / k)`` — expect values slightly ABOVE
    1 here even for a perfectly healthy frozen loop (polynomial transient,
    not exponential growth). Use the white solver's certificate semantics
    (rho < 1) only for genuinely detectable systems."""
    from pnmol_tpu.ops import dare

    n = num_derivatives + 1
    d = cache.L.shape[0]
    D2 = cache.Ql.shape[0]
    dtype = cache.Ql.dtype
    p, _ = iwp.nordsieck_scales_1d(num_derivatives, jnp.asarray(dt, dtype))

    # frozen blocks as RUNTIME arguments (HTTP 413 on the relay if closed
    # over — see the white analog); the matvec never reads cov_inf/Sl
    dummy = jnp.zeros((1, 1), dtype)
    operands = (cache, steady._replace(cov_inf=dummy, Sl=dummy), p)

    def apply_T(ops, v):
        cache_, steady_, p_ = ops
        apply_H = _measurement_operator_latent(cache_, cache_.L, p_, n, d)
        va = iwp.apply_stack_matrix(cache_.A1d, v)
        z = apply_H(va)
        return va - steady_.L21 @ (steady_.Sl_inv @ z)

    v0 = jax.random.normal(jax.random.PRNGKey(0), (D2,), dtype=dtype)
    return dare.closed_loop_growth(apply_T, v0, num_iters, operands=operands)


def make_steady_state_latent_step(*, cache: LatentSolverCache,
                                  steady: SteadyStateCache,
                                  num_derivatives: int):
    """Mean-only latent step with frozen stationary factors.

    Same ``(mean (n, 2d), cov, t_next, dt) -> (mean, cov, error, reference,
    diffusion_sq)`` contract as :func:`make_latent_step_fn`; the covariance
    argument passes through unchanged (callers seed the solve with
    ``steady.cov_inf``). Per-step cost: one (d, d) matvec for the residual,
    one (m, m) vector triangular solve, one (2D, m) matvec for the gain
    application — no QR in the time loop.
    """
    n = num_derivatives + 1
    d = cache.L.shape[0]

    def step(mean, cov, t_next, dt):
        # full-precision matvecs, as in the white steady step (the frozen
        # closed loop is marginal in its slow modes); no-op on CPU
        with jax.default_matmul_precision("highest"):
            p, p_inv = iwp.nordsieck_scales_1d(num_derivatives, dt)
            M = mean * p_inv[:, None]
            Mp = cache.A1d @ M
            state_at = p[0] * Mp[0, :d]
            eps_at = p[0] * Mp[0, d:]
            z = jnp.concatenate(
                (p[1] * Mp[1, :d] - cache.L @ state_at - eps_at,
                 cache.B @ state_at)
            )
            # whiten with the precomputed inverse: a matvec keeps the step
            # on the MXU; a vector trisolve is latency-bound on TPU
            residual_white = steady.Sl_inv @ z
            diffusion_sq = residual_white @ residual_white / z.shape[0]
            m_new_flat = iwp.mean_to_flat(Mp) - steady.L21 @ residual_white
            M_new = iwp.flat_to_mean(m_new_flat, n) * p[:, None]
            error = steady.err_vec * jnp.sqrt(diffusion_sq)
        return M_new, cov, error, jnp.abs(M_new[0, :d]), diffusion_sq

    return step


class _LatentForceEK1Base(pdefilter.PDEFilter):
    """Shared initialization and plumbing of the latent-force solvers.

    ``factorization`` swaps the pre-array factorization of the step kernel,
    exactly as in the white solvers (``None`` = XLA QR; ``"householder"`` =
    the Pallas blocked Householder LQ; or any callable with the
    ``fused_predict_update`` contract). The latent pre-array is twice the
    white solver's in both dimensions, so the Householder speedup matters
    even more here. ``EK_ORDER`` selects the measurement linearization
    (1 = EK1 Jacobian, 0 = EK0 zeroth-order; see
    :class:`SemiLinearLatentForceEK0`).
    """

    EK_ORDER: int = 1

    LINEAR: bool = True

    def __init__(self, *args, factorization=None, fused=True,
                 propagate_band=None, steady_state=False, **kwargs):
        super().__init__(*args, **kwargs)
        # two-QR / banded-propagate controls, mirroring the white base
        self.fused = fused
        self.propagate_band = propagate_band
        # Steady-state (Riccati fixed-point) mode, mirroring the white base:
        # LINEAR + Constant-rule only; True, or a dict with "tol"/"max_iters".
        self.steady_state = steady_state
        self.steady_cache = None
        self.ssm = None
        self.state_iwp = None
        self.lf_iwp = None
        # "householder" resolves lazily in initialize(): leaf/block scale
        # with the stacked size 2d (the latent pre-array is 2x the white
        # one in both dims), and re-initializing on a different-sized PDE
        # re-resolves them — mirrors the white base.
        self._factorization_spec = factorization
        self._factorization_d = None
        self._init_update = None
        self.factorization = (
            None if factorization == "householder" else factorization
        )

    @property
    def supports_adaptive_steps(self):
        # Beyond the reference (which returns error_estimate=None and caps
        # the latent solvers at constant steps): the latent step derives a
        # calibrated H Q H^T error estimate, enabling Adaptive step rules.
        return True

    @property
    def E0(self):
        """Dense derivative-0 projection of one process half; lazy."""
        return self.lf_iwp.projection_matrix(0)

    @property
    def E1(self):
        return self.lf_iwp.projection_matrix(1)

    def initialize(self, pde):
        n, d = self.num_derivatives + 1, pde.L.shape[0]
        # PNMOL_INIT_PROFILE=1 -> self.init_profile (see the white base)
        mark = profiling.PhaseTimer(
            os.environ.get("PNMOL_INIT_PROFILE") == "1"
        )

        if self._factorization_spec == "householder" and (
            self._factorization_d != d
        ):
            from pnmol_tpu.solvers.white import resolve_householder_hooks

            # sized for the stacked dimension: the latent pre-array is the
            # white one at 2d points
            self.factorization, self._init_update = resolve_householder_hooks(
                2 * d
            )
            self._factorization_d = d

        f = getattr(pde, "f", None)
        df = getattr(pde, "df", None)
        linear = self.LINEAR
        t0 = pde.t0
        num_derivatives = self.num_derivatives
        spatial_kernel = self.spatial_kernel
        diffuse_scale = self.diffuse_prior_scale
        init_update = self._init_update or sqrt.update_sqrt_from_products

        # dtype-aware nugget (see the note in pnmol_tpu.solvers.white)
        dtype = jnp.asarray(pde.y0).dtype
        nugget_scale = 1e-6 if jnp.finfo(dtype).eps < 1e-10 else 1e-4

        # Size-conditional jit phases, mirroring the white base: eager setup
        # at large N accumulates per-op device buffers past the chip (the
        # stacked factor work is 4x the white one), while each jitted phase
        # costs a remote-compile roundtrip that small problems shouldn't pay.
        # The latent gate is half the white one because the stacked state
        # doubles the point count.
        if d >= 2048:
            wrap = jax.jit

            def wrap_donate(fn):
                donate = () if jax.default_backend() == "cpu" else (0, 1, 2)
                return jax.jit(fn, donate_argnums=donate)
        else:
            def wrap(fn):
                return fn

            wrap_donate = wrap

        # [Phase 1: prior] Gram Cholesky + closed-form y0 update of the
        # state half (pnmol_tpu.solvers.white.structured_init_y0 — no dense
        # kron, no (D+d)-sized QR).
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

        # [Phase 2: measurement] stacked factor over 2d points (point-major:
        # state points first). The latent prior kron(E_sqrtm, s I_n) is
        # derivative-block-diagonal with every block s*E_sqrtm, so each
        # stacked per-derivative block is blockdiag(state block, s*E_sqrtm)
        # over the (state | latent) points. The PDE residual at t0 collapses
        # to closed form (the stacked mean is zero except the state
        # derivative-0 row): z_ode = -L u0 - f(u0), z_bc = B u0.
        def _phase_measure(chol_gram, u0, C00, L, B, E_sqrtm, nugget):
            s = jnp.asarray(diffuse_scale, dtype=dtype)
            # stacked derivative-major factor blocks over (state | latent)
            # points: deriv 0 = blockdiag(C00, s E), derivs >= 1 =
            # blockdiag(s chol_gram, s E)
            B0 = jax.scipy.linalg.block_diag(C00, s * E_sqrtm)
            B1 = jax.scipy.linalg.block_diag(s * chol_gram, s * E_sqrtm)

            if linear:
                G_lin = L
                z_ode = -L @ u0
            else:
                fx = f(t0, u0)
                Jx = df(t0, u0)
                G_lin = Jx + L
                z_ode = -L @ u0 - fx
            z_pde = jnp.concatenate((z_ode, B @ u0))

            # H restricted to the derivative-{0,1} sub-stack (see
            # white.reduced_init_pde_update): ode rows = X1_state - G
            # X0_state - X0_eps, bc rows = B X0_state, applied columnwise to
            # blockdiag(B0, B1)
            b_rows = B.shape[0]
            zeros_d = jnp.zeros((d, d), dtype)
            HCsub = jnp.concatenate(
                (
                    jnp.concatenate(
                        (-G_lin @ C00, -s * E_sqrtm, s * chol_gram, zeros_d),
                        axis=1,
                    ),
                    jnp.concatenate(
                        (
                            B @ C00,
                            jnp.zeros((b_rows, 3 * d), dtype),
                        ),
                        axis=1,
                    ),
                ),
                axis=0,
            )
            # noise-free measurement + conditioning nugget, via an indexed
            # diagonal add of the TRACED nugget (a nugget*eye literal gets
            # constant-folded, which OOM-kills the XLA compile helper at
            # d ~ 1e4 — the white.py pattern)
            m_dim = d + b_rows
            mdiag = jnp.arange(m_dim)
            nugget_pde = jnp.zeros((m_dim, m_dim), dtype).at[
                mdiag, mdiag
            ].add(nugget)
            return B0, B1, HCsub, nugget_pde, z_pde

        B0, B1, HCsub, nugget_pde, z_pde = mark(
            "measure_assembly", wrap(_phase_measure)(
                chol_gram, u0, C00, pde.L, pde.B, pde.E_sqrtm,
                jnp.asarray(nugget_scale, dtype),
            ))
        del C00

        # [Phase 3: init pre-array QR] on the derivative-{0,1} sub-stack
        # ((4d + m) x (m + 4d) instead of (2D + m) x (m + 2D)); donated
        # operands free into the factorization workspace (the peak
        # allocation of the whole initialization at large N).
        from pnmol_tpu.solvers.white import reduced_init_pde_update

        def _phase_qr(HCsub, B0, nugget_pde, B1, z_pde, u0):
            blocks = [B0] + [B1] * (n - 1)
            u0_stack = jnp.concatenate((u0, jnp.zeros((d,), dtype)))
            return reduced_init_pde_update(
                blocks, HCsub, nugget_pde, z_pde, u0_stack, init_update
            )

        m0, C0 = mark("init_update_qr", wrap_donate(_phase_qr)(
            HCsub, B0, nugget_pde, B1, z_pde, u0
        ))
        del B0, HCsub, nugget_pde

        if self.propagate_band == "interleaved" and not self.fused:
            # lower-triangular state factor precondition of the interleaved
            # banded propagate (see pnmol_tpu.solvers.white)
            tri = getattr(self.factorization, "tri", None)
            if tri is None:
                def tri(C):
                    return jnp.linalg.qr(C.T)[1].T
            if d >= 2048:
                donate = () if jax.default_backend() == "cpu" else (0,)
                tri = jax.jit(tri, donate_argnums=donate)
            C0 = mark("interleave_retriangularize", tri(C0))

        # [Phase 4: step cache] stacked prior collapsed to a single IWP over
        # 2d points; Ql assembled last so it is never co-resident with the
        # init pre-array.
        self.state_iwp = iwp.IntegratedWienerTransition(
            num_derivatives=num_derivatives,
            wiener_process_dimension=d,
            wp_diffusion_sqrtm=chol_gram,
        )
        self.lf_iwp = iwp.IntegratedWienerTransition(
            num_derivatives=num_derivatives,
            wiener_process_dimension=d,
            wp_diffusion_sqrtm=pde.E_sqrtm,
        )
        self.ssm = stacked_ssm.StackedSSM(
            processes=[self.state_iwp, self.lf_iwp]
        )

        def _phase_aux(chol_gram, E_sqrtm):
            spatial = jax.scipy.linalg.block_diag(chol_gram, E_sqrtm)
            merged = iwp.IntegratedWienerTransition(
                num_derivatives=num_derivatives,
                wiener_process_dimension=2 * d,
                wp_diffusion_sqrtm=spatial,
            )
            return merged.process_noise_factor

        Ql = mark("aux_Ql", wrap(_phase_aux)(chol_gram, pde.E_sqrtm))
        A1d_np, _ = iwp.system_matrices_1d(num_derivatives, str(dtype))
        self._cache = LatentSolverCache(
            A1d=jnp.asarray(A1d_np), Ql=Ql, L=pde.L, B=pde.B
        )
        self._step_fn = make_latent_step_fn(
            cache=self._cache,
            num_derivatives=num_derivatives,
            f=f,
            df=df,
            linear=linear,
            factorization=self.factorization,
            fused=self.fused,
            propagate_band=self.propagate_band,
            ek_order=self.EK_ORDER,
        )

        # empty options dict = "on, all defaults" (see white.py: the bare
        # truthiness test silently disabled the mode for opts == {})
        if self.steady_state or isinstance(self.steady_state, dict):
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
            opts = (
                self.steady_state
                if isinstance(self.steady_state, dict)
                else {}
            )
            dt0 = jnp.asarray(self.steprule.dt, dtype=m0.dtype)
            # dtype-aware default tolerance, as in the white base
            default_tol = 1e-8 if m0.dtype == jnp.float64 else 1e-5
            from pnmol_tpu.solvers.white import run_steady_convergence

            # NO doubling (SDA) seed here, deliberately: the latent DARE has
            # no finite stationary solution. The epsilon half is a
            # non-mean-reverting IWP whose integrator modes are UNDETECTABLE
            # through the measurement (only combinations reach the ODE
            # rows), so the covariance grows like a random walk forever
            # while the GAIN converges — verified by brute-force dense
            # iteration (maxdiag grows linearly, delta decays like 1/k).
            # The recursion's Gram-diagonal stationarity check is exactly
            # the right object here: a gain-stationarity proxy.
            self.steady_diagnostics = {}
            self.steady_cache = run_steady_convergence(
                converge_latent_steady_state, self._cache, C0, dt0, opts,
                default_tol,
                num_derivatives=num_derivatives,
                fused=self.fused,
                factorization=self.factorization,
                propagate_band=self.propagate_band,
            )
            mark("steady_riccati", self.steady_cache)
            C0 = self.steady_cache.cov_inf
            self._step_fn = make_steady_state_latent_step(
                cache=self._cache,
                steady=self.steady_cache,
                num_derivatives=num_derivatives,
            )

        self.init_profile = mark.profile
        # Point-major glue: [state (n,d) | latent (n,d)] along the last axis.
        m0_state, m0_latent = jnp.split(m0, 2)
        mean0 = jnp.concatenate(
            (iwp.flat_to_mean(m0_state, n), iwp.flat_to_mean(m0_latent, n)),
            axis=1,
        )
        y = rv.MultivariateNormal(mean=mean0, cov_sqrtm=C0)
        return pdefilter.PDEFilterState(
            t=jnp.asarray(pde.t0, dtype=m0.dtype),
            y=y,
            error_estimate=None,
            reference_state=None,
            diffusion_squared_local=jnp.zeros((), dtype=m0.dtype),
        )

    def _evaluate_ode_dense(self, pde, m_stack, t):
        """Dense latent measurement assembly; used once at initialization."""
        d = pde.L.shape[0]
        D = self.state_iwp.state_dimension
        E0, E1 = self.E0, self.E1
        state_at = E0 @ m_stack[:D]
        eps_at = E0 @ m_stack[D:]
        from pnmol_tpu.solvers.white import _linearize

        G, shift = _linearize(
            getattr(pde, "f", None), getattr(pde, "df", None), pde.L, t,
            state_at, self.LINEAR, self.EK_ORDER,
        )
        H_state = E1 - G @ E0
        H_eps = -E0
        H_bc = pde.B @ E0
        H = jnp.block([[H_state, H_eps], [H_bc, jnp.zeros_like(H_bc)]])
        z = H @ m_stack + jnp.concatenate(
            (shift, jnp.zeros(pde.B.shape[0], dtype=shift.dtype))
        )
        return z, H

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


class LinearLatentForceEK1(_LatentForceEK1Base):
    """Latent-force EK1 for linear evolution equations."""

    LINEAR = True


class SemiLinearLatentForceEK0(_LatentForceEK1Base):
    """EK0 latent-force filter: zeroth-order measurement model (no Jacobian
    anywhere; see pnmol_tpu.solvers.white.SemiLinearWhiteNoiseEK0)."""

    LINEAR = False
    EK_ORDER = 0


class SemiLinearLatentForceEK1(_LatentForceEK1Base):
    """Latent-force EK1 for semilinear evolution equations."""

    LINEAR = False
