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
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from pnmol_tpu.ops import iwp, rv, sqrt, stacked_ssm
from pnmol_tpu.solvers import pdefilter
from pnmol_tpu.solvers.white import point_major_blockdiag, structured_init_y0


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
                        linear: bool, fused: bool = True, factorization=None):
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
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_derivatives", "f", "df", "linear", "fused",
                     "factorization"),
)
def latent_attempt_step(cache, mean, cov_sqrtm, t_next, dt, *, num_derivatives,
                        f, df, linear, fused, factorization=None):
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
    if linear:
        G, shift = cache.L, jnp.zeros_like(state_at)
    else:
        fx = f(t_next, state_at)
        Jx = df(t_next, state_at)
        G, shift = Jx + cache.L, Jx @ state_at - fx
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

    # [Predict + update covariance] (noise-free measurement)
    ACl = iwp.apply_stack_matrix(cache.A1d, Cl)
    if factorization is not None:
        HACl = apply_H(ACl)
        zeros_R = jnp.zeros((z.shape[0], z.shape[0]), dtype=ACl.dtype)
        Cl_new, K, Sl = factorization(HACl, ACl, HQl, cache.Ql, zeros_R)
    elif fused:
        HACl = apply_H(ACl)
        zeros_R = jnp.zeros((z.shape[0], z.shape[0]), dtype=ACl.dtype)
        Cl_new, K, Sl = sqrt.fused_predict_update(
            HACl, ACl, HQl, cache.Ql, zeros_R
        )
    else:
        Clp = sqrt.propagate_cholesky_factor(ACl, cache.Ql)
        HClp = apply_H(Clp)
        Cl_new, K, Sl = sqrt.update_sqrt_no_meascov_from_products(HClp, Clp)
    m_new_flat = iwp.mean_to_flat(Mp) - K @ z

    # [Calibrate] true Mahalanobis via the lower solve (sign-invariant;
    # see the note in pnmol_tpu.solvers.white)
    residual_white = jax.scipy.linalg.solve_triangular(Sl, z, lower=True)
    diffusion_sq = residual_white @ residual_white / m_dim

    # [Un-precondition]
    M_new = iwp.flat_to_mean(m_new_flat, n) * p[:, None]
    C_new = iwp.scale_stack(p, Cl_new)
    return M_new, C_new, error, jnp.abs(M_new[0, :d]), diffusion_sq



class _LatentForceEK1Base(pdefilter.PDEFilter):
    """Shared initialization and plumbing of the latent-force solvers.

    ``factorization`` swaps the pre-array factorization of the step kernel,
    exactly as in the white solvers (``None`` = XLA QR; ``"householder"`` =
    the Pallas blocked Householder LQ; or any callable with the
    ``fused_predict_update`` contract). The latent pre-array is twice the
    white solver's in both dimensions, so the Householder speedup matters
    even more here.
    """

    LINEAR: bool = True

    def __init__(self, *args, factorization=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.ssm = None
        self.state_iwp = None
        self.lf_iwp = None
        if factorization == "householder":
            from pnmol_tpu.ops import qr_householder

            factorization = qr_householder.make_householder_lq_factorization()
        self.factorization = factorization

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

        # [Stacked prior] state-IWP (Gram Cholesky) (+) latent-IWP (E_sqrtm)
        X = pde.mesh_spatial.points
        gram = self.spatial_kernel(X, X.T)
        chol_gram = jnp.linalg.cholesky(gram)
        self.state_iwp = iwp.IntegratedWienerTransition(
            num_derivatives=self.num_derivatives,
            wiener_process_dimension=d,
            wp_diffusion_sqrtm=chol_gram,
        )
        self.lf_iwp = iwp.IntegratedWienerTransition(
            num_derivatives=self.num_derivatives,
            wiener_process_dimension=d,
            wp_diffusion_sqrtm=pde.E_sqrtm,
        )
        self.ssm = stacked_ssm.StackedSSM(processes=[self.state_iwp, self.lf_iwp])
        merged = self.ssm.as_single_iwp()

        f = getattr(pde, "f", None)
        df = getattr(pde, "df", None)
        self._cache = LatentSolverCache(
            A1d=merged.preconditioned_discretize_1d[0],
            Ql=merged.process_noise_factor,
            L=pde.L,
            B=pde.B,
        )
        self._step_fn = make_latent_step_fn(
            cache=self._cache,
            num_derivatives=self.num_derivatives,
            f=f,
            df=df,
            linear=self.LINEAR,
            factorization=self.factorization,
        )

        # [Init] update the state half on y0 in closed form (see
        # pnmol_tpu.solvers.white.structured_init_y0 — no dense kron, no
        # (D+d)-sized QR), glue with the untouched latent half, then update
        # the stack on the PDE measurement with a product-form QR.
        # dtype-aware nugget (see the note in pnmol_tpu.solvers.white)
        dtype = jnp.asarray(pde.y0).dtype
        nugget_scale = 1e-6 if jnp.finfo(dtype).eps < 1e-10 else 1e-4
        u0, y0_blocks = structured_init_y0(
            gram, chol_gram, pde.y0, self.diffuse_prior_scale, nugget_scale, n
        )

        # Stacked factor over 2d points (point-major: state points first).
        # The latent prior kron(E_sqrtm, s I_n) is derivative-block-diagonal
        # with every block s*E_sqrtm, so each stacked per-derivative block is
        # blockdiag(state block, s*E_sqrtm) over the (state | latent) points.
        D = d * n
        s = jnp.asarray(self.diffuse_prior_scale, dtype=dtype)
        stacked_blocks = [
            jax.scipy.linalg.block_diag(bk, s * pde.E_sqrtm) for bk in y0_blocks
        ]
        C0_block = point_major_blockdiag(stacked_blocks)

        # PDE residual at t0: the stacked mean is zero except the state
        # derivative-0 row (= u0), so z collapses to closed form (cf.
        # _evaluate_ode_dense): z_ode = -L u0 - f(u0), z_bc = B u0.
        if self.LINEAR:
            G_lin = pde.L
            z_ode = -pde.L @ u0
        else:
            fx = f(pde.t0, u0)
            Jx = df(pde.t0, u0)
            G_lin = Jx + pde.L
            z_ode = -pde.L @ u0 - fx
        z_pde = jnp.concatenate((z_ode, pde.B @ u0))

        ones = jnp.ones((n,), dtype=dtype)
        apply_H = _measurement_operator_latent(self._cache, G_lin, ones, n, d)
        HC = apply_H(C0_block)
        nugget_pde = nugget_scale * jnp.eye(d + pde.B.shape[0], dtype=dtype)
        C0, kgain, _ = sqrt.update_sqrt_from_products(HC, C0_block, nugget_pde)
        m0_stack = jnp.concatenate(
            (iwp.mean_to_flat(jnp.zeros((n, d), dtype=dtype).at[0].set(u0)),
             jnp.zeros((D,), dtype=dtype))
        )
        m0 = m0_stack - kgain @ z_pde

        # Point-major glue: [state (n,d) | latent (n,d)] along the last axis.
        m0_state, m0_latent = jnp.split(m0, 2)
        mean0 = jnp.concatenate(
            (iwp.flat_to_mean(m0_state, n), iwp.flat_to_mean(m0_latent, n)), axis=1
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
        if self.LINEAR:
            G, shift = pde.L, jnp.zeros_like(state_at)
        else:
            fx = pde.f(t, state_at)
            Jx = pde.df(t, state_at)
            G, shift = Jx + pde.L, Jx @ state_at - fx
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


class SemiLinearLatentForceEK1(_LatentForceEK1Base):
    """Latent-force EK1 for semilinear evolution equations."""

    LINEAR = False
