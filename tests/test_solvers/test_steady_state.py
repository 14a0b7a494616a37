"""Steady-state (stationary) white-solver mode.

For LINEAR problems at constant dt the covariance half of the Kalman
recursion is data-independent, so it converges to the square-root solution
of the discrete algebraic Riccati equation; the solver then freezes those
factors and every step is a mean-only O(D*m) update. A capability beyond
the reference (which re-factorizes the identical pre-array every step —
``/root/reference/src/pnmol/white.py:96-146``). These tests pin:

* the fixed point really is a fixed point of the exact per-step recursion,
* the frozen-gain mean recursion tracks the full solver after the
  covariance transient has died out,
* the guard rails (LINEAR-only, Constant-rule-only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnmol_tpu import kernels
from pnmol_tpu.models import examples
from pnmol_tpu.odetools import step
from pnmol_tpu.solvers import latent, white


@pytest.fixture(scope="module")
def heat():
    return examples.heat_1d_discretized(dx=0.1, tmax=2.0)


def _solver(**kw):
    return white.LinearWhiteNoiseEK1(
        steprule=step.Constant(dt=0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        **kw,
    )


def test_converged_factors_are_a_fixed_point(heat):
    solver = _solver(steady_state=True)
    solver.initialize(heat)
    steady = solver.steady_cache
    assert int(steady.iterations) < 200  # converged before the cap
    assert float(steady.delta) < 1e-8

    # One more exact covariance step from the fixed point must reproduce
    # the stationary Gram (the factor itself is only unique up to
    # right-rotations).
    again = white.converge_white_steady_state(
        solver._cache, steady.cov_inf, jnp.asarray(0.05, steady.cov_inf.dtype),
        num_derivatives=solver.num_derivatives, max_iters=1,
    )
    np.testing.assert_allclose(
        again.cov_inf @ again.cov_inf.T,
        steady.cov_inf @ steady.cov_inf.T,
        rtol=1e-6, atol=1e-9,
    )


def test_steady_solve_tracks_full_solver(heat):
    sol_full = _solver().solve(heat)
    steady_solver = _solver(steady_state=True)
    sol_steady = steady_solver.solve(heat)

    # Identical time grid; the mean recursions differ only while the full
    # solver's covariance transient (and hence its gain) differs from the
    # stationary one — by tmax the trajectories must have locked together.
    np.testing.assert_allclose(np.asarray(sol_steady.t),
                               np.asarray(sol_full.t))
    np.testing.assert_allclose(
        sol_steady.mean[-1], sol_full.mean[-1], rtol=5e-3, atol=1e-6
    )
    # ... and the discrepancy must SHRINK as the transient dies out.
    mid, end = len(sol_full.t) // 3, -1
    err_mid = float(jnp.max(jnp.abs(sol_steady.mean[mid] - sol_full.mean[mid])))
    err_end = float(jnp.max(jnp.abs(sol_steady.mean[end] - sol_full.mean[end])))
    assert err_end <= err_mid + 1e-12

    # Covariance passes through frozen: every stored factor is cov_inf (up
    # to the driver's final calibration rescale).
    steady = steady_solver.steady_cache
    gram_inf = np.asarray(steady.cov_inf @ steady.cov_inf.T)
    gram_last = np.asarray(
        sol_steady.cov_sqrtm[-1] @ sol_steady.cov_sqrtm[-1].T
    )
    scale = gram_last.ravel() @ gram_inf.ravel() / (
        gram_inf.ravel() @ gram_inf.ravel()
    )
    np.testing.assert_allclose(gram_last, scale * gram_inf,
                               rtol=1e-6, atol=1e-10)


def test_chunked_convergence_matches_single_run(heat):
    """The chunked host-loop driver (remote relays kill >5 min executions)
    must land on the same fixed point as one uninterrupted while_loop."""
    solver = _solver()
    state = solver.initialize(heat)
    C0 = state.y.cov_sqrtm
    dt = jnp.asarray(0.05, C0.dtype)

    one = white.run_steady_convergence(
        white.converge_white_steady_state, solver._cache, C0, dt,
        {}, 1e-8, num_derivatives=solver.num_derivatives,
    )
    chunked = white.run_steady_convergence(
        white.converge_white_steady_state, solver._cache, C0, dt,
        {"chunk_iters": 3}, 1e-8, num_derivatives=solver.num_derivatives,
    )
    assert float(chunked.delta) < 1e-8
    # the chunk seams run extra covariance steps, so numerically-ZERO Gram
    # entries (boundary rows, ~1e-22 against a ~1e-2 diagonal) differ in
    # reduction order; the atol absorbs those, the rtol pins everything real
    np.testing.assert_allclose(
        chunked.cov_inf @ chunked.cov_inf.T,
        one.cov_inf @ one.cov_inf.T,
        rtol=1e-8, atol=5e-9,
    )
    # the two drivers stop at different iterates (seams add covariance
    # steps), so the frozen cross block agrees to the residual transient
    # the 1e-8 DIAGONAL tolerance still allows, not to roundoff
    np.testing.assert_allclose(
        chunked.L21 @ chunked.L21.T, one.L21 @ one.L21.T,
        rtol=5e-5, atol=5e-9,
    )
    np.testing.assert_allclose(chunked.err_vec, one.err_vec,
                               rtol=1e-9, atol=1e-12)


def test_f64_promoted_riccati_on_f32_problem(heat):
    """opts["dtype"]="float64" runs the recursion in f64 on an f32 problem
    and casts the frozen blocks back — the large-D configuration (at
    D ~ 1e4 an f32 recursion's delta floors at ~7e-3; docs/SCALE.md)."""
    solver = _solver()
    state = solver.initialize(heat)
    dt64 = jnp.asarray(0.05, jnp.float64)

    oracle = white.run_steady_convergence(
        white.converge_white_steady_state, solver._cache,
        state.y.cov_sqrtm, dt64, {}, 1e-8,
        num_derivatives=solver.num_derivatives,
    )

    cache32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        solver._cache,
    )
    C0_32 = state.y.cov_sqrtm.astype(jnp.float32)
    promoted = white.run_steady_convergence(
        white.converge_white_steady_state, cache32, C0_32,
        jnp.asarray(0.05, jnp.float32), {"dtype": "float64"}, 1e-5,
        num_derivatives=solver.num_derivatives,
    )
    # outputs come back in the PROBLEM dtype ...
    assert promoted.cov_inf.dtype == jnp.float32
    assert promoted.Sl_inv.dtype == jnp.float32
    # ... certified below any f32-reachable stationarity (the promote path
    # resets the tolerance to the f64 default 1e-8)
    assert float(promoted.delta) < 1e-8
    # ... and agree with the all-f64 oracle to f32 cast error (the cache
    # cast injects eps_f32-relative perturbations of the operators).
    np.testing.assert_allclose(
        promoted.cov_inf @ promoted.cov_inf.T,
        (oracle.cov_inf @ oracle.cov_inf.T).astype(jnp.float32),
        rtol=2e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        promoted.err_vec, oracle.err_vec.astype(jnp.float32),
        rtol=2e-4, atol=1e-8,
    )


def test_steady_state_through_two_qr_householder_hook(heat):
    from pnmol_tpu.ops import qr_householder as qh

    hook = qh.make_householder_lq_factorization(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    ref = _solver(steady_state=True)
    ref.initialize(heat)
    hooked = _solver(steady_state=True, factorization=hook, fused=False,
                     propagate_band="interleaved")
    hooked.initialize(heat)
    np.testing.assert_allclose(
        hooked.steady_cache.cov_inf @ hooked.steady_cache.cov_inf.T,
        ref.steady_cache.cov_inf @ ref.steady_cache.cov_inf.T,
        rtol=1e-6, atol=1e-9,
    )
    # the factor itself only up to row signs (QR sign freedom)
    np.testing.assert_allclose(
        hooked.steady_cache.Sl @ hooked.steady_cache.Sl.T,
        ref.steady_cache.Sl @ ref.steady_cache.Sl.T,
        rtol=1e-6, atol=1e-9,
    )


def test_steady_state_rejects_adaptive_rule(heat):
    solver = white.LinearWhiteNoiseEK1(
        steprule=step.Adaptive(abstol=1e-3, reltol=1e-3),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        steady_state=True,
    )
    with pytest.raises(ValueError, match="Constant"):
        solver.initialize(heat)


def test_steady_state_rejects_nonlinear(heat):
    spruce = examples.spruce_budworm_1d_discretized(dx=0.2, tmax=0.5)
    solver = white.SemiLinearWhiteNoiseEK1(
        steprule=step.Constant(dt=0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        steady_state=True,
    )
    with pytest.raises(ValueError, match="LINEAR"):
        solver.initialize(spruce)


# ---------------------------------------------------------------------------
# Latent-force analog (same stationary-recursion argument: the noise-free
# update's measurement operator is time-invariant for linear problems).
# ---------------------------------------------------------------------------


def _latent_solver(**kw):
    return latent.LinearLatentForceEK1(
        steprule=step.Constant(dt=0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        **kw,
    )


def test_latent_converged_factors_are_a_fixed_point(heat):
    solver = _latent_solver(steady_state=True)
    solver.initialize(heat)
    steady = solver.steady_cache
    assert int(steady.iterations) < 200
    assert float(steady.delta) < 1e-8

    again = latent.converge_latent_steady_state(
        solver._cache, steady.cov_inf,
        jnp.asarray(0.05, steady.cov_inf.dtype),
        num_derivatives=solver.num_derivatives, max_iters=1,
    )
    np.testing.assert_allclose(
        again.cov_inf @ again.cov_inf.T,
        steady.cov_inf @ steady.cov_inf.T,
        rtol=1e-6, atol=1e-9,
    )


def test_latent_steady_step_matches_full_step_at_fixed_point(heat):
    # The exact correctness statement: seeded AT the stationary covariance,
    # the full latent step's gain equals the frozen one (K = L21 Sl^{-1} is
    # rotation-invariant), so the two mean recursions must agree to roundoff
    # step for step. (Unlike the white-heat case, the latent transient —
    # the epsilon half is a non-mean-reverting IWP — does not die out within
    # a short solve, so a trajectory-level "locks by tmax" test would only
    # measure the transient, not the mode's correctness.)
    solver = _latent_solver(steady_state=True)
    state0 = solver.initialize(heat)
    steady = solver.steady_cache

    full = _latent_solver()
    full.initialize(heat)

    mean_full = state0.y.mean
    mean_steady = state0.y.mean
    cov = steady.cov_inf
    dt = jnp.asarray(0.05, mean_full.dtype)
    t = jnp.asarray(heat.t0, mean_full.dtype)
    for _ in range(8):
        t = t + dt
        mean_full, cov, _, _, diff_full = full._step_fn(
            mean_full, cov, t, dt
        )
        mean_steady, _, _, _, diff_steady = solver._step_fn(
            mean_steady, steady.cov_inf, t, dt
        )
        # agreement is bounded by the Riccati convergence tol (1e-8 on the
        # Gram diagonal), accumulated over the steps — far below the
        # 1e-1-magnitude transient mismatch this guards against
        np.testing.assert_allclose(
            np.asarray(mean_steady), np.asarray(mean_full),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            float(diff_steady), float(diff_full), rtol=1e-5, atol=1e-9
        )


def test_latent_steady_solve_transient_shrinks(heat):
    sol_full = _latent_solver().solve(heat)
    steady_solver = _latent_solver(steady_state=True)
    sol_steady = steady_solver.solve(heat)

    np.testing.assert_allclose(np.asarray(sol_steady.t),
                               np.asarray(sol_full.t))
    # The trajectories differ only through the gain transient; by tmax the
    # discrepancy must be shrinking (the stationary gain is the full
    # solver's own late-time gain).
    mid, end = len(sol_full.t) // 3, -1
    err_mid = float(jnp.max(jnp.abs(sol_steady.mean[mid] - sol_full.mean[mid])))
    err_end = float(jnp.max(jnp.abs(sol_steady.mean[end] - sol_full.mean[end])))
    assert err_end <= err_mid + 1e-12
    # Covariance passes through frozen (up to the final calibration rescale).
    steady = steady_solver.steady_cache
    gram_inf = np.asarray(steady.cov_inf @ steady.cov_inf.T)
    gram_last = np.asarray(
        sol_steady.cov_sqrtm[-1] @ sol_steady.cov_sqrtm[-1].T
    )
    scale = gram_last.ravel() @ gram_inf.ravel() / (
        gram_inf.ravel() @ gram_inf.ravel()
    )
    np.testing.assert_allclose(gram_last, scale * gram_inf,
                               rtol=1e-6, atol=1e-10)


def test_latent_steady_state_rejects_adaptive_rule(heat):
    solver = latent.LinearLatentForceEK1(
        steprule=step.Adaptive(abstol=1e-3, reltol=1e-3),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        steady_state=True,
    )
    with pytest.raises(ValueError, match="Constant"):
        solver.initialize(heat)


def test_latent_steady_state_rejects_nonlinear():
    spruce = examples.spruce_budworm_1d_discretized(dx=0.2, tmax=0.5)
    solver = latent.SemiLinearLatentForceEK1(
        steprule=step.Constant(dt=0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        steady_state=True,
    )
    with pytest.raises(ValueError, match="LINEAR"):
        solver.initialize(spruce)


def test_sda_seed_matches_unseeded_fixed_point(heat):
    """The doubling (SDA) seed reaches the same stationary solution the
    plain recursion converges to — at a handful of polish iterations
    instead of hundreds (pnmol_tpu.ops.dare)."""
    seeded = _solver(steady_state=True)  # seed on by default
    seeded.initialize(heat)
    unseeded = _solver(
        steady_state={"seed": False, "max_iters": 5000, "tol": 1e-12}
    )
    unseeded.initialize(heat)

    a, b = seeded.steady_cache, unseeded.steady_cache
    # factors are unique only up to column signs/rotations: compare Grams
    np.testing.assert_allclose(
        a.cov_inf @ a.cov_inf.T, b.cov_inf @ b.cov_inf.T,
        rtol=1e-6, atol=1e-10,
    )
    # ... and the gain (also invariant under the sign ambiguity)
    np.testing.assert_allclose(
        a.L21 @ a.Sl_inv, b.L21 @ b.Sl_inv, rtol=1e-4, atol=1e-8
    )
    np.testing.assert_allclose(a.err_vec, b.err_vec, rtol=1e-8)
    # the seed did the work: the recursion only polished
    assert int(a.iterations) <= 8
    assert int(b.iterations) > int(a.iterations)
    info = seeded.steady_diagnostics
    assert info["dare_residual"] < 1e-6
    assert int(info["sda_iterations"]) < 64


def test_closed_loop_radius_certificate(heat):
    """rho(T) < 1 for the frozen closed loop: the stability diagnostic
    steady-state runs report (docs/SCALE.md 'Steady-state mode')."""
    solver = _solver(steady_state=True)
    solver.initialize(heat)
    rho = float(white.steady_closed_loop_radius(
        solver._cache, solver.steady_cache, 0.05,
        num_derivatives=solver.num_derivatives,
    ))
    assert 0.0 < rho < 1.0


def test_latent_steady_is_deliberately_unseeded(heat):
    """The latent DARE has NO finite stationary solution: the epsilon
    half's integrator modes are undetectable through the measurement, so
    the covariance grows like a random walk forever while the GAIN
    converges (verified by brute-force dense iteration below). The solver
    therefore converges the recursion directly (Gram-diagonal stationarity
    = gain-stationarity proxy) and must NOT run the doubling seed."""
    solver = latent.LinearLatentForceEK1(
        steprule=step.Constant(dt=0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        steady_state=True,
    )
    solver.initialize(heat)
    assert "sda_iterations" not in solver.steady_diagnostics
    assert not bool(jnp.any(jnp.isnan(solver.steady_cache.cov_inf)))

    # document the divergence: the dense covariance recursion's diagonal
    # keeps growing (no fixed point), while the gain stabilizes
    A, H, Q, R, _ = latent.latent_dense_system(
        solver._cache, 0.05, num_derivatives=solver.num_derivatives
    )
    A, H, Q = (np.asarray(x, np.float64) for x in (A, H, Q))
    Sigma = Q.copy()
    diags, gains = [], []
    for k in range(600):
        S = H @ Sigma @ H.T
        K = Sigma @ H.T @ np.linalg.inv(S)
        Sigma = A @ (Sigma - K @ H @ Sigma) @ A.T + Q
        if k in (199, 399, 599):
            diags.append(np.max(np.diag(Sigma)))
            gains.append(K)
    # roughly linear growth: strictly monotone, substantial over the run
    assert diags[2] > diags[1] > diags[0]
    assert diags[2] - diags[0] > 0.2 * diags[0]
    gain_drift = np.max(np.abs(gains[2] - gains[1])) / np.max(np.abs(gains[2]))
    assert gain_drift < 1e-2  # the gain has essentially converged


def test_latent_closed_loop_radius(heat):
    solver = latent.LinearLatentForceEK1(
        steprule=step.Constant(dt=0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        steady_state=True,
    )
    solver.initialize(heat)
    rho = float(latent.steady_closed_loop_radius(
        solver._cache, solver.steady_cache, 0.05,
        num_derivatives=solver.num_derivatives,
    ))
    # undetectable integrator modes sit AT the unit circle as Jordan
    # blocks: ||T^k|| ~ k^nu, so the finite-k growth estimate reads
    # 1 + O(nu log k / k) — POLYNOMIAL transient, not exponential growth.
    # The certificate asserts no genuine exponential instability.
    assert 0.0 < rho < 1.05


def test_empty_options_dict_enables_steady_mode(heat):
    """steady_state={} means "on, all defaults" — the round-4 N=1e4 bench
    passed an all-defaults (empty) options dict and the bare truthiness
    test silently disabled the mode (steady_cache stayed None)."""
    solver = _solver(steady_state={})
    solver.initialize(heat)
    assert solver.steady_cache is not None
    assert float(solver.steady_cache.delta) < 1e-8


def test_factored_dare_residual_matches_dense(heat):
    """The operator-form DARE residual (no dense A/G/Q rebuilt — the
    round-5 post-loop memory fix in the seed path) equals the dense
    certificate to roundoff."""
    from pnmol_tpu.ops import dare

    solver = _solver()
    solver.initialize(heat)
    cache = solver._cache
    dt = 1e-3
    A, H, Q, R, p = white.white_dense_system(
        cache, dt, num_derivatives=solver.num_derivatives
    )
    # same G0 floor construction as sda_seed_from_dense
    HQ_gram_diag = jnp.sum((H @ Q) * H, axis=1)
    scale = jnp.maximum(jnp.max(jnp.diag(R)), jnp.max(HQ_gram_diag))
    nug = (1e-6 ** 2) * scale
    R_eps = R + nug * jnp.eye(R.shape[0], dtype=Q.dtype)
    Lr = jnp.linalg.cholesky(R_eps)
    Wh = jax.scipy.linalg.solve_triangular(Lr, H, lower=True)
    G0 = Wh.T @ Wh
    res = dare.sda(A, G0, Q, tol=1e-12)

    dense = float(dare.dare_residual(res.sigma, A, G0, Q))
    factored = float(
        white._factored_dare_residual(res.sigma, Wh, cache.A1d, cache.Ql)
    )
    # identical algebra through different factorizations: agree to the
    # certificate's own roundoff scale
    assert abs(dense - factored) <= 1e-7 + 0.1 * max(dense, factored)
