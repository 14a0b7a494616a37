"""Blocked Householder QR (Pallas leaf kernel) vs dense oracles.

Runs the kernel in interpreter mode on the CPU test platform (same pattern
as tests/test_ops/test_pallas_gram.py); the TPU-compiled path is exercised
by experiments/qr_probe.py and the large-N scale runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnmol_tpu.ops import qr_householder as qh
from pnmol_tpu.ops import sqrt


@pytest.mark.parametrize(
    "shape", [(40, 17), (64, 64), (130, 50), (97, 33)], ids=str
)
def test_gram_matches_dense_qr(shape):
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal(shape))
    R = qh.blocked_qr_r(A, leaf=8, block=16, row_quant=32, interpret=True)
    assert R.shape == (shape[1], shape[1])
    # any valid QR has the same Gram as the matrix itself
    np.testing.assert_allclose(R.T @ R, A.T @ A, rtol=1e-10, atol=1e-10)
    assert float(jnp.max(jnp.abs(jnp.tril(R, -1)))) == 0.0


def test_degenerate_columns():
    """Zero and duplicate columns (noise-free Dirichlet measurement rows
    produce exactly-singular pre-array directions)."""
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.standard_normal((50, 12)))
    A = A.at[:, 3].set(0.0)
    A = A.at[:, 7].set(A[:, 2])
    R = qh.blocked_qr_r(A, leaf=4, block=8, row_quant=16, interpret=True)
    np.testing.assert_allclose(R.T @ R, A.T @ A, rtol=1e-10, atol=1e-12)
    assert bool(jnp.all(jnp.isfinite(R)))


def test_factorization_hook_matches_fused_predict_update():
    """The pre-array factorization hook reproduces sqrt.fused_predict_update
    (posterior factor in Gram, gain and innovation factor exactly)."""
    rng = np.random.default_rng(3)
    D, m = 24, 9
    HACl = jnp.asarray(rng.standard_normal((m, D)))
    ACl = jnp.asarray(np.tril(rng.standard_normal((D, D))))
    HQl = jnp.asarray(rng.standard_normal((m, D)))
    Ql = jnp.asarray(np.tril(rng.standard_normal((D, D))))
    Rm = jnp.asarray(np.tril(rng.standard_normal((m, m))))

    fact = qh.make_householder_factorization(
        leaf=8, block=16, row_quant=32, interpret=True
    )
    C_hh, K_hh, S_hh = fact(HACl, ACl, HQl, Ql, Rm)
    C_ref, K_ref, S_ref = sqrt.fused_predict_update(HACl, ACl, HQl, Ql, Rm)

    np.testing.assert_allclose(C_hh @ C_hh.T, C_ref @ C_ref.T, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(S_hh @ S_hh.T, S_ref @ S_ref.T, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(K_hh, K_ref, rtol=1e-8, atol=1e-9)


def test_wide_matrix_rejected():
    with pytest.raises(ValueError):
        qh.blocked_qr_r(jnp.zeros((3, 5)), interpret=True)
    with pytest.raises(ValueError):
        qh.blocked_lq_l(jnp.zeros((5, 3)), interpret=True)


@pytest.mark.parametrize("shape", [(17, 40), (64, 64), (33, 257)], ids=str)
def test_lq_gram_matches(shape):
    """Wide (LQ) orientation: L L^T == W W^T, L lower triangular."""
    rng = np.random.default_rng(4)
    W = jnp.asarray(rng.standard_normal(shape))
    W = W.at[min(3, shape[0] - 1), :].set(0.0)  # degenerate row
    L = qh.blocked_lq_l(W, leaf=8, block=16, lane_quant=64, interpret=True)
    assert L.shape == (shape[0], shape[0])
    np.testing.assert_allclose(L @ L.T, W @ W.T, rtol=1e-10, atol=1e-10)
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0


def test_update_from_products_and_propagate_match_sqrt_tier():
    """The LQ drop-ins for update_sqrt_from_products / propagate_cholesky
    match the dense tier (Grams exactly; gain exactly)."""
    rng = np.random.default_rng(6)
    D, m = 20, 7
    HC = jnp.asarray(rng.standard_normal((m, D)))
    C = jnp.asarray(np.tril(rng.standard_normal((D, D))))
    Rm = jnp.asarray(np.tril(rng.standard_normal((m, m))))

    upd = qh.make_householder_update_from_products(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    C_hh, K_hh, S_hh = upd(HC, C, Rm)
    C_ref, K_ref, S_ref = sqrt.update_sqrt_from_products(HC, C, Rm)
    np.testing.assert_allclose(C_hh @ C_hh.T, C_ref @ C_ref.T, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(S_hh @ S_hh.T, S_ref @ S_ref.T, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(K_hh, K_ref, rtol=1e-8, atol=1e-9)

    prop = qh.make_householder_propagate(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    S1 = jnp.asarray(rng.standard_normal((D, D)))
    S2 = jnp.asarray(rng.standard_normal((D, D)))
    L = prop(S1, S2)
    ref = sqrt.propagate_cholesky_factor(S1, S2)
    np.testing.assert_allclose(L @ L.T, ref @ ref.T, rtol=1e-10, atol=1e-10)
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0


def test_white_solver_householder_init_and_step():
    """factorization=\"householder\" routes init AND step through the LQ;
    the solve matches the default pipeline at oracle precision (f64 CPU,
    interpret-mode kernels)."""
    import pnmol_tpu
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white as white_module

    heat = pnmol_tpu.pde.examples.heat_1d_discretized(dx=0.1, tmax=0.2)
    ref_solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=0.05)
    )
    sol_ref = ref_solver.solve(heat)

    hh_solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=0.05),
        factorization=qh.make_householder_lq_factorization(
            leaf=8, block=16, lane_quant=64, interpret=True
        ),
    )
    hh_solver._init_update = qh.make_householder_update_from_products(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    sol_hh = hh_solver.solve(heat)
    np.testing.assert_allclose(sol_hh.mean, sol_ref.mean, rtol=1e-8, atol=1e-10)
    cov_ref = sol_ref.cov_sqrtm[-1] @ sol_ref.cov_sqrtm[-1].T
    cov_hh = sol_hh.cov_sqrtm[-1] @ sol_hh.cov_sqrtm[-1].T
    np.testing.assert_allclose(cov_hh, cov_ref, rtol=1e-8, atol=1e-12)


def test_two_qr_routing_through_hook():
    """fused=False + a hook carrying .propagate/.update_from_products runs
    the two-QR pipeline through the Householder drop-ins (the memory-light
    split used at the largest single-chip N) and matches the fused result."""
    import pnmol_tpu
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white as white_module

    heat = pnmol_tpu.pde.examples.heat_1d_discretized(dx=0.1, tmax=0.2)
    solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=0.05)
    )
    state = solver.initialize(heat)
    mean, cov = state.y.mean, state.y.cov_sqrtm
    dt = jnp.asarray(0.05, mean.dtype)

    hook = qh.make_householder_lq_factorization(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    out_ref = white_module.white_attempt_step(
        solver._cache, mean, cov, dt, dt, num_derivatives=2, f=None, df=None,
        linear=True, fused=True,
    )
    out_two = white_module.white_attempt_step(
        solver._cache, mean, cov, dt, dt, num_derivatives=2, f=None, df=None,
        linear=True, fused=False, factorization=hook,
    )
    np.testing.assert_allclose(out_two[0], out_ref[0], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        out_two[1] @ out_two[1].T, out_ref[1] @ out_ref[1].T,
        rtol=1e-9, atol=1e-11,
    )


def test_latent_solver_householder_step():
    """The latent solvers accept the factorization hook (noise-free
    pre-array) and match the default pipeline at oracle precision."""
    import pnmol_tpu
    from pnmol_tpu.odetools import step as step_module

    heat = pnmol_tpu.pde.examples.heat_1d_discretized(dx=0.1, tmax=0.2)
    ref = pnmol_tpu.latent.LinearLatentForceEK1(
        steprule=step_module.Constant(dt=0.05)
    )
    final_ref, _ = ref.simulate_final_state(heat)

    hh = pnmol_tpu.latent.LinearLatentForceEK1(
        steprule=step_module.Constant(dt=0.05),
        factorization=qh.make_householder_lq_factorization(
            leaf=8, block=16, lane_quant=64, interpret=True
        ),
    )
    final_hh, _ = hh.simulate_final_state(heat)
    np.testing.assert_allclose(
        final_hh.y.mean, final_ref.y.mean, rtol=1e-8, atol=1e-10
    )
    cov_ref = final_ref.y.cov_sqrtm @ final_ref.y.cov_sqrtm.T
    cov_hh = final_hh.y.cov_sqrtm @ final_hh.y.cov_sqrtm.T
    np.testing.assert_allclose(cov_hh, cov_ref, rtol=1e-7, atol=1e-10)


def test_lq_factorization_hook_matches_fused_predict_update():
    rng = np.random.default_rng(5)
    D, m = 24, 9
    HACl = jnp.asarray(rng.standard_normal((m, D)))
    ACl = jnp.asarray(np.tril(rng.standard_normal((D, D))))
    HQl = jnp.asarray(rng.standard_normal((m, D)))
    Ql = jnp.asarray(np.tril(rng.standard_normal((D, D))))
    Rm = jnp.asarray(np.tril(rng.standard_normal((m, m))))

    fact = qh.make_householder_lq_factorization(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    C_hh, K_hh, S_hh = fact(HACl, ACl, HQl, Ql, Rm)
    C_ref, K_ref, S_ref = sqrt.fused_predict_update(HACl, ACl, HQl, Ql, Rm)

    np.testing.assert_allclose(C_hh @ C_hh.T, C_ref @ C_ref.T, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(S_hh @ S_hh.T, S_ref @ S_ref.T, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(K_hh, K_ref, rtol=1e-8, atol=1e-9)
    # L-form returns the posterior and innovation factors lower-triangular
    assert float(jnp.max(jnp.abs(jnp.triu(C_hh, 1)))) == 0.0
    assert float(jnp.max(jnp.abs(jnp.triu(S_hh, 1)))) == 0.0


@pytest.mark.parametrize("shape", [(17, 40), (64, 64), (70, 130)], ids=str)
def test_lq_block_panel_matches_leaf_panel(shape):
    """The fused block-panel kernel (one Pallas call per block: leaf column
    loops + intra-panel trailing updates + block-wide T^T) runs the exact
    same arithmetic as the leaf-kernel form — factors match to roundoff."""
    rng = np.random.default_rng(12)
    W = jnp.asarray(rng.standard_normal(shape))
    W = W.at[min(5, shape[0] - 1), :].set(0.0)  # degenerate row
    L_block = qh.blocked_lq_l(
        W, leaf=8, block=16, lane_quant=32, interpret=True, panel="block"
    )
    L_leaf = qh.blocked_lq_l(
        W, leaf=8, block=16, lane_quant=32, interpret=True, panel="leaf"
    )
    np.testing.assert_allclose(L_block, L_leaf, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        L_block @ L_block.T, W @ W.T, rtol=1e-10, atol=1e-10
    )
    assert float(jnp.max(jnp.abs(jnp.triu(jnp.asarray(L_block), 1)))) == 0.0


@pytest.mark.parametrize("panel", ["block", "leaf"])
@pytest.mark.parametrize("shape", [(16, 40), (64, 64), (72, 130)], ids=str)
def test_lq_paired_columns_matches_single(shape, panel):
    """``pair_columns=True`` (two reflectors per slab pass, one combined
    rank-2 update) is algebraically the same sweep: factors match the
    single-column kernels to roundoff and the Gram is exact."""
    rng = np.random.default_rng(21)
    W = jnp.asarray(rng.standard_normal(shape))
    W = W.at[min(3, shape[0] - 1), :].set(0.0)  # degenerate row in a pair
    L_single = qh.blocked_lq_l(
        W, leaf=8, block=16, lane_quant=32, interpret=True, panel=panel
    )
    L_pair = qh.blocked_lq_l(
        W, leaf=8, block=16, lane_quant=32, interpret=True, panel=panel,
        pair_columns=True,
    )
    np.testing.assert_allclose(L_pair, L_single, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(
        L_pair @ L_pair.T, W @ W.T, rtol=1e-10, atol=1e-10
    )
    assert float(jnp.max(jnp.abs(jnp.triu(jnp.asarray(L_pair), 1)))) == 0.0


def test_lq_paired_columns_rejects_odd_leaf():
    with pytest.raises(ValueError, match="even leaf"):
        qh.blocked_lq_l(
            jnp.zeros((10, 16)), leaf=5, block=10, lane_quant=16,
            interpret=True, panel="block", pair_columns=True,
        )


@pytest.mark.parametrize("superblocks", [1, 2])
def test_lq_block_panel_scan_form(superblocks):
    """Block-panel kernel under the scan-bodied sweep (runtime offsets)."""
    rng = np.random.default_rng(13)
    W = jnp.asarray(rng.standard_normal((48, 96)))
    L = qh.blocked_lq_l(
        W, leaf=8, block=16, lane_quant=32, superblocks=superblocks,
        interpret=True, panel="block",
    )
    np.testing.assert_allclose(L @ L.T, W @ W.T, rtol=1e-10, atol=1e-10)
    assert float(jnp.max(jnp.abs(jnp.triu(jnp.asarray(L), 1)))) == 0.0


@pytest.mark.parametrize("superblocks", [1, 2, 3])
def test_lq_scan_superblocks_match_unrolled(superblocks):
    """The scan-bodied sweep (superblocks < block count: lax.scan bodies,
    runtime diagonal offsets, full-matrix trailing updates, per-superblock
    harvest) factorizes identically (in Gram) to the unrolled sweep."""
    rng = np.random.default_rng(11)
    W = jnp.asarray(rng.standard_normal((70, 130)))
    W = W.at[5, :].set(0.0)  # degenerate row inside the first superblock
    L_scan = qh.blocked_lq_l(
        W, leaf=8, block=16, lane_quant=32, superblocks=superblocks,
        interpret=True,
    )
    L_unrolled = qh.blocked_lq_l(
        W, leaf=8, block=16, lane_quant=32, superblocks=99, interpret=True
    )
    np.testing.assert_allclose(
        L_scan @ L_scan.T, W @ W.T, rtol=1e-10, atol=1e-10
    )
    # identical algorithm, identical roundoff: factors match exactly-ish
    np.testing.assert_allclose(L_scan, L_unrolled, rtol=1e-12, atol=1e-12)
    assert float(jnp.max(jnp.abs(jnp.triu(jnp.asarray(L_scan), 1)))) == 0.0


def test_legacy_gain_hook_contract_matches_blocks_path():
    """A factorization hook WITHOUT a ``.blocks`` attribute takes the legacy
    explicit-gain fallback (K @ z); hooks with ``.blocks`` use the shared
    whitened residual (L21 @ (Sl^{-1} z)). Same math, same step results."""
    import pnmol_tpu
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white as white_module

    heat = pnmol_tpu.pde.examples.heat_1d_discretized(dx=0.1, tmax=0.2)
    solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=0.05)
    )
    state = solver.initialize(heat)
    mean, cov = state.y.mean, state.y.cov_sqrtm
    dt = jnp.asarray(0.05, mean.dtype)

    hook = qh.make_householder_lq_factorization(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    assert hasattr(hook, "blocks")

    def legacy_hook(*args):  # same factorization, no .blocks attribute
        return hook(*args)

    out_blocks = white_module.white_attempt_step(
        solver._cache, mean, cov, dt, dt, num_derivatives=2, f=None, df=None,
        linear=True, fused=True, factorization=hook,
    )
    out_legacy = white_module.white_attempt_step(
        solver._cache, mean, cov, dt, dt, num_derivatives=2, f=None, df=None,
        linear=True, fused=True, factorization=legacy_hook,
    )
    np.testing.assert_allclose(out_legacy[0], out_blocks[0], rtol=1e-9,
                               atol=1e-11)
    np.testing.assert_allclose(out_legacy[1], out_blocks[1], rtol=1e-9,
                               atol=1e-11)
    np.testing.assert_allclose(out_legacy[4], out_blocks[4], rtol=1e-10)


def test_latent_two_qr_routing_through_hook():
    """fused=False + a hook with .propagate/.update_from_products runs the
    latent step through the two-QR pipeline (the memory-light split: the
    latent fused pre-array is 2x the white one in both dims and hits the
    single-chip HBM wall first) and matches the fused result."""
    import pnmol_tpu
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import latent as latent_module

    heat = pnmol_tpu.pde.examples.heat_1d_discretized(dx=0.1, tmax=0.2)
    solver = pnmol_tpu.latent.LinearLatentForceEK1(
        steprule=step_module.Constant(dt=0.05)
    )
    state = solver.initialize(heat)
    mean, cov = state.y.mean, state.y.cov_sqrtm
    dt = jnp.asarray(0.05, mean.dtype)

    hook = qh.make_householder_lq_factorization(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    out_ref = latent_module.latent_attempt_step(
        solver._cache, mean, cov, dt, dt, num_derivatives=2, f=None, df=None,
        linear=True, fused=True,
    )
    out_two = latent_module.latent_attempt_step(
        solver._cache, mean, cov, dt, dt, num_derivatives=2, f=None, df=None,
        linear=True, fused=False, factorization=hook,
    )
    np.testing.assert_allclose(out_two[0], out_ref[0], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        out_two[1] @ out_two[1].T, out_ref[1] @ out_ref[1].T,
        rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(out_two[4], out_ref[4], rtol=1e-9)


# ---------------------------------------------------------------------------
# Banded sweeps (band= declared row support)
# ---------------------------------------------------------------------------


def _banded_random(rows, cols, b0, slope, rng):
    W = rng.standard_normal((rows, cols))
    col = np.arange(cols)[None, :]
    row = np.arange(rows)[:, None]
    W[col >= b0 + slope * row] = 0.0
    return jnp.asarray(W)


@pytest.mark.parametrize(
    "band,shape,superblocks",
    [
        ((9, 1), (48, 80), None),
        ((6, 2), (48, 112), None),
        ((6, 2), (48, 112), 3),
        ((17, 1), (40, 64), 99),
        ((33, 1), (48, 48), None),  # window clipped to full width
    ],
    ids=str,
)
def test_lq_banded_matches_dense(band, shape, superblocks):
    """band= performs the identical arithmetic on the touched columns: the
    windowed-out columns only ever receive exact-zero updates (results agree
    to reduction-order roundoff; slab widths differ)."""
    rng = np.random.default_rng(7)
    W = _banded_random(shape[0], shape[1], band[0], band[1], rng)
    kw = dict(
        leaf=8, block=16, lane_quant=32, interpret=True,
        superblocks=superblocks,
    )
    L_banded = qh.blocked_lq_l(W, band=band, **kw)
    L_dense = qh.blocked_lq_l(W, **kw)
    # identical up to reduction-order roundoff (slab widths differ)
    np.testing.assert_allclose(L_banded, L_dense, rtol=0, atol=1e-13)


def test_propagate_banded_and_interleaved_match_gram():
    """The structured propagate variants on realistic sqrt-Kalman blocks:
    Ql lower-triangular (point-major kron of Choleskys), ACl the
    point-block-diagonal transition applied to a triangular factor."""
    from pnmol_tpu.ops import iwp

    rng = np.random.default_rng(11)
    d, n = 11, 3
    D = d * n
    Cl = jnp.asarray(np.tril(rng.standard_normal((D, D))))
    A1d = jnp.asarray(rng.standard_normal((n, n)))
    ACl = iwp.apply_stack_matrix(A1d, Cl)
    Ql = jnp.asarray(np.tril(rng.standard_normal((D, D))))

    prop = qh.make_householder_propagate(
        leaf=8, block=16, lane_quant=32, interpret=True
    )
    ref = prop(ACl, Ql)
    got_banded = prop.banded(ACl, Ql)
    got_inter = prop.interleaved(ACl, Ql, n)

    # banded is the SAME pre-array, windowed: identical factor up to
    # reduction-order roundoff
    np.testing.assert_allclose(got_banded, ref, rtol=0, atol=1e-13)
    # interleaved permutes pre-array columns: same Gram, triangular factor
    gram = ACl @ ACl.T + Ql @ Ql.T
    np.testing.assert_allclose(
        got_inter @ got_inter.T, gram, rtol=1e-10, atol=1e-10
    )
    assert float(jnp.max(jnp.abs(jnp.triu(got_inter, 1)))) == 0.0


@pytest.mark.parametrize("mode", ["banded", "interleaved"])
def test_white_solve_propagate_band_matches_default(mode):
    """Full white solve through the two-QR pipeline with the structured
    propagate (banded / interleaved) == the default fused solve: same means,
    same covariance Grams, same calibrated diffusion. The interleaved mode
    also exercises initialize()'s factor re-triangularization."""
    import pnmol_tpu
    from pnmol_tpu.odetools import step as step_module

    heat = pnmol_tpu.pde.examples.heat_1d_discretized(dx=0.1, tmax=0.15)
    hook = qh.make_householder_lq_factorization(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    ref_solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=0.05)
    )
    band_solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=0.05),
        factorization=hook, fused=False, propagate_band=mode,
    )
    sol_ref = ref_solver.solve(heat)
    sol_band = band_solver.solve(heat)
    np.testing.assert_allclose(sol_band.mean, sol_ref.mean, rtol=1e-8,
                               atol=1e-10)
    grams_ref = jnp.einsum("kij,klj->kil", sol_ref.cov_sqrtm, sol_ref.cov_sqrtm)
    grams_band = jnp.einsum(
        "kij,klj->kil", sol_band.cov_sqrtm, sol_band.cov_sqrtm
    )
    np.testing.assert_allclose(grams_band, grams_ref, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(
        sol_band.diffusion_squared_calibrated,
        sol_ref.diffusion_squared_calibrated, rtol=1e-8,
    )


@pytest.mark.parametrize("mode", ["banded", "interleaved"])
def test_latent_solve_propagate_band_matches_default(mode):
    """Latent-force solve through the structured propagate == default fused
    solve (the stacked Ql = kron(blockdiag(chol_gram, E_sqrtm), LQ1d) is
    lower-triangular in the 2d-point point-major layout)."""
    import pnmol_tpu
    from pnmol_tpu.odetools import step as step_module

    heat = pnmol_tpu.pde.examples.heat_1d_discretized(dx=0.2, tmax=0.1)
    hook = qh.make_householder_lq_factorization(
        leaf=8, block=16, lane_quant=64, interpret=True
    )
    ref_solver = pnmol_tpu.latent.LinearLatentForceEK1(
        steprule=step_module.Constant(dt=0.05)
    )
    band_solver = pnmol_tpu.latent.LinearLatentForceEK1(
        steprule=step_module.Constant(dt=0.05),
        factorization=hook, fused=False, propagate_band=mode,
    )
    sol_ref = ref_solver.solve(heat)
    sol_band = band_solver.solve(heat)
    np.testing.assert_allclose(sol_band.mean, sol_ref.mean, rtol=1e-8,
                               atol=1e-10)
    grams_ref = jnp.einsum("kij,klj->kil", sol_ref.cov_sqrtm, sol_ref.cov_sqrtm)
    grams_band = jnp.einsum(
        "kij,klj->kil", sol_band.cov_sqrtm, sol_band.cov_sqrtm
    )
    np.testing.assert_allclose(grams_band, grams_ref, rtol=1e-7, atol=1e-10)


def test_update_blocks_banded_matches_dense():
    """blocks_banded == blocks whenever the measurement-noise factor is
    lower-triangular (the framework invariant it declares)."""
    rng = np.random.default_rng(3)
    m, D = 10, 24
    HC = jnp.asarray(rng.standard_normal((m, D)))
    C = jnp.asarray(rng.standard_normal((D, D)))  # no condition on C
    R = jnp.asarray(np.tril(rng.standard_normal((m, m))))
    upd = qh.make_householder_update_from_products(
        leaf=8, block=16, lane_quant=32, interpret=True
    )
    ref = upd.blocks(HC, C, R)
    got = upd.blocks_banded(HC, C, R)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)


def test_fused_blocks_banded_matches_dense():
    rng = np.random.default_rng(4)
    m, D = 9, 21
    HACl = jnp.asarray(rng.standard_normal((m, D)))
    ACl = jnp.asarray(rng.standard_normal((D, D)))
    HQl = jnp.asarray(rng.standard_normal((m, D)))
    Ql = jnp.asarray(rng.standard_normal((D, D)))
    E = jnp.asarray(np.tril(rng.standard_normal((m, m))))
    fact = qh.make_householder_lq_factorization(
        leaf=8, block=16, lane_quant=32, interpret=True
    )
    ref = fact.blocks(HACl, ACl, HQl, Ql, E)
    got = fact.blocks_banded(HACl, ACl, HQl, Ql, E)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-13)
