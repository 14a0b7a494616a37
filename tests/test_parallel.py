"""Multi-device layer: sharded linalg matches single-device; ensemble steps.

Runs on the 8 virtual CPU devices forced by conftest (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import pytest

from pnmol_tpu import diffops, discretize, kernels, mesh
from pnmol_tpu.parallel import ensembles, meshes, sharded_filter, sharded_linalg


@pytest.fixture(scope="module")
def device_mesh():
    return meshes.make_mesh(8)


@pytest.fixture(scope="module")
def grid():
    # 32 points tiles evenly over any space-axis size up to 8
    return mesh.RectangularMesh.from_bbox_1d([0.0, 1.0], num=32)


def test_make_mesh_shapes():
    m = meshes.make_mesh(8)
    assert set(m.axis_names) == {"batch", "space"}
    assert m.devices.size == 8

    m2 = meshes.make_mesh(8, batch=4)
    assert dict(zip(m2.axis_names, m2.devices.shape)) == {"batch": 4, "space": 2}

    with pytest.raises(ValueError):
        meshes.make_mesh(8, batch=3)


def test_sharded_gram_matches_local(device_mesh, grid):
    kernel = kernels.SquareExponential(input_scale=2.0)
    local = kernel(grid.points, grid.points.T)
    sharded = sharded_linalg.sharded_gram(kernel, grid.points, device_mesh)
    assert sharded.shape == local.shape
    assert jnp.allclose(jnp.asarray(sharded), local)
    # actually distributed: more than one shard
    assert len(sharded.addressable_shards) > 1


def test_sharded_collocation_matches_local(device_mesh, grid):
    # A well-conditioned Gram (healthy nugget) so D is numerically defined;
    # with a 1e-12 nugget the SE Gram has condition ~1e17 and D's entries are
    # dominated by rounding on ANY execution layout.
    kwargs = dict(
        kernel=kernels.SquareExponential(input_scale=2.0),
        nugget_gram_matrix=1e-8,
        nugget_cholesky_E=1e-10,
        symmetrize_cholesky_E=True,
    )
    D_local, E_local = discretize.collocation_global(
        diffops.laplace(), grid, **kwargs
    )
    D_shard, E_shard = sharded_linalg.sharded_collocation_global(
        diffops.laplace(), grid, device_mesh, **kwargs
    )
    assert jnp.allclose(jnp.asarray(D_shard), D_local, atol=1e-5)
    # action on a smooth function is the physically meaningful comparison
    f = jnp.sin(3.0 * grid.points[:, 0])
    assert jnp.allclose(jnp.asarray(D_shard) @ f, D_local @ f, atol=1e-7)
    assert jnp.allclose(
        jnp.asarray(E_shard) @ jnp.asarray(E_shard).T,
        E_local @ E_local.T,
        atol=1e-8,
    )


def test_tsqr_matches_dense_qr(device_mesh):
    """Distributed TSQR R factor has the same Gram as the dense QR's R."""
    import numpy as np

    rows, cols = 256, 32  # 256/4 = 64 >= 32 local rows per 'space' shard
    mat = jnp.asarray(np.random.default_rng(0).normal(size=(rows, cols)))
    R_dist = sharded_linalg.tsqr_r(mat, device_mesh)
    R_dense = jnp.linalg.qr(mat, mode="r")
    assert R_dist.shape == (cols, cols)
    assert jnp.allclose(R_dist.T @ R_dist, R_dense.T @ R_dense, atol=1e-9)


def test_tsqr_rejects_short_blocks(device_mesh):
    mat = jnp.ones((16, 32))
    with pytest.raises(ValueError):
        sharded_linalg.tsqr_r(mat, device_mesh)


def test_sharded_triangular_solve_matches_dense(device_mesh):
    """Column-sharded triangular solve == the dense solve (incl. padding)."""
    import numpy as np

    rng = np.random.default_rng(3)
    m, K = 24, 50  # K not divisible by the 4-wide space axis -> pads
    R = jnp.asarray(np.triu(rng.normal(size=(m, m)) + 3 * np.eye(m)))
    B = jnp.asarray(rng.normal(size=(m, K)))
    X = sharded_linalg.sharded_triangular_solve(R, B, device_mesh)
    X_dense = jax.scipy.linalg.solve_triangular(R, B, lower=False)
    assert jnp.allclose(X, X_dense, atol=1e-10)


def test_blocked_qr_matches_dense_qr(device_mesh):
    """Distributed panel QR (CholeskyQR2 + BGS) has the dense R's Gram, even
    for squarish matrices where TSQR degenerates."""
    import numpy as np

    rows, cols = 200, 96  # squarish; rows not divisible by the axis (pads)
    mat = jnp.asarray(np.random.default_rng(1).normal(size=(rows, cols)))
    R_dist = sharded_linalg.blocked_qr_r(mat, device_mesh, panel_size=32)
    R_dense = jnp.linalg.qr(mat, mode="r")
    assert R_dist.shape == (cols, cols)
    # upper-triangular
    assert jnp.allclose(R_dist, jnp.triu(R_dist), atol=1e-12)
    assert jnp.allclose(R_dist.T @ R_dist, R_dense.T @ R_dense, atol=1e-8)


def test_blocked_qr_uneven_panels(device_mesh):
    import numpy as np

    mat = jnp.asarray(np.random.default_rng(2).normal(size=(160, 50)))
    R_dist = sharded_linalg.blocked_qr_r(mat, device_mesh, panel_size=16)
    R_dense = jnp.linalg.qr(mat, mode="r")
    assert jnp.allclose(R_dist.T @ R_dist, R_dense.T @ R_dense, atol=1e-8)


def test_space_sharded_step_distributed_qr_matches_unsharded(device_mesh):
    """The step with the hand-distributed blocked pre-array QR reproduces the
    single-device step exactly (mean) / in Gram (covariance)."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white

    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=1.0)
    solver = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)
    expected = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
    )

    cache_sharded = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True
    )
    sharded_step = sharded_filter.make_space_sharded_white_step(
        cache=cache_sharded, num_derivatives=2, mesh=device_mesh, linear=True,
        distributed_qr=True, panel_size=16,
    )
    with device_mesh:
        got = sharded_step(
            state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
        )
    assert jnp.allclose(got[0], expected[0], atol=1e-9)
    assert jnp.allclose(
        got[1] @ got[1].T, expected[1] @ expected[1].T, atol=1e-8
    )
    # diffusion calibration and error estimate survive the swap
    assert jnp.allclose(got[4], expected[4], rtol=1e-8)
    assert jnp.allclose(got[2], expected[2], rtol=1e-6, atol=1e-12)
    assert len(got[1].addressable_shards) > 1


def test_space_sharded_step_distributed_qr_2d(device_mesh):
    """The BASELINE.md scale family (2-D diffusion) through the distributed
    blocked QR: shard-exact vs the single-device step."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white

    heat = examples.heat_2d_discretized(num_points=(8, 8), tmax=1.0)
    solver = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(0.01),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)
    expected = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.01), jnp.asarray(0.01)
    )
    cache_sharded = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True
    )
    sharded_step = sharded_filter.make_space_sharded_white_step(
        cache=cache_sharded, num_derivatives=2, mesh=device_mesh, linear=True,
        distributed_qr=True, panel_size=32,
    )
    with device_mesh:
        got = sharded_step(
            state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.01), jnp.asarray(0.01)
        )
    assert jnp.allclose(got[0], expected[0], atol=1e-9)
    assert jnp.allclose(
        got[1] @ got[1].T, expected[1] @ expected[1].T, atol=1e-8
    )


def test_space_sharded_white_step_matches_unsharded(device_mesh):
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white

    # 16 points * 3 derivs = 48 rows, divisible by the space axis (<=4)
    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=1.0)
    solver = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)
    expected = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
    )

    cache_sharded = sharded_filter.shard_cache(solver._cache, device_mesh)
    sharded_step = sharded_filter.make_space_sharded_white_step(
        cache=cache_sharded, num_derivatives=2, mesh=device_mesh, linear=True
    )
    with device_mesh:
        got = sharded_step(
            state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
        )
    assert jnp.allclose(got[0], expected[0], atol=1e-10)
    assert jnp.allclose(
        got[1] @ got[1].T, expected[1] @ expected[1].T, atol=1e-9
    )
    assert len(got[1].addressable_shards) > 1  # actually sharded output


def test_solver_level_factorization_hook():
    """The white solvers accept a pre-array factorization at construction.

    Gram-based factorizations carry an eps*cond^2 posterior-factor error
    that compounds over steps (docs/SCALE.md); measured drift here is
    ~4e-6 after 5 f64 steps, so the trajectory tolerance reflects that —
    single-step exactness is pinned by the sharded-step tests."""
    import functools

    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white

    heat = examples.heat_1d_discretized(dx=0.125, tmax=0.5)
    trivial = meshes.make_mesh(1, batch=1)
    fact = functools.partial(
        sharded_filter.pre_array_blocked_qr, mesh=trivial, panel_size=16
    )
    base = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(0.1),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    ).solve(heat)
    alt = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(0.1),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        factorization=fact,
    ).solve(heat)
    assert jnp.allclose(alt.mean, base.mean, atol=1e-4)
    assert jnp.allclose(
        alt.diffusion_squared_calibrated,
        base.diffusion_squared_calibrated,
        rtol=1e-4,
    )


def test_dt_sweep_matches_sequential_final_states(device_mesh):
    """The padded vmapped dt sweep reproduces each sequential constant-step
    simulate_final_state (the figure-3 sweep shape, one scan for all dts)."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.parallel import ensembles
    from pnmol_tpu.solvers import white

    heat = examples.heat_1d_discretized(dx=0.125, tmax=1.0)
    dts = [0.5, 0.2, 0.09]
    solver = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dts[0]),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)

    means, covs, diffusion = ensembles.dt_sweep_final_states(
        cache=solver._cache, num_derivatives=2, f=None, df=None, linear=True,
        mean0=state.y.mean, cov0=state.y.cov_sqrtm,
        t0=heat.t0, tmax=heat.tmax, dts=dts, mesh=device_mesh,
    )
    for i, dt in enumerate(dts):
        seq = white.LinearWhiteNoiseEK1(
            steprule=step_module.Constant(dt),
            spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        )
        final, _ = seq.simulate_final_state(heat)
        assert jnp.allclose(means[i], final.y.mean, atol=1e-10), f"dt={dt}"
        assert jnp.allclose(diffusion[i], final.diffusion_squared_local, rtol=1e-9)
        assert jnp.allclose(
            covs[i] @ covs[i].T,
            final.y.cov_sqrtm @ final.y.cov_sqrtm.T,
            atol=1e-9,
        )


def test_ensemble_step_matches_sequential(device_mesh):
    """Vmapped+sharded ensemble step == per-member sequential steps."""
    from pnmol_tpu import pde as pde_module
    from pnmol_tpu import white as _  # noqa: F401  (alias check)
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white

    heat = examples.heat_1d_discretized(dx=0.25, tmax=1.0)
    scales = [0.8, 1.0, 1.2, 1.4]
    caches, means, covs, singles = [], [], [], []
    for s in scales:
        solver = white.LinearWhiteNoiseEK1(
            steprule=step_module.Constant(0.05),
            spatial_kernel=kernels.Matern52(input_scale=s) + kernels.WhiteNoise(),
        )
        state = solver.initialize(heat)
        caches.append(solver._cache)
        means.append(state.y.mean)
        covs.append(state.y.cov_sqrtm)
        singles.append(
            solver._step_fn(
                state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
            )
        )

    cache_b = ensembles.stack_caches(caches)
    batched_step = ensembles.make_ensemble_step_fn(
        num_derivatives=2,
        f=None,
        df=None,
        linear=True,
        mesh=device_mesh,
    )
    with device_mesh:
        out = batched_step(
            cache_b,
            jnp.stack(means),
            jnp.stack(covs),
            jnp.asarray(0.05),
            jnp.asarray(0.05),
        )
    for i, single in enumerate(singles):
        assert jnp.allclose(out[0][i], single[0], atol=1e-10)
        assert jnp.allclose(
            out[1][i] @ out[1][i].T, single[1] @ single[1].T, atol=1e-9
        )
        assert jnp.allclose(out[4][i], single[4], atol=1e-10)


def test_blocked_cholesky_matches_dense(device_mesh):
    """Distributed right-looking panel Cholesky == jnp.linalg.cholesky,
    with the factor row-sharded (nothing O(d^2) replicated)."""
    import numpy as np

    rng = np.random.default_rng(7)
    for d, panel in [(40, 8), (64, 16), (96, 8)]:  # incl. pad + multi-panel
        A = rng.normal(size=(d, d))
        G = jnp.asarray(A @ A.T + d * np.eye(d))
        L = sharded_linalg.blocked_cholesky(G, device_mesh, panel_size=panel)
        L_dense = jnp.linalg.cholesky(G)
        assert L.shape == (d, d)
        assert jnp.allclose(L, L_dense, atol=1e-9), (d, panel)
        assert jnp.allclose(jnp.triu(jnp.asarray(L), 1), 0.0)


def test_blocked_tri_solve_matches_dense(device_mesh):
    """Distributed forward/backward substitution and cho_solve == dense."""
    import numpy as np

    rng = np.random.default_rng(8)
    d, K = 48, 20
    A = rng.normal(size=(d, d))
    G = jnp.asarray(A @ A.T + d * np.eye(d))
    L = jnp.linalg.cholesky(G)
    B = jnp.asarray(rng.normal(size=(d, K)))

    X_f = sharded_linalg.blocked_tri_solve_lower(L, B, device_mesh, panel_size=8)
    assert jnp.allclose(X_f, jax.scipy.linalg.solve_triangular(L, B, lower=True), atol=1e-9)

    X_b = sharded_linalg.blocked_tri_solve_lower(
        L, B, device_mesh, panel_size=8, transpose=True
    )
    assert jnp.allclose(
        X_b, jax.scipy.linalg.solve_triangular(L, B, lower=True, trans=1),
        atol=1e-9,
    )

    X_c = sharded_linalg.blocked_cho_solve(L, B, device_mesh, panel_size=8)
    assert jnp.allclose(
        X_c, jax.scipy.linalg.cho_solve((L, True), B), atol=1e-8
    )


def test_sharded_init_matches_single_device(device_mesh):
    """Distributed initialization (sharded Gram + distributed Cholesky +
    distributed init QR) == single-device initialize: mean to roundoff,
    covariance factor in Gram — and its outputs drive the distributed-QR
    step to the same result as the single-device step (VERDICT round-2
    gap #1: no replicated (d,d)/(D,D) initialization work)."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.parallel import sharded_init
    from pnmol_tpu.solvers import white

    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=1.0)
    spatial = kernels.Matern52() + kernels.WhiteNoise()
    solver = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(0.05), spatial_kernel=spatial
    )
    state = solver.initialize(heat)

    mean_s, C0_s, chol_gram_s = sharded_init.sharded_white_initialize(
        heat, device_mesh, num_derivatives=2, spatial_kernel=spatial,
        diffuse_scale=solver.diffuse_prior_scale, panel_size=8,
    )
    assert jnp.allclose(mean_s, state.y.mean, rtol=1e-8, atol=1e-10)
    assert jnp.allclose(
        jnp.asarray(C0_s) @ jnp.asarray(C0_s).T,
        state.y.cov_sqrtm @ state.y.cov_sqrtm.T,
        atol=1e-8,
    )
    # genuinely distributed outputs with O(D^2 / P) bytes per device: each
    # shard holds a 1/(space-axis) slice of the factor
    assert len(C0_s.addressable_shards) > 1
    assert len(chol_gram_s.addressable_shards) > 1
    space = device_mesh.shape["space"]
    D = C0_s.shape[0]
    assert C0_s.addressable_shards[0].data.shape == (D, D // space)
    d_pts = chol_gram_s.shape[0]
    assert chol_gram_s.addressable_shards[0].data.shape == (
        d_pts // space, d_pts,
    )

    # the sharded cache + state drive the distributed-QR step to the
    # single-device step's result
    cache_s = sharded_init.sharded_white_cache(
        heat, chol_gram_s, device_mesh, num_derivatives=2
    )
    step = sharded_filter.make_space_sharded_white_step(
        cache=cache_s, num_derivatives=2, mesh=device_mesh, linear=True,
        distributed_qr=True, panel_size=16,
    )
    expected = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
    )
    with device_mesh:
        got = step(mean_s, C0_s, jnp.asarray(0.05), jnp.asarray(0.05))
    assert jnp.allclose(got[0], expected[0], atol=1e-8)
    assert jnp.allclose(
        got[1] @ got[1].T, expected[1] @ expected[1].T, atol=1e-7
    )


def test_space_sharded_latent_step_matches_unsharded(device_mesh):
    """The latent-force step (noise-free pre-array, stacked 2d-point state)
    through the distributed blocked QR: shard-exact vs single-device
    (VERDICT round-2 gap #3: no sharded latent step existed)."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import latent

    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=1.0)
    solver = latent.LinearLatentForceEK1(steprule=step_module.Constant(0.05))
    state = solver.initialize(heat)
    expected = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
    )

    cache_sharded = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True
    )
    sharded_step = sharded_filter.make_space_sharded_latent_step(
        cache=cache_sharded, num_derivatives=2, mesh=device_mesh, linear=True,
        distributed_qr=True, panel_size=16,
    )
    with device_mesh:
        got = sharded_step(
            state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
        )
    assert jnp.allclose(got[0], expected[0], atol=1e-8)
    assert jnp.allclose(
        got[1] @ got[1].T, expected[1] @ expected[1].T, atol=1e-7
    )
    assert jnp.allclose(got[4], expected[4], rtol=1e-7)
    assert len(got[1].addressable_shards) > 1


@pytest.mark.parametrize("latent_mode", [False, True], ids=["white", "latent"])
def test_space_sharded_constant_solve_matches_final_state(device_mesh, latent_mode):
    """End-to-end multi-step sharded solve (scan + diffusion calibration +
    final-state covariance rescale) == single-device simulate_final_state
    (VERDICT round-2 gap #3: only single-step sharded tests existed)."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import latent, white

    dt, tmax = 0.05, 0.25  # exactly 5 steps
    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=tmax)
    cls = latent.LinearLatentForceEK1 if latent_mode else white.LinearWhiteNoiseEK1
    solver = cls(steprule=step_module.Constant(dt))
    final, info = solver.simulate_final_state(heat)
    assert info["num_steps"] == 5

    state0 = solver.initialize(heat)
    cache_sharded = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True
    )
    solve = sharded_filter.make_space_sharded_constant_solve(
        cache=cache_sharded, num_derivatives=2, mesh=device_mesh,
        dt=dt, num_steps=5, linear=True, latent=latent_mode,
        distributed_qr=True, panel_size=16,
    )
    with device_mesh:
        mean, cov, diff_sq = solve(
            state0.y.mean, state0.y.cov_sqrtm, jnp.asarray(heat.t0)
        )
    # the noise-free latent pre-array is worse-conditioned, so the Gram-based
    # distributed QR's eps*cond drift compounds faster over the trajectory
    # (docs/SCALE.md "Factorization shootout"; single-step exactness is pinned
    # by the step tests above)
    atol_mean = 1e-7 if latent_mode else 1e-8
    assert jnp.allclose(mean, final.y.mean, atol=atol_mean)
    assert jnp.allclose(
        cov @ cov.T, final.y.cov_sqrtm @ final.y.cov_sqrtm.T,
        atol=1e-6 if latent_mode else 1e-7,
    )
    assert jnp.allclose(
        diff_sq, final.diffusion_squared_local,
        rtol=1e-5 if latent_mode else 1e-6,
    )
    assert len(cov.addressable_shards) > 1


def test_sharded_collocation_larger_grid(device_mesh):
    """Collocation at an N giving every space shard multiple Cholesky panels
    (VERDICT round-2 weak #4: the old test's N=32 exercised one panel per
    device), with the E factor produced by the distributed Cholesky."""
    big = mesh.RectangularMesh.from_bbox_1d([0.0, 1.0], num=96)
    kwargs = dict(
        kernel=kernels.SquareExponential(input_scale=2.0),
        nugget_gram_matrix=1e-8,
        nugget_cholesky_E=1e-10,
        symmetrize_cholesky_E=True,
    )
    D_local, E_local = discretize.collocation_global(
        diffops.laplace(), big, **kwargs
    )
    D_shard, E_shard = sharded_linalg.sharded_collocation_global(
        diffops.laplace(), big, device_mesh, **kwargs
    )
    f = jnp.sin(3.0 * big.points[:, 0])
    assert jnp.allclose(jnp.asarray(D_shard) @ f, D_local @ f, atol=1e-6)
    assert jnp.allclose(
        jnp.asarray(E_shard) @ jnp.asarray(E_shard).T,
        E_local @ E_local.T,
        atol=1e-8,
    )
    assert len(E_shard.addressable_shards) > 1


def test_sharded_latent_init_matches_single_device(device_mesh):
    """Distributed latent-force initialization == single-device initialize
    (mean to roundoff, covariance factor in Gram), and its outputs drive
    the sharded latent step to the single-device step's result — the
    latent counterpart of test_sharded_init_matches_single_device (the
    stacked pre-array is 2x the white one in both dims, so it hits the
    single-chip walls first)."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.parallel import sharded_init
    from pnmol_tpu.solvers import latent

    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=1.0)
    spatial = kernels.Matern52() + kernels.WhiteNoise()
    solver = latent.LinearLatentForceEK1(
        steprule=step_module.Constant(0.05), spatial_kernel=spatial
    )
    state = solver.initialize(heat)

    mean_s, C0_s, chol_gram_s = sharded_init.sharded_latent_initialize(
        heat, device_mesh, num_derivatives=2, spatial_kernel=spatial,
        diffuse_scale=solver.diffuse_prior_scale, panel_size=8,
    )
    assert mean_s.shape == state.y.mean.shape
    assert jnp.allclose(mean_s, state.y.mean, rtol=1e-8, atol=1e-10)
    assert jnp.allclose(
        jnp.asarray(C0_s) @ jnp.asarray(C0_s).T,
        state.y.cov_sqrtm @ state.y.cov_sqrtm.T,
        atol=1e-8,
    )
    # genuinely distributed: the (2D, 2D) factor is column-sharded
    assert len(C0_s.addressable_shards) > 1
    space = device_mesh.shape["space"]
    D2 = C0_s.shape[0]
    assert C0_s.addressable_shards[0].data.shape == (D2, D2 // space)

    # the sharded cache + state drive the distributed-QR latent step to
    # the single-device step's result
    cache_s = sharded_init.sharded_latent_cache(
        heat, chol_gram_s, device_mesh, num_derivatives=2
    )
    step = sharded_filter.make_space_sharded_latent_step(
        cache=cache_s, num_derivatives=2, mesh=device_mesh, linear=True,
        distributed_qr=True, panel_size=16,
    )
    expected = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
    )
    with device_mesh:
        got = step(mean_s, C0_s, jnp.asarray(0.05), jnp.asarray(0.05))
    assert jnp.allclose(got[0], expected[0], atol=1e-8)
    assert jnp.allclose(
        got[1] @ got[1].T, expected[1] @ expected[1].T, atol=1e-7
    )


@pytest.mark.parametrize("latent_mode", [False, True], ids=["white", "latent"])
def test_space_sharded_adaptive_solve_matches_final_state(device_mesh,
                                                          latent_mode):
    """End-to-end ADAPTIVE sharded solve (one while_loop, shared
    adaptive_attempt controller) == single-device simulate_final_state:
    identical accept/reject trajectory (t, step counts), mean to
    roundoff, covariance in Gram, calibrated diffusion."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import latent, white

    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=0.3)
    rule = step_module.Adaptive(abstol=1e-4, reltol=1e-2)
    solver_cls = latent.LinearLatentForceEK1 if latent_mode else (
        white.LinearWhiteNoiseEK1
    )
    solver = solver_cls(steprule=rule)
    state = solver.initialize(heat)
    final, info = solver.simulate_final_state(heat)

    cache_sharded = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True
    )
    solve = sharded_filter.make_space_sharded_adaptive_solve(
        cache=cache_sharded, num_derivatives=2, mesh=device_mesh,
        steprule=rule, t0=heat.t0, tmax=heat.tmax, linear=True,
        latent=latent_mode, distributed_qr=True, panel_size=16,
    )
    dt0 = jnp.asarray(rule.first_dt(heat))
    with device_mesh:
        t, mean, cov, diff_sq, n_steps, n_attempts = solve(
            state.y.mean, state.y.cov_sqrtm, dt0
        )

    # trajectory-level decisions are EXACT (same compiled controller on
    # replicated scalars); state values accumulate the Gram-based
    # distributed panels' eps*cond error over the trajectory (measured
    # ~5e-6 abs on a ~0.1-magnitude mean after 5 steps in f64 — the
    # documented blocked_qr_r accuracy characteristic, docs/SCALE.md)
    assert int(n_steps) == info["num_steps"]
    assert int(n_attempts) == info["num_attempted_steps"]
    assert jnp.allclose(t, final.t, atol=1e-12)
    assert jnp.allclose(mean, final.y.mean, rtol=1e-3, atol=2e-5)
    assert jnp.allclose(
        cov @ cov.T,
        final.y.cov_sqrtm @ final.y.cov_sqrtm.T,
        rtol=1e-3, atol=1e-5,
    )
    assert jnp.allclose(diff_sq, final.diffusion_squared_local, rtol=1e-4)
    assert len(cov.addressable_shards) > 1


def test_space_sharded_semilinear_step_matches_unsharded(device_mesh):
    """SEMILINEAR sharded white step (nonlinear f/df linearized inside the
    GSPMD-jitted step) == single-device step — the sharded tier's solver
    tests were linear-only before this."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white

    # dirichlet spruce-budworm at 16 points: 48 state rows tile the mesh
    spruce = examples.spruce_budworm_1d_discretized(
        bbox=[0.0, 1.0], dx=1.0 / 15, tmax=1.0
    )
    solver = white.SemiLinearWhiteNoiseEK1(
        steprule=step_module.Constant(0.01),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(spruce)
    expected = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.01), jnp.asarray(0.01)
    )

    cache_sharded = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True
    )
    sharded_step = sharded_filter.make_space_sharded_white_step(
        cache=cache_sharded, num_derivatives=2, mesh=device_mesh,
        f=spruce.f, df=spruce.df, linear=False, distributed_qr=True,
        panel_size=16,
    )
    with device_mesh:
        got = sharded_step(
            state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.01), jnp.asarray(0.01)
        )
    assert jnp.allclose(got[0], expected[0], atol=1e-8)
    assert jnp.allclose(
        got[1] @ got[1].T, expected[1] @ expected[1].T, atol=1e-7
    )
    assert jnp.allclose(got[4], expected[4], rtol=1e-6)
    assert len(got[1].addressable_shards) > 1


@pytest.mark.parametrize("latent_mode", [False, True], ids=["white", "latent"])
def test_space_sharded_steady_state_matches_single_device(device_mesh,
                                                          latent_mode):
    """Sharded Riccati convergence + sharded mean-only steady solve ==
    the single-device steady-state mode (at the N=1e5 config even the
    frozen (D, m) gain is ~80 GB, so the steady tier must shard too)."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import latent, white

    dt, tmax = 0.05, 0.25  # exactly 5 steps
    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=tmax)
    cls = latent.LinearLatentForceEK1 if latent_mode else white.LinearWhiteNoiseEK1
    solver = cls(steprule=step_module.Constant(dt), steady_state=True)
    state0 = solver.initialize(heat)
    reference = solver.steady_cache

    cache_sharded = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True
    )
    with device_mesh:
        steady = sharded_filter.converge_space_sharded_steady_state(
            cache=cache_sharded, cov0=state0.y.cov_sqrtm, dt=dt,
            num_derivatives=2, mesh=device_mesh, latent=latent_mode,
            panel_size=16,
            # recursion-only: this test pins the sharded PIPELINE's
            # exactness against the single-device recursion from the same
            # start; the seeded path (different polish trajectory, agrees
            # only to the stopping tol) is pinned separately by
            # test_sharded_steady_seed_polishes_in_few_iterations
            seed=False,
        )
    # same fixed point as the single-device recursion (factor Gram; the
    # factor itself is unique only up to right-rotations)
    assert jnp.allclose(
        jnp.asarray(steady.cov_inf) @ jnp.asarray(steady.cov_inf).T,
        reference.cov_inf @ reference.cov_inf.T,
        atol=1e-7,
    )
    assert jnp.allclose(
        jnp.asarray(steady.Sl) @ jnp.asarray(steady.Sl).T,
        reference.Sl @ reference.Sl.T,
        atol=1e-7,
    )

    steady_sharded = sharded_filter.shard_steady_cache(steady, device_mesh)
    assert len(steady_sharded.L21.addressable_shards) > 1
    solve = sharded_filter.make_space_sharded_steady_solve(
        cache=cache_sharded, steady=steady_sharded, num_derivatives=2,
        mesh=device_mesh, dt=dt, num_steps=5, latent=latent_mode,
    )
    with device_mesh:
        mean, diff_sq = solve(state0.y.mean, jnp.asarray(heat.t0))

    # single-device mean-only recursion from the same frozen blocks
    make = (
        latent.make_steady_state_latent_step
        if latent_mode
        else white.make_steady_state_white_step
    )
    step_local = make(cache=solver._cache, steady=reference,
                      num_derivatives=2)
    m_ref = state0.y.mean
    diff_sum = 0.0
    for i in range(5):
        m_ref, _, _, _, dsq = step_local(
            m_ref, reference.cov_inf, heat.t0 + (i + 1) * dt,
            jnp.asarray(dt)
        )
        diff_sum += float(dsq)
    assert jnp.allclose(mean, m_ref, atol=1e-7)
    assert jnp.allclose(diff_sq, diff_sum / 5, rtol=1e-5)


def test_sharded_steady_convergence_chunked_and_promoted(device_mesh):
    """The sharded Riccati driver's large-D options: chunked executions
    (remote relays kill >5 min device calls) must land on the same fixed
    point as one uninterrupted run, and dtype="float64" must run the
    recursion in f64 on an f32 problem and hand back f32 blocks (the same
    requirement as the single-chip driver — at D ~ 1e4 the f32 QR noise
    floors the stationarity delta; docs/SCALE.md)."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white

    dt = 0.05
    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=0.25)
    # seed from the TRANSIENT (plain init, not the already-converged steady
    # init) so the chunked driver actually crosses several chunk seams
    solver = white.LinearWhiteNoiseEK1(steprule=step_module.Constant(dt))
    state0 = solver.initialize(heat)

    cache_sharded = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True
    )
    # The distributed factorization's shifted-CholQR panels perturb the
    # factor at eps*cond per iteration, so the stationarity delta limit-
    # cycles ~1.7e-5 here — tol must sit above that floor (the single-chip
    # Householder recursion reaches 1e-8; this is the distributed engine's
    # documented accuracy trade, docs/SCALE.md "Factorization shootout").
    tol = 1e-4
    with device_mesh:
        one = sharded_filter.converge_space_sharded_steady_state(
            cache=cache_sharded, cov0=state0.y.cov_sqrtm, dt=dt,
            num_derivatives=2, mesh=device_mesh, panel_size=16, tol=tol,
        )
        chunked = sharded_filter.converge_space_sharded_steady_state(
            cache=cache_sharded, cov0=state0.y.cov_sqrtm, dt=dt,
            num_derivatives=2, mesh=device_mesh, panel_size=16, tol=tol,
            chunk_iters=3,
        )
    assert float(chunked.delta) < tol
    assert int(chunked.iterations) < 200
    # both stop somewhere inside the same tol-sized neighborhood of the
    # fixed point: Grams agree to tol * diag scale
    assert jnp.allclose(
        jnp.asarray(chunked.cov_inf) @ jnp.asarray(chunked.cov_inf).T,
        jnp.asarray(one.cov_inf) @ jnp.asarray(one.cov_inf).T,
        rtol=1e-3, atol=2e-5,
    )

    # f64-promoted recursion on an f32 problem: f32 outputs, f64-certified
    cache32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        cache_sharded,
    )
    with device_mesh:
        promoted = sharded_filter.converge_space_sharded_steady_state(
            cache=cache32, cov0=state0.y.cov_sqrtm.astype(jnp.float32),
            dt=dt, num_derivatives=2, mesh=device_mesh, panel_size=16,
            dtype="float64", tol=tol, chunk_iters=5,
        )
    assert promoted.cov_inf.dtype == jnp.float32
    assert promoted.Sl_inv.dtype == jnp.float32
    assert float(promoted.delta) < tol
    # all runs stop inside the same tol-neighborhood of the fixed point
    # (measured: ~5e-6 abs / ~2e-3 rel at tol=1e-4 on this problem), plus
    # the f32 cast of the frozen blocks
    assert jnp.allclose(
        jnp.asarray(promoted.cov_inf) @ jnp.asarray(promoted.cov_inf).T,
        (jnp.asarray(one.cov_inf) @ jnp.asarray(one.cov_inf).T
         ).astype(jnp.float32),
        rtol=5e-3, atol=2e-5,
    )


def test_blocked_qr_r_sharded_matches_replicated(device_mesh):
    """Sharded-output panel QR: same Gram as the replicated-R variant, R
    upper-triangular, rows actually sharded (nothing O(cols^2) replicated —
    the N=1e5 init wall, bench_artifacts/memory_analysis_n110592.json)."""
    import numpy as np

    rng = np.random.default_rng(7)
    for rows, cols, ps in ((200, 96, 32), (160, 50, 16), (64, 200, 16)):
        mat = jnp.asarray(rng.normal(size=(rows, cols)))
        R_repl = sharded_linalg.blocked_qr_r(mat, device_mesh, panel_size=ps)
        for loop in ("unrolled", "scan"):
            R_shrd = sharded_linalg.blocked_qr_r_sharded(
                mat, device_mesh, panel_size=ps, loop=loop
            )
            assert R_shrd.shape == (cols, cols)
            assert jnp.allclose(R_shrd, jnp.triu(R_shrd), atol=1e-12)
            assert jnp.allclose(
                R_shrd.T @ R_shrd, R_repl.T @ R_repl, atol=1e-8
            )


def test_space_sharded_step_two_qr_matches_unsharded(device_mesh):
    """The TWO-QR distributed split (sequential sharded-output propagate +
    update factorizations — the memory-bounded N=1e5 configuration)
    reproduces the single-device step: means exactly, covariance in Gram."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white

    heat = examples.heat_1d_discretized(dx=1.0 / 15, tmax=1.0)
    solver = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(0.05),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)
    expected = solver._step_fn(
        state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05), jnp.asarray(0.05)
    )

    cache_sharded = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True, shard_operands=True
    )
    sharded_step = sharded_filter.make_space_sharded_white_step(
        cache=cache_sharded, num_derivatives=2, mesh=device_mesh, linear=True,
        distributed_qr=True, panel_size=16, two_qr=True,
    )
    with device_mesh:
        got = sharded_step(
            state.y.mean, state.y.cov_sqrtm, jnp.asarray(0.05),
            jnp.asarray(0.05)
        )
    assert jnp.allclose(got[0], expected[0], atol=1e-9)
    # posterior Gram to the distributed tier's documented eps*cond level:
    # the update pre-array carries the exactly-updated (near-zero) boundary
    # directions, whose conditioning amplifies the CholeskyQR3 panels'
    # roundoff (same order as the sharded adaptive tests' ~5e-6 after 5
    # steps; the tier is f64-designed — docs/SCALE.md)
    assert jnp.allclose(
        got[1] @ got[1].T, expected[1] @ expected[1].T, atol=1e-5
    )
    assert jnp.allclose(got[4], expected[4], rtol=1e-6)
    assert jnp.allclose(got[2], expected[2], rtol=1e-4, atol=1e-12)
    assert len(got[1].addressable_shards) > 1


def test_steady_dt_sweep_matches_sequential(device_mesh):
    """The frozen-gain dt sweep reproduces each sequential steady-state
    simulate_final_state: same per-lane stationary factors -> identical
    mean recursion (the calibration-grid-near-free configuration,
    VERDICT r3 next-#9)."""
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.parallel import ensembles
    from pnmol_tpu.solvers import white

    heat = examples.heat_1d_discretized(dx=0.125, tmax=1.0)
    dts = [0.5, 0.2, 0.09]
    seq_solvers, finals, steadies = [], [], []
    for dt in dts:
        seq = white.LinearWhiteNoiseEK1(
            steprule=step_module.Constant(dt),
            spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
            steady_state=True,
        )
        final, _ = seq.simulate_final_state(heat)
        seq_solvers.append(seq)
        finals.append(final)
        steadies.append(seq.steady_cache)

    solver = seq_solvers[0]
    state = solver.initialize(heat)
    steady_b = ensembles.stack_caches(steadies)
    means, covs, diffusion = ensembles.steady_dt_sweep_final_states(
        cache=solver._cache, num_derivatives=2,
        mean0=state.y.mean, t0=heat.t0, tmax=heat.tmax, dts=dts,
        steady_caches=steady_b, mesh=device_mesh,
    )
    for i, dt in enumerate(dts):
        final = finals[i]
        assert jnp.allclose(means[i], final.y.mean, atol=1e-10), f"dt={dt}"
        assert jnp.allclose(
            diffusion[i], final.diffusion_squared_local, rtol=1e-9
        )
        # stationary-mode covariance semantics: frozen fixed point x
        # the lane's calibration
        expected_cov = steadies[i].cov_inf * jnp.sqrt(diffusion[i])
        assert jnp.allclose(
            covs[i] @ covs[i].T, expected_cov @ expected_cov.T, atol=1e-9
        )


def test_ring_matmul_matches_dense(device_mesh):
    """Ring matmul (row-sharded A, column-sharded X/out, ppermute rounds):
    exact vs the dense product, including non-P-divisible shapes. This is
    the kernel that replaces GSPMD's (d, d) all-gather of the row-sharded
    operator in the memory-bounded step (docs/SCALE.md round 4)."""
    import numpy as np

    rng = np.random.default_rng(3)
    for ra, k, cx in ((64, 48, 80), (50, 33, 71), (8, 8, 8), (3, 17, 5)):
        A = jnp.asarray(rng.normal(size=(ra, k)))
        X = jnp.asarray(rng.normal(size=(k, cx)))
        out = sharded_linalg.ring_matmul(A, X, device_mesh)
        assert out.shape == (ra, cx)
        assert jnp.allclose(out, A @ X, atol=1e-12), (ra, k, cx)


def test_gram_rowsharded_and_whiten_pipeline(device_mesh):
    """Row-sharded Gram -> distributed blocked Cholesky -> blocked solve:
    the memory-bounded innovation-whitening path (no full (m, m) S on any
    device). Pad block must be exact identity so the padded Gram is SPD."""
    import numpy as np
    import scipy.linalg as sla

    rng = np.random.default_rng(4)
    for m, k in ((48, 96), (50, 65)):
        X = jnp.asarray(rng.normal(size=(m, k)))
        S = sharded_linalg.gram_rowsharded(X, device_mesh)
        m_pad = S.shape[0]
        Sd = np.asarray(S)
        assert np.allclose(Sd[:m, :m], np.asarray(X @ X.T), atol=1e-12)
        if m_pad > m:
            assert np.allclose(Sd[m:, m:], np.eye(m_pad - m), atol=0)
            assert np.allclose(Sd[:m, m:], 0.0)
        L = sharded_linalg.blocked_cholesky(S, device_mesh)
        z = jnp.asarray(rng.normal(size=(m_pad, 1)))
        w = sharded_linalg.blocked_cho_solve(L, z, device_mesh)
        w_ref = sla.cho_solve(
            (np.linalg.cholesky(Sd), True), np.asarray(z)
        )
        assert np.allclose(np.asarray(w), w_ref, atol=1e-9)


def test_chol_pad_geometry_bounded_in_devices():
    """The pad geometry must not inflate with the device count: rounding
    ceil(d/P) up to an oversize panel made d_pad = P*panel grow linearly
    in P (the round-4 N=1e5 memory analysis's 235 -> 366 GB anti-scaling
    signal). With the clamp, d_pad stays within 2x of d for every P."""
    from unittest import mock

    from pnmol_tpu.parallel import sharded_linalg

    d = 123944
    for P in (8, 32, 64, 256):
        mesh = mock.Mock()
        mesh.shape = {"space": P}
        b, r_loc, d_pad = sharded_linalg._chol_pad_geometry(
            d, mesh, "space", 16384
        )
        assert b <= -(-d // P)
        assert d_pad < 2 * d, (P, d_pad)


def test_sda_sharded_matches_dense_doubling(device_mesh):
    """parallel/sharded_dare.sda_sharded (round 5: distributed doubling via
    the SPD Woodbury solve + blocked Cholesky) must reproduce the dense
    SDA fixed point (ops/dare.sda) at oracle precision."""
    import numpy as np

    from pnmol_tpu.ops import dare
    from pnmol_tpu.parallel import sharded_dare

    rng = np.random.default_rng(3)
    D = 24
    M = rng.normal(size=(D, D))
    A = jnp.asarray(0.9 * M / np.max(np.abs(np.linalg.eigvals(M))))
    Gh = rng.normal(size=(D, D))
    G = jnp.asarray(Gh @ Gh.T / D + 0.1 * np.eye(D))
    Qh = rng.normal(size=(D, D))
    Q = jnp.asarray(Qh @ Qh.T / D + 0.1 * np.eye(D))

    dense = dare.sda(A, G, Q, tol=1e-13)
    sharded = sharded_dare.sda_sharded(A, G, Q, device_mesh, tol=1e-13,
                                       panel_size=4)
    np.testing.assert_allclose(
        np.asarray(sharded.sigma), np.asarray(dense.sigma),
        rtol=1e-9, atol=1e-11,
    )
    assert float(dare.dare_residual(sharded.sigma, A, G, Q)) < 1e-10
    assert int(sharded.iterations) <= int(dense.iterations) + 2


def test_sharded_steady_seed_polishes_in_few_iterations(device_mesh):
    """The seeded sharded convergence must polish in a handful of
    iterations (the recursion-only path needed O(1/dt) — VERDICT r4 #6),
    and still match the single-device steady cache."""
    import numpy as np

    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module

    heat = pnmol_tpu.pde.examples.heat_1d_discretized(dx=1 / 23, tmax=1.0)
    solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=0.01),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        steady_state=True,
    )
    state0 = solver.initialize(heat)
    cache_sh = sharded_filter.shard_cache(
        solver._cache, device_mesh, distributed_qr=True
    )
    diagnostics = {}
    steady = sharded_filter.converge_space_sharded_steady_state(
        cache=cache_sh, cov0=jax.device_put(
            state0.y.cov_sqrtm,
            jax.sharding.NamedSharding(
                device_mesh, jax.sharding.PartitionSpec(None, "space")
            ),
        ),
        dt=0.01, num_derivatives=solver.num_derivatives, mesh=device_mesh,
        panel_size=8, diagnostics=diagnostics,
    )
    # seeded: a few polish iterations, not O(1/dt)
    assert int(steady.iterations) <= 10, int(steady.iterations)
    # certificate present and small (the heat system's conditioning ~1e5
    # refracts through the sigma = C C^T residual form; the block
    # comparisons below are the exactness check)
    assert diagnostics["dare_residual"] < 1e-5
    # frozen blocks match the single-device steady cache (gain via Gram)
    # both sides polish to the same stopping tol from DIFFERENT seed
    # trajectories; agreement is tol refracted through cond(Sl) (~1e-3
    # relative on the largest whitener entries), not roundoff-exact
    ref = solver.steady_cache
    np.testing.assert_allclose(
        np.asarray(steady.L21 @ steady.Sl_inv),
        np.asarray(ref.L21 @ ref.Sl_inv),
        rtol=5e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(steady.cov_inf @ steady.cov_inf.T),
        np.asarray(ref.cov_inf @ ref.cov_inf.T),
        rtol=5e-3, atol=1e-4,
    )
