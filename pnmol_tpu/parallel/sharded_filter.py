"""Space-sharded single-instance filter steps (the large-N scaling path).

The collocation-point dimension is this workload's sequence-length analog
(SURVEY.md §5): at N = 1e4-1e5 points the (D, D) covariance factor no longer
fits (or computes) on one chip. Two tiers:

* XLA-managed (``distributed_qr=False``): sharding constraints pin the
  row layout and GSPMD inserts the collectives for the QR/matmul chain —
  correct on any mesh, but XLA gathers the pre-array for one local QR.
* Hand-distributed (``distributed_qr=True``): the covariance factor is
  *column*-sharded so the sqrt-Kalman pre-array (built from the factor
  transposes) is row-sharded with no resharding, and the factorization runs
  as the distributed blocked panel QR of
  :func:`pnmol_tpu.parallel.sharded_linalg.blocked_qr_r` — local MXU
  matmuls + one (panel, trailing) ``psum`` per panel step over ICI. The
  (m+D) x (m+D) R factor is replicated (it carries the gain and posterior
  blocks every device needs).
"""

import functools

import jax
import jax.numpy as jnp
import jax.scipy.linalg

from jax.sharding import NamedSharding, PartitionSpec

from pnmol_tpu.parallel import sharded_linalg
from pnmol_tpu.solvers import white as white_module


def pre_array_blocked_qr(HACl, ACl, HQl, Ql, R_noise, *, mesh, axis="space",
                         panel_size=None):
    """Distributed fused predict+update: same contract as
    ``pnmol_tpu.ops.sqrt.fused_predict_update``, with the pre-array QR
    replaced by the blocked panel factorization over the device mesh."""
    m, D = HACl.shape
    top = jnp.concatenate((HACl.T, ACl.T), axis=1)  # (D, m + D)
    mid = jnp.concatenate((HQl.T, Ql.T), axis=1)  # (D, m + D)
    bottom = jnp.concatenate(
        (R_noise.T, jnp.zeros((m, D), dtype=R_noise.dtype)), axis=1
    )
    pre = jnp.concatenate((top, mid, bottom), axis=0)  # (2D + m, m + D)
    R = sharded_linalg.blocked_qr_r(pre, mesh=mesh, axis=axis,
                                    panel_size=panel_size)
    R1 = R[:m, :m]
    R2 = R[:m, m:]
    R3 = R[m:, m:]
    # gain solve: small replicated triangular factor against a state-dim-wide
    # rhs — columns solve independently on their shards, no communication
    gain = sharded_linalg.sharded_triangular_solve(
        R1, R2, mesh=mesh, axis=axis, lower=False
    ).T
    return R3.T, gain, R1.T


def make_distributed_factorization(*, mesh, axis="space", panel_size=None,
                                   qr_loop="unrolled",
                                   memory_bounded=False):
    """Distributed pre-array factorization hook with a ``.blocks`` variant.

    ``.blocks`` returns the raw factor blocks ``(posterior, L21, L1)``
    without the gain solve — the step kernels compute the mean update as
    ``L21 @ (L1^{-1} z)`` from the calibration's whitened residual, so the
    sharded matrix triangular solve (one per step in the legacy contract)
    disappears entirely from the distributed hot loop.

    ``qr_loop`` selects the panel-sweep body of the two-QR split's
    sharded-output factorizations (``"scan"`` bounds live temps at two
    generations of the local block — the N=1e5 memory-bounded setting;
    see :func:`sharded_linalg.blocked_qr_r_sharded`).

    ``memory_bounded=True`` additionally attaches the two hooks that keep
    the step's MEASUREMENT side O(D^2/P) per device (both observed as the
    dominant per-device buffers in the compiled N=1e5 step HLO —
    docs/SCALE.md round 4):

    * ``operator_matmul`` — the ring matmul for ``L @ X0`` / ``B @ X0``
      (GSPMD all-gathers the row-sharded operator otherwise, ~49 GB);
    * ``innovation_whiten`` — row-sharded Gram + distributed blocked
      Cholesky + blocked solve for the error estimate (``cholesky`` is
      not GSPMD-partitionable, so the dense path replicates the (m, m)
      innovation covariance, ~61 GB).

    Requires the cache placed with ``shard_cache(..., shard_operands=
    True)``; off by default because at small/medium N the extra
    collectives cost more than the replication they avoid.
    """

    def blocks(HACl, ACl, HQl, Ql, R_noise):
        m, D = HACl.shape
        top = jnp.concatenate((HACl.T, ACl.T), axis=1)
        mid = jnp.concatenate((HQl.T, Ql.T), axis=1)
        bottom = jnp.concatenate(
            (R_noise.T, jnp.zeros((m, D), dtype=R_noise.dtype)), axis=1
        )
        pre = jnp.concatenate((top, mid, bottom), axis=0)
        R = sharded_linalg.blocked_qr_r(pre, mesh=mesh, axis=axis,
                                        panel_size=panel_size)
        # R is replicated: the blocks are exactly the transposed slices
        return R[m:, m:].T, R[:m, m:].T, R[:m, :m].T

    def factorization(HACl, ACl, HQl, Ql, R_noise):
        return pre_array_blocked_qr(HACl, ACl, HQl, Ql, R_noise, mesh=mesh,
                                    axis=axis, panel_size=panel_size)

    # --- two-QR split (fused=False in the step kernels) -----------------
    # The fused pre-array is ((2D+m) x (m+D)): at the N=1e5 3-D config its
    # per-device temps alone are ~1 TB (bench_artifacts/
    # memory_analysis_n110592.json "distributed_qr_step"). The split runs
    # the propagate LQ of the (D, 2D) pre-array and the update LQ of the
    # ((m+D) x (m+D)) one SEQUENTIALLY, each through the sharded-output
    # panel QR, so nothing wider than (D, 2D) is ever live and no O(cols^2)
    # factor is ever replicated.
    def propagate(ACl, Ql):
        stacked = jnp.concatenate((ACl.T, Ql.T), axis=0)  # (2D, D)
        R = sharded_linalg.blocked_qr_r_sharded(
            stacked, mesh, axis=axis, panel_size=panel_size, loop=qr_loop
        )
        return R.T  # (D, D) lower-triangular, column-sharded

    def update_blocks(HClp, Clp, R_noise):
        m = HClp.shape[0]
        D = Clp.shape[0]
        top = jnp.concatenate(
            (R_noise.T, jnp.zeros((m, D), dtype=R_noise.dtype)), axis=1
        )
        bottom = jnp.concatenate((HClp.T, Clp.T), axis=1)
        stacked = jnp.concatenate((top, bottom), axis=0)  # (m+D, m+D)
        R = sharded_linalg.blocked_qr_r_sharded(
            stacked, mesh, axis=axis, panel_size=panel_size, loop=qr_loop
        )
        return R[m:, m:].T, R[:m, m:].T, R[:m, :m].T

    def update_from_products(HClp, Clp, R_noise):
        Cl_new, L21, Sl = update_blocks(HClp, Clp, R_noise)
        # legacy contract: explicit gain K = L21 Sl^{-1} (via S_xz = K S)
        K = jax.scipy.linalg.solve_triangular(
            Sl.T, L21.T, lower=False
        ).T
        return Cl_new, K, Sl

    update_from_products.blocks = update_blocks
    factorization.blocks = blocks
    factorization.propagate = propagate
    factorization.update_from_products = update_from_products

    if memory_bounded:
        def operator_matmul(Op, X):
            return sharded_linalg.ring_matmul(Op, X, mesh, axis=axis)

        def innovation_whiten(HQl, E_noise, z):
            m = z.shape[0]
            # diag(S) without S: row sums of squares (shard-local + psum)
            diag_S = jnp.sum(HQl * HQl, axis=1) + jnp.sum(
                E_noise * E_noise, axis=1
            )
            # S row-sharded from the column-sharded stacked factor
            E_col = jax.lax.with_sharding_constraint(
                E_noise, NamedSharding(mesh, PartitionSpec(None, axis))
            )
            F = jnp.concatenate((HQl, E_col), axis=1)
            S = sharded_linalg.gram_rowsharded(F, mesh, axis=axis)
            m_pad = S.shape[0]
            Lc = sharded_linalg.blocked_cholesky(
                S, mesh, axis=axis, panel_size=panel_size
            )
            zp = jnp.pad(z, (0, m_pad - m)) if m_pad > m else z
            w = sharded_linalg.blocked_cho_solve(
                Lc, zp[:, None], mesh, axis=axis, panel_size=panel_size
            )[:m, 0]
            return diag_S, w

        factorization.operator_matmul = operator_matmul
        factorization.innovation_whiten = innovation_whiten

    return factorization


def make_space_sharded_white_step(*, cache, num_derivatives, mesh, f=None,
                                  df=None, linear=True, distributed_qr=False,
                                  panel_size=None, two_qr=False,
                                  qr_loop="unrolled"):
    """White-noise EK1 step sharded over the mesh's 'space' axis.

    Returns a jitted ``step(mean, cov, t_next, dt)``. With
    ``distributed_qr=True`` the covariance factor is column-sharded and the
    pre-array factorization itself is distributed (see module docstring);
    otherwise rows are sharded and GSPMD manages the QR. The cache should be
    placed with :func:`shard_cache` (matching ``distributed_qr``) for
    zero-copy execution.

    ``two_qr=True`` (with ``distributed_qr``) splits predict and update into
    two sequential sharded-output panel factorizations instead of one fused
    pre-array — the memory-bounded configuration for the N=1e5 3-D config
    (the fused pre-array's per-device temps are ~1 TB there; see
    make_distributed_factorization). Place the cache with
    ``shard_cache(..., shard_operands=True)`` at that scale; two_qr also
    attaches the memory-bounded measurement hooks (ring matmul +
    row-sharded innovation whitening — see make_distributed_factorization).
    """
    replicated = NamedSharding(mesh, PartitionSpec())
    if distributed_qr:
        factorization = make_distributed_factorization(
            mesh=mesh, panel_size=panel_size, qr_loop=qr_loop,
            memory_bounded=two_qr,
        )
        cov_sharding = NamedSharding(mesh, PartitionSpec(None, "space"))
    else:
        factorization = None
        cov_sharding = NamedSharding(mesh, PartitionSpec("space", None))

    @jax.jit
    def step(cache_arg, mean, cov, t_next, dt):
        # cache enters as a call-time argument, never a closure: multi-host
        # (process-spanning) arrays cannot be closed over, and traced
        # arguments also avoid XLA constant-folding the cache products.
        mean = jax.lax.with_sharding_constraint(mean, replicated)
        cov = jax.lax.with_sharding_constraint(cov, cov_sharding)
        new_mean, new_cov, err, ref, diff = white_module.white_attempt_step(
            cache_arg, mean, cov, t_next, dt,
            num_derivatives=num_derivatives, f=f, df=df, linear=linear,
            fused=not two_qr, factorization=factorization,
        )
        new_cov = jax.lax.with_sharding_constraint(new_cov, cov_sharding)
        # the mean is (n, d)-small and part of the step's replicated contract
        # (hosts fetch it directly in multi-process runs)
        new_mean = jax.lax.with_sharding_constraint(new_mean, replicated)
        return new_mean, new_cov, err, ref, diff

    return functools.partial(step, cache)


def make_space_sharded_latent_step(*, cache, num_derivatives, mesh, f=None,
                                   df=None, linear=True, distributed_qr=True,
                                   panel_size=None):
    """Latent-force EK1 step sharded over the mesh's 'space' axis.

    The latent pre-array is the white one at twice the point count with a
    zero measurement-noise block (reference semantics
    ``/root/reference/src/pnmol/latent.py:155-225``), so it is the shape
    family that needs sharding FIRST; the distributed blocked panel QR's
    rank-deficiency jitter handles the exactly-singular noise-free block.
    Same contract as :func:`make_space_sharded_white_step`; the state is
    the stacked ``(n, 2d)`` mean and ``(2D, 2D)`` covariance factor.
    """
    from pnmol_tpu.solvers import latent as latent_module

    replicated = NamedSharding(mesh, PartitionSpec())
    if distributed_qr:
        factorization = make_distributed_factorization(
            mesh=mesh, panel_size=panel_size
        )
        cov_sharding = NamedSharding(mesh, PartitionSpec(None, "space"))
    else:
        factorization = None
        cov_sharding = NamedSharding(mesh, PartitionSpec("space", None))

    @jax.jit
    def step(cache_arg, mean, cov, t_next, dt):
        mean = jax.lax.with_sharding_constraint(mean, replicated)
        cov = jax.lax.with_sharding_constraint(cov, cov_sharding)
        out = latent_module.latent_attempt_step(
            cache_arg, mean, cov, t_next, dt,
            num_derivatives=num_derivatives, f=f, df=df, linear=linear,
            fused=True, factorization=factorization,
        )
        new_mean, new_cov, err, ref, diff = out
        new_cov = jax.lax.with_sharding_constraint(new_cov, cov_sharding)
        new_mean = jax.lax.with_sharding_constraint(new_mean, replicated)
        return new_mean, new_cov, err, ref, diff

    return functools.partial(step, cache)


def make_space_sharded_constant_solve(*, cache, num_derivatives, mesh,
                                      dt, num_steps, f=None, df=None,
                                      linear=True, latent=False,
                                      distributed_qr=True, panel_size=None,
                                      two_qr=False, qr_loop="unrolled"):
    """End-to-end space-sharded constant-step solve (multi-step scan).

    The full ``simulate_final_state`` semantics of the constant-scan driver
    (``pnmol_tpu.solvers.pdefilter._final_state_constant_scan``) under the
    sharded step: ``num_steps`` accepted steps via ``lax.scan``, the global
    diffusion calibrated as the mean of per-step quasi-MLE locals, and the
    final covariance factor rescaled by ``sqrt(diffusion^2)`` — shard-exact
    vs the single-device driver (tests/test_parallel.py). Returns a jitted
    ``solve(mean0, cov0, t0) -> (mean, cov, diffusion_sq)``.

    ``two_qr=True`` (white only) runs every step through the memory-bounded
    split + measurement hooks (see :func:`make_space_sharded_white_step`);
    place the cache with ``shard_cache(..., shard_operands=True)``.
    """
    from pnmol_tpu.solvers import latent as latent_module
    from pnmol_tpu.solvers import white as white_module_

    if two_qr and latent:
        raise ValueError("two_qr is a white-solver configuration")
    replicated = NamedSharding(mesh, PartitionSpec())
    if distributed_qr:
        factorization = make_distributed_factorization(
            mesh=mesh, panel_size=panel_size, qr_loop=qr_loop,
            memory_bounded=two_qr,
        )
        cov_sharding = NamedSharding(mesh, PartitionSpec(None, "space"))
    else:
        factorization = None
        cov_sharding = NamedSharding(mesh, PartitionSpec("space", None))

    attempt = (
        latent_module.latent_attempt_step
        if latent
        else white_module_.white_attempt_step
    )

    @jax.jit
    def solve(cache_arg, mean0, cov0, t0):
        mean0 = jax.lax.with_sharding_constraint(mean0, replicated)
        cov0 = jax.lax.with_sharding_constraint(cov0, cov_sharding)
        dt_arr = jnp.asarray(dt, mean0.dtype)

        def body(carry, i):
            mean, cov, diff_sum = carry
            t_next = t0 + (i + 1) * dt_arr
            mean, cov, _, _, diff_sq = attempt(
                cache_arg, mean, cov, t_next, dt_arr,
                num_derivatives=num_derivatives, f=f, df=df, linear=linear,
                fused=not two_qr, factorization=factorization,
            )
            cov = jax.lax.with_sharding_constraint(cov, cov_sharding)
            mean = jax.lax.with_sharding_constraint(mean, replicated)
            return (mean, cov, diff_sum + diff_sq), None

        (mean, cov, diff_sum), _ = jax.lax.scan(
            body,
            (mean0, cov0, jnp.zeros((), mean0.dtype)),
            jnp.arange(num_steps),
        )
        diffusion_sq = diff_sum / num_steps
        cov = cov * jnp.sqrt(diffusion_sq)
        cov = jax.lax.with_sharding_constraint(cov, cov_sharding)
        return mean, cov, diffusion_sq

    return functools.partial(solve, cache)


def make_space_sharded_adaptive_solve(*, cache, num_derivatives, mesh,
                                      steprule, t0, tmax, f=None, df=None,
                                      linear=True, latent=False,
                                      distributed_qr=True, panel_size=None):
    """End-to-end space-sharded ADAPTIVE solve (one ``lax.while_loop``).

    The ``simulate_final_state`` semantics of the adaptive while-loop driver
    (``pnmol_tpu.solvers.pdefilter._final_state_adaptive_whileloop``) under
    the sharded step: every attempt runs through the SAME compiled
    :func:`pnmol_tpu.solvers.pdefilter.adaptive_attempt` controller unit as
    the single-device drivers (identical accept/reject/clamp decisions —
    the error estimate and controller math are replicated scalars), with
    the covariance carried in the distributed-QR layout across attempts.
    Returns a jitted ``solve(mean0, cov0, dt0) -> (t, mean, cov,
    diffusion_sq, n_steps, n_attempts)`` with the final covariance factor
    already rescaled by ``sqrt(diffusion_sq)``.
    """
    from pnmol_tpu.solvers import latent as latent_module
    from pnmol_tpu.solvers import pdefilter as pdefilter_module
    from pnmol_tpu.solvers import white as white_module_

    replicated = NamedSharding(mesh, PartitionSpec())
    if distributed_qr:
        factorization = make_distributed_factorization(
            mesh=mesh, panel_size=panel_size
        )
        cov_sharding = NamedSharding(mesh, PartitionSpec(None, "space"))
    else:
        factorization = None
        cov_sharding = NamedSharding(mesh, PartitionSpec("space", None))

    attempt = (
        latent_module.latent_attempt_step
        if latent
        else white_module_.white_attempt_step
    )
    rate = num_derivatives + 1
    tmax_f = float(tmax)
    # same residual-step epsilon guard as the single-device drivers: a
    # ~1e-16 closing step's dt^-(nu+1/2) preconditioner costs ~5 digits
    t_eps = 1e-12 * max(1.0, abs(tmax_f))

    @jax.jit
    def solve(cache_arg, mean0, cov0, dt0):
        mean0 = jax.lax.with_sharding_constraint(mean0, replicated)
        cov0 = jax.lax.with_sharding_constraint(cov0, cov_sharding)
        dtype = mean0.dtype

        def step_fn(mean, cov, t_next, dt):
            m, c, err, ref, diff = attempt(
                cache_arg, mean, cov, t_next, dt,
                num_derivatives=num_derivatives, f=f, df=df, linear=linear,
                fused=True, factorization=factorization,
            )
            m = jax.lax.with_sharding_constraint(m, replicated)
            c = jax.lax.with_sharding_constraint(c, cov_sharding)
            return m, c, err, ref, diff

        def cond(carry):
            # isfinite(dt): a NaN attempt is permanently rejected and t stops
            # advancing — without this escape the compiled multi-chip loop
            # would spin forever. A diverged solve exits early; callers
            # detect it by the returned t < tmax (this function is fully
            # jitted, so it cannot raise host-side).
            return (
                jnp.asarray(tmax_f, carry[0].dtype) - carry[0] > t_eps
            ) & jnp.isfinite(carry[3])

        def body(carry):
            t, mean, cov, dt, diff_sum, n_steps, n_attempts = carry
            (t_new, mean_new, cov_new, dt_new, accepted, _, _, diff_sq,
             _) = pdefilter_module.adaptive_attempt(
                step_fn, steprule, rate, t, mean, cov, dt,
                jnp.asarray(tmax_f, dt.dtype),
            )
            cov_new = jax.lax.with_sharding_constraint(cov_new, cov_sharding)
            diff_new = diff_sum + jnp.where(accepted, diff_sq, 0.0)
            return (
                t_new, mean_new, cov_new, dt_new, diff_new,
                n_steps + accepted.astype(jnp.int32),
                n_attempts + jnp.ones((), jnp.int32),
            )

        carry0 = (
            jnp.asarray(t0, dtype),
            mean0,
            cov0,
            jnp.asarray(dt0, dtype),
            jnp.zeros((), dtype),
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        )
        t, mean, cov, dt, diff_sum, n_steps, n_attempts = jax.lax.while_loop(
            cond, body, carry0
        )
        diffusion_sq = diff_sum / jnp.maximum(n_steps, 1)
        cov = jax.lax.with_sharding_constraint(
            cov * jnp.sqrt(diffusion_sq), cov_sharding
        )
        return t, mean, cov, diffusion_sq, n_steps, n_attempts

    return functools.partial(solve, cache)


def converge_space_sharded_steady_state(*, cache, cov0, dt, num_derivatives,
                                        mesh, latent=False, panel_size=None,
                                        tol=None, max_iters=200,
                                        meascov_dt_scaled=False,
                                        dtype=None, chunk_iters=None,
                                        seed=None, diagnostics=None):
    """Riccati fixed point of the sharded step (linear + constant dt).

    The steady-state mode's convergence loop with the pre-array QR replaced
    by the distributed blocked panel factorization — the covariance carry
    stays column-sharded across iterations. This is what makes steady-state
    reachable BEYOND one chip: at the N=1e5 3-D config even the frozen
    stationary gain ``L21`` (D, m) is ~80 GB, so both the convergence and
    the frozen blocks must live sharded. Returns the same
    ``SteadyStateCache`` the single-device mode uses (arrays sharded).

    ``dtype="float64"`` runs the recursion in f64 on an f32 problem and
    casts the frozen blocks back — the same large-D requirement as the
    single-chip driver (:func:`pnmol_tpu.solvers.white.run_steady_convergence`:
    at D ~ 1e4 the f32 QR noise floors the stationarity delta at ~7e-3 and
    the frozen gain destabilizes the closed loop's slow modes). Unlike the
    single-chip promote, the DISTRIBUTED factorization stays in the loop:
    its shifted-CholeskyQR3 panels are f64-designed (docs/SCALE.md
    "Factorization shootout"). ``chunk_iters`` bounds one device execution
    (remote relays kill executions past ~5 minutes); convergence is checked
    host-side between chunks.

    ``seed`` (default: True for the white solver, off for latent): replace
    the initial factor with the DISTRIBUTED doubling (SDA) solution of the
    DARE (:func:`pnmol_tpu.parallel.sharded_dare.sharded_steady_seed`) so
    the recursion below only polishes — the sharded tier previously
    converged by recursion alone, which is O(1/dt) distributed QRs and
    burned the iteration cap at fine dx (VERDICT round 4 item 6). Seed
    diagnostics merge into ``diagnostics`` if a dict is passed.
    """
    import contextlib

    from pnmol_tpu.solvers import latent as latent_module
    from pnmol_tpu.solvers import white as white_module_

    factorization = make_distributed_factorization(
        mesh=mesh, panel_size=panel_size
    )
    cov_sharding = NamedSharding(mesh, PartitionSpec(None, "space"))
    converge = (
        latent_module.converge_latent_steady_state
        if latent
        else white_module_.converge_white_steady_state
    )
    kwargs = {} if latent else {"meascov_dt_scaled": meascov_dt_scaled}

    out_dtype = cov0.dtype
    promote = dtype is not None and jnp.dtype(dtype) != out_dtype
    x64_scope = (
        jax.enable_x64(True) if promote else contextlib.nullcontext()
    )
    with x64_scope:
        if promote:
            ric_dtype = jnp.dtype(dtype)
            cache = jax.tree.map(
                lambda x: x.astype(ric_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                cache,
            )
            cov0 = cov0.astype(ric_dtype)
        if seed is None:
            seed = not latent
        if seed and not latent:
            from pnmol_tpu.parallel import sharded_dare

            cov0, seed_info = sharded_dare.sharded_steady_seed(
                cache, dt, mesh, num_derivatives=num_derivatives,
                meascov_dt_scaled=meascov_dt_scaled,
                panel_size=panel_size,
            )
            # seed factor is row-sharded; the recursion carries the
            # column-sharded layout the distributed QR consumes
            cov0 = jax.device_put(cov0, cov_sharding)
            if diagnostics is not None:
                diagnostics.update(seed_info)
        if max_iters < 1:
            raise ValueError(f"max_iters must be >= 1, got {max_iters}")
        if tol is None:
            tol = 1e-8 if cov0.dtype == jnp.float64 else 1e-5
        chunk = min(chunk_iters or max_iters, max_iters)
        donate = () if jax.default_backend() == "cpu" else (1,)
        if donate and not promote:
            # donate_argnums=(1,) consumes C0 on the first run() call; the
            # caller owns cov0, so donation must only ever eat loop-internal
            # carries. (The promote path's astype already made a copy.)
            cov0 = jnp.copy(cov0)
        row = NamedSharding(mesh, PartitionSpec("space", None))
        space = mesh.shape["space"]

        def place_steady(sc):
            # The frozen blocks must leave the jit SHARDED: unconstrained,
            # GSPMD replicates them — 72.8 GB/device of outputs at the
            # N=1e5 config (the (D, m) gain alone is ~109 GB total), the
            # round-5 memory analysis's steady-leg wall. Same plan as
            # shard_steady_cache.
            def rowish(v):
                if v.ndim == 2 and v.shape[0] % space == 0:
                    return jax.lax.with_sharding_constraint(v, row)
                return v

            return sc._replace(
                cov_inf=jax.lax.with_sharding_constraint(
                    sc.cov_inf, cov_sharding
                ),
                L21=rowish(sc.L21),
                Sl_inv=rowish(sc.Sl_inv),
            )

        @functools.partial(jax.jit, donate_argnums=donate)
        def run(cache_arg, C0, dt_arr):
            C0 = jax.lax.with_sharding_constraint(C0, cov_sharding)
            return place_steady(converge(
                cache_arg, C0, dt_arr,
                num_derivatives=num_derivatives, fused=True,
                factorization=factorization, tol=tol, max_iters=chunk,
                **kwargs,
            ))

        dt_arr = jnp.asarray(dt, cov0.dtype)
        total_iters, delta, C_cur, num_chunks = 0, float("inf"), cov0, 0
        while total_iters < max_iters and (num_chunks == 0 or delta >= tol):
            sc = run(cache, C_cur, dt_arr)
            C_cur = sc.cov_inf
            delta = float(sc.delta)
            num_chunks += 1
            # Each chunk's converge runs one EXTRA cov step after its
            # while_loop (producing the cov_inf the next chunk consumes),
            # so that seam step advanced the recursion and must count. The
            # FINAL chunk's extra step is the frozen-block step — the
            # single-device path doesn't count that one either.
            total_iters += int(sc.iterations) + 1
        total_iters -= 1
        sc = sc._replace(
            iterations=jnp.asarray(total_iters, dtype=sc.iterations.dtype)
        )
    if promote:
        sc = type(sc)(**{
            k: (v.astype(out_dtype)
                if jnp.issubdtype(v.dtype, jnp.floating) else v)
            for k, v in sc._asdict().items()
        })
    return sc


def shard_steady_cache(steady, mesh):
    """Place frozen stationary blocks on the mesh for the mean-only solve:
    the wide (D, m) gain block and the (m, m) whitener row-sharded over
    'space' (their matvecs are row-independent; GSPMD all-gathers the (m,)
    whitened residual), scalars/vectors replicated."""
    row = NamedSharding(mesh, PartitionSpec("space", None))
    repl = NamedSharding(mesh, PartitionSpec())
    space = mesh.shape["space"]

    def place(value, want_row):
        # row-shard only when the leading dim tiles the space axis (the m
        # dim rarely does at toy sizes; the wide L21/cov_inf are what matter)
        if want_row and value.ndim == 2 and value.shape[0] % space == 0:
            return jax.device_put(value, row)
        return jax.device_put(value, repl)

    plan = {"cov_inf": True, "L21": True, "Sl": False, "Sl_inv": True,
            "err_vec": False, "iterations": False, "delta": False}
    return type(steady)(
        **{k: place(v, plan[k]) for k, v in steady._asdict().items()}
    )


def make_space_sharded_steady_solve(*, cache, steady, num_derivatives, mesh,
                                    dt, num_steps, latent=False):
    """Space-sharded mean-only steady-state solve (multi-step scan).

    Every step is the frozen-gain mean update of
    :func:`pnmol_tpu.solvers.white.make_steady_state_white_step` (or the
    latent analog) with the stationary blocks row-sharded over the mesh —
    no QR anywhere, O(D*m/P) work and bytes per device per step. Returns a
    jitted ``solve(mean0, t0) -> (mean, diffusion_sq)``; the covariance is
    the frozen ``steady.cov_inf`` and is not carried. Place ``steady`` with
    :func:`shard_steady_cache` first.
    """
    from pnmol_tpu.solvers import latent as latent_module
    from pnmol_tpu.solvers import white as white_module_

    make = (
        latent_module.make_steady_state_latent_step
        if latent
        else white_module_.make_steady_state_white_step
    )
    replicated = NamedSharding(mesh, PartitionSpec())

    @jax.jit
    def solve(cache_arg, steady_arg, mean0, t0):
        step = make(cache=cache_arg, steady=steady_arg,
                    num_derivatives=num_derivatives)
        mean0 = jax.lax.with_sharding_constraint(mean0, replicated)
        dt_arr = jnp.asarray(dt, mean0.dtype)

        def body(carry, i):
            mean, diff_sum = carry
            t_next = t0 + (i + 1) * dt_arr
            mean, _, _, _, diff_sq = step(
                mean, steady_arg.cov_inf, t_next, dt_arr
            )
            mean = jax.lax.with_sharding_constraint(mean, replicated)
            return (mean, diff_sum + diff_sq), None

        (mean, diff_sum), _ = jax.lax.scan(
            body, (mean0, jnp.zeros((), mean0.dtype)), jnp.arange(num_steps)
        )
        return mean, diff_sum / num_steps

    return functools.partial(solve, cache, steady)


def shard_cache(cache, mesh, distributed_qr=False, shard_operands=False):
    """Place the step cache on the mesh: Ql sharded to match the step's
    covariance layout, small operands replicated.

    ``shard_operands=True`` additionally ROW-shards every other 2-D cache
    operand (``L``, ``B``, ``E_bc_sqrtm``) whose leading dim tiles the
    mesh. At the N=1e5 3-D config a replicated ``L`` is ~40 GB and a
    replicated ``E_bc`` ~50 GB PER DEVICE — the difference between the
    sharded step fitting a v5p chip and not (docs/SCALE.md "N=1e5
    evidence"); at small/medium N replication avoids the extra
    collectives and stays the default.
    """
    if distributed_qr:
        ql_sharding = NamedSharding(mesh, PartitionSpec(None, "space"))
    else:
        ql_sharding = NamedSharding(mesh, PartitionSpec("space", None))
    replicated = NamedSharding(mesh, PartitionSpec())
    row = NamedSharding(mesh, PartitionSpec("space", None))
    space = mesh.shape["space"]

    def place(name, value):
        if name == "Ql":
            return jax.device_put(value, ql_sharding)
        if (shard_operands and getattr(value, "ndim", 0) == 2
                and value.shape[0] % space == 0):
            return jax.device_put(value, row)
        return jax.device_put(value, replicated)

    return type(cache)(**{k: place(k, v) for k, v in cache._asdict().items()})
