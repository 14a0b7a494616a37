"""Sharded Gram assembly and large-N linear algebra over a device mesh.

Scaled-up counterpart of ``pnmol_tpu.discretize.collocation_global`` and of
the covariance-factor work inside the filters (SURVEY.md §2.2 items 2-3):
the collocation-point axis is laid out over the mesh's ``"space"`` axis so
Gram assembly is embarrassingly row-parallel, and XLA inserts the collectives
for the downstream solve/Cholesky under ``jit``.
"""

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from pnmol_tpu.parallel import meshes


def tsqr_r(stacked, mesh, axis="space"):
    """Distributed tall-skinny QR (R factor only) over a row-sharded matrix.

    The communication-avoiding scheme: each device QR-factorizes its local
    row block, the (C, C) local R factors ride one all-gather over the mesh
    axis, and a second small QR of the stacked R's yields the global R —
    total communication one (P*C*C) all-gather instead of gathering the full
    matrix. This is the scaling primitive for the sqrt-Kalman pre-arrays
    (their Gram is all the filter needs, and R carries it exactly).

    Requires local row count >= column count (true for the (2D+m) x (m+D)
    pre-array when the axis has <= 2 groups, and for arbitrarily sharded
    covariance stacks after blocking).
    """
    rows, cols = stacked.shape
    axis_size = mesh.shape[axis]
    if (rows // axis_size) < cols:
        raise ValueError(
            f"TSQR needs local rows ({rows}//{axis_size}) >= cols ({cols}); "
            "use fewer shards or the dense path."
        )

    def local_qr(block):
        r_local = jnp.linalg.qr(block, mode="r")  # (C, C)
        gathered = jax.lax.all_gather(r_local, axis)  # (P, C, C)
        return jnp.linalg.qr(gathered.reshape(-1, cols), mode="r")

    fn = shard_map(
        local_qr,
        mesh=mesh,
        in_specs=PartitionSpec(axis, None),
        out_specs=PartitionSpec(),
        check_vma=False,
    )
    return fn(stacked)


def blocked_qr_r(stacked, mesh, axis="space", panel_size=None, reorthogonalize=True):
    """Distributed R factor of a squarish row-sharded matrix.

    The sqrt-Kalman pre-array is ``(2D+m) x (m+D)`` — squarish, so plain TSQR
    degenerates (its gathered per-device R factors are nearly the full
    matrix). Instead: a right-looking *panel* factorization where each column
    panel is orthogonalized by CholeskyQR2 (two Gram + Cholesky rounds — all
    FLOPs are MXU matmuls, communication is one ``psum`` of a (b, b) Gram per
    round) and the trailing matrix is updated by block Gram-Schmidt (with an
    optional second pass for stability). Per panel pair the communication is
    one (b, trailing) ``psum`` — nothing of size O(rows) ever moves.

    Plays the role ScaLAPACK's PDGEQRF plays against the reference's
    single-device ``jax.scipy.linalg.qr`` (``/root/reference/src/pnmol/base/
    sqrt.py:21,66``). Returns the upper-triangular ``R`` (cols x cols),
    replicated; ``R^T R = stacked^T stacked`` exactly (the factor may differ
    from LAPACK's by row signs — irrelevant downstream, all consumers use
    the Gram or triangular solves).
    """
    rows, cols = stacked.shape
    axis_size = mesh.shape[axis]
    if panel_size is None:
        panel_size = min(cols, 256)
    # zero-pad rows to a multiple of the axis size (zero rows leave A^T A,
    # hence R, unchanged)
    pad = (-rows) % axis_size
    if pad:
        stacked = jnp.concatenate(
            (stacked, jnp.zeros((pad, cols), dtype=stacked.dtype)), axis=0
        )

    panels = []
    start = 0
    while start < cols:
        panels.append((start, min(start + panel_size, cols)))
        start += panel_size

    def local_factorize(block):
        """Runs per device on the local (rows/P, cols) row block."""
        dtype = block.dtype
        R = jnp.zeros((cols, cols), dtype=dtype)
        eps = jnp.finfo(dtype).eps

        def cholqr(panel_block, jitter):
            """One CholeskyQR round with a relative diagonal jitter.

            The pre-arrays this factorizes can be exactly column-rank
            deficient (noise-free Dirichlet measurements make the posterior
            singular along the measured directions), where a plain Cholesky
            NaNs. CholeskyQR2's algebra makes the round-1 jitter drop out of
            the final R exactly (R^T R = A^T A + j2 R1^T R1), so round 1
            takes a large stabilizing jitter and round 2 an O(eps) one —
            the final Gram bias is O(eps * ||A||^2), the same order as QR
            roundoff.
            """
            b = panel_block.shape[1]
            gram = jax.lax.psum(panel_block.T @ panel_block, axis)
            scale = jnp.trace(gram) / b + jnp.asarray(
                jnp.finfo(dtype).tiny, dtype
            )
            gram = gram + (jitter * scale) * jnp.eye(b, dtype=dtype)
            r = jnp.linalg.cholesky(gram).T  # upper
            q = jax.scipy.linalg.solve_triangular(
                r.T, panel_block.T, lower=True
            ).T
            return q, r

        for (j0, j1) in panels:
            panel_block = jax.lax.dynamic_slice_in_dim(block, j0, j1 - j0, axis=1)
            q, r1 = cholqr(panel_block, jitter=jnp.sqrt(eps))
            # shifted CholeskyQR3 (Fukaya et al.): the shifted first round
            # tames cond(A) up to ~eps^-1, two clean rounds restore
            # orthogonality to O(eps) — required in f32, where the
            # sqrt-Kalman factors' condition (~1e4-1e5) squares past the
            # f32 Cholesky limit and CholeskyQR2 alone breaks down.
            q, r2 = cholqr(q, jitter=16.0 * eps)
            q, r3 = cholqr(q, jitter=16.0 * eps)
            r_panel = r3 @ (r2 @ r1)
            R = jax.lax.dynamic_update_slice(R, r_panel, (j0, j0))
            if j1 < cols:
                trailing = jax.lax.dynamic_slice_in_dim(
                    block, j1, cols - j1, axis=1
                )
                proj = jax.lax.psum(q.T @ trailing, axis)
                trailing = trailing - q @ proj
                if reorthogonalize:  # BGS2: second projection pass
                    proj2 = jax.lax.psum(q.T @ trailing, axis)
                    trailing = trailing - q @ proj2
                    proj = proj + proj2
                R = jax.lax.dynamic_update_slice(R, proj, (j0, j1))
                block = jax.lax.dynamic_update_slice(block, trailing, (0, j1))
        return R

    fn = shard_map(
        local_factorize,
        mesh=mesh,
        in_specs=PartitionSpec(axis, None),
        out_specs=PartitionSpec(),
        check_vma=False,
    )
    return fn(stacked)


def sharded_triangular_solve(R, B, mesh, axis="space", lower=False):
    """Hand-scheduled distributed triangular solve ``R X = B``.

    The Kalman-gain solve has a small replicated triangular factor ``R``
    (m x m) against a wide right-hand side ``B`` (m x K, K ~ state dim):
    columns are independent, so each device solves its own column shard with
    zero communication (SURVEY §2.2 item 3 — the explicit counterpart of the
    GSPMD-managed solves inside the jitted step). Pads K to the axis size;
    returns X with B's sharding.
    """
    m, K = B.shape
    axis_size = mesh.shape[axis]
    pad = (-K) % axis_size
    if pad:
        B = jnp.concatenate((B, jnp.zeros((m, pad), dtype=B.dtype)), axis=1)

    def local_solve(R_local, B_local):
        return jax.scipy.linalg.solve_triangular(R_local, B_local, lower=lower)

    fn = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(PartitionSpec(), PartitionSpec(None, axis)),
        out_specs=PartitionSpec(None, axis),
        check_vma=False,
    )
    X = fn(R, B)
    return X[:, :K] if pad else X


def sharded_gram(kernel, points, mesh):
    """Assemble K(X, X) with rows sharded over the mesh's 'space' axis.

    Each device computes the Gram rows of its point shard against the full
    (replicated) point set — no communication during assembly.
    """
    row_sharding = meshes.space_sharding(mesh, rank=points.ndim)
    points_rows = jax.device_put(points, row_sharding)
    points_cols = jax.device_put(points, meshes.replicated(mesh))

    @jax.jit
    def assemble(rows, cols):
        gram = kernel(rows, cols.T)
        return jax.lax.with_sharding_constraint(
            gram, NamedSharding(mesh, PartitionSpec("space", None))
        )

    return assemble(points_rows, points_cols)


def sharded_collocation_global(
    diffop,
    mesh_spatial,
    device_mesh,
    kernel=None,
    nugget_gram_matrix=0.0,
    nugget_cholesky_E=0.0,
    symmetrize_cholesky_E=False,
):
    """Global collocation with Gram assembly and solves sharded over devices.

    Mirrors ``pnmol_tpu.discretize.collocation_global`` semantics; the three
    N x N Gram matrices are row-sharded and the solve/Cholesky run under one
    jit so GSPMD places the collectives.
    """
    from pnmol_tpu import discretize as discretize_module
    from pnmol_tpu import kernels as kernels_module

    if kernel is None:
        kernel = kernels_module.SquareExponential(input_scale=1.0, output_scale=1.0)

    L_kx, LL_kx = discretize_module._differentiate_kernel(diffop, kernel)
    points = mesh_spatial.points
    N = points.shape[0]

    row_sharding = meshes.space_sharding(device_mesh, rank=points.ndim)
    points_rows = jax.device_put(points, row_sharding)
    points_rep = jax.device_put(points, meshes.replicated(device_mesh))

    @jax.jit
    def compute(rows, full):
        gram_k = kernel(rows, full.T) + nugget_gram_matrix * jnp.eye(N, dtype=rows.dtype)
        gram_Lk = L_kx(rows, full.T)
        gram_LLk = LL_kx(rows, full.T)
        chol_k = jnp.linalg.cholesky(gram_k)
        D = jax.scipy.linalg.cho_solve((chol_k, True), gram_Lk.T).T
        E = gram_LLk - D @ gram_Lk.T
        if symmetrize_cholesky_E:
            E = 0.5 * (E + E.T)
        E = E + nugget_cholesky_E * jnp.eye(N, dtype=rows.dtype)
        return D, jnp.linalg.cholesky(E)

    return compute(points_rows, points_rep)
