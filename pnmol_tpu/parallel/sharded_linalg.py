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
