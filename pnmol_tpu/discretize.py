"""Probabilistic spatial discretization of differential operators.

Capability parity with ``/root/reference/src/pnmol/discretize.py``: kernel
(RKHS-based) finite differences producing both a differentiation matrix ``L``
and a diagonal discretization-error Cholesky factor ``E_sqrtm``; a one-sided
kernel-FD Neumann boundary operator; and dense global collocation.

TPU-first shape: all per-point stencil systems are solved in one vmapped
batch (a batched ``(s, s)`` Cholesky solve that XLA lowers to a single fused
kernel), the scatter into ``(N, N)`` matrices uses modern ``.at[].set()``
(the reference used the removed ``jax.ops.index_update``,
``discretize.py:106-113``), and neighbor search happens once on host
(see ``pnmol_tpu.mesh``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pnmol_tpu import config, diffops, kernels


def _matern52_point_patches(kernel):
    """Removable-singularity values for Matern52 derivatives at x == y.

    The Matern(5/2) is only twice differentiable; autodiff through the
    Laplacian produces NaN at zero distance. These are the MacLaurin-series
    values the reference hard-codes (``discretize.py:186-197``).
    """
    s2 = kernel.output_scale**2
    r2 = kernel.input_scale**2
    lk_at_zero = s2 * r2 * 2.5 / (1.0 - 2.5)
    llk_at_zero = s2 * r2**2 * 3.0 * 2.5**2 / (2.0 - 3.0 * 2.5 + 2.5**2)
    return lk_at_zero, llk_at_zero


def _differentiate_kernel(diffop, kernel):
    """Push a differential operator through a kernel: L_k and (L x L)_k."""
    L_kx = kernels.Lambda(diffop(kernel.pairwise, argnums=0))
    LL_kx = kernels.Lambda(diffop(L_kx.pairwise, argnums=1))
    return L_kx, LL_kx


def fd_coefficients(x, neighbors, k, L_k, LL_k, nugget_gram_matrix=0.0):
    """Kernel-based finite-difference weights and uncertainty for one stencil.

    Solves ``K(X, X) w = (L k)(x, X)`` and sets the uncertainty to
    ``(L L k)(x, x) - w . (L k)(x, X)`` (reference: ``discretize.py:177-201``).
    """
    X, s = neighbors, neighbors.shape[0]
    gram = k(X, X.T) + nugget_gram_matrix * jnp.eye(s, dtype=X.dtype)
    lk_at_x = L_k(x[None, :], X.T).reshape(-1)
    llk_at_x = LL_k(x, x).reshape(())

    if isinstance(k, kernels.Matern52):
        lk_zero, llk_zero = _matern52_point_patches(k)
        lk_at_x = jnp.nan_to_num(lk_at_x, nan=lk_zero)
        llk_at_x = jnp.nan_to_num(llk_at_x, nan=llk_zero)

    # Gram matrices are SPD: Cholesky solve (TPU supports it in all dtypes,
    # unlike LU) — falls back to the pseudo-stable path only through nuggets.
    chol = jnp.linalg.cholesky(gram)
    weights = jax.scipy.linalg.cho_solve((chol, True), lk_at_x)
    uncertainty = llk_at_x - weights @ lk_at_x
    return weights, uncertainty


def dx_adapted_input_scale(mesh_spatial, target=1.0):
    """Input scale keeping the stencil systems well conditioned at any dx.

    The conditioning of a kernel-FD stencil Gram grows like
    ``(input_scale * dx)^{-2(s-1)}``; with ``input_scale ~ target / dx`` the
    product is O(1) at every resolution, so the stencil solves stay accurate
    even in float32 (the f32 TPU policy). This is also what the reference's
    own MLE calibration converges to — the optimal input scale tracks the
    mesh spacing (``/root/reference/experiments/figure2.py:17-35``).
    """
    return float(target) / mesh_spatial.fill_distance


def _dedupe_offsets(points_host, point_indices, neighbor_indices):
    """Host-side dedupe of stencil offset patterns.

    Returns (representative offsets (U, s, dim) float64, inverse (n,)): on a
    uniform tensor grid U is O(1) (one interior pattern, a few boundary
    patterns), so the batched stencil solve shrinks from N systems to U.
    Offsets are taken from the f64 host geometry: differences of nearby f32
    coordinates would lose most significant digits, while the small offset
    values themselves are exactly representable.
    """
    pt_idx = np.asarray(point_indices)
    nb_idx = np.asarray(neighbor_indices)
    off = points_host[nb_idx] - points_host[pt_idx][:, None, :]
    scale = np.abs(off).max()
    if scale == 0.0:
        scale = 1.0
    quant = np.round(off / scale * 1e9).astype(np.int64).reshape(off.shape[0], -1)
    _, first, inverse = np.unique(
        quant, axis=0, return_index=True, return_inverse=True
    )
    return off[first], inverse.reshape(-1)


def _stencil_coefficients(coeff_batch, mesh_spatial, points, point_indices,
                          neighbors, neighbor_indices, dedupe):
    """Per-point FD weights/uncertainties, deduped for stationary kernels."""
    if not dedupe or points.shape[0] == 0:
        return coeff_batch(points, neighbors)
    rep_offsets, inverse = _dedupe_offsets(
        mesh_spatial._points_host, point_indices, neighbor_indices
    )
    dtype = config.default_dtype()
    zeros = jnp.zeros((rep_offsets.shape[0], rep_offsets.shape[2]), dtype=dtype)
    w_u, u_u = coeff_batch(zeros, jnp.asarray(rep_offsets, dtype=dtype))
    inv = jnp.asarray(inverse)
    return w_u[inv], u_u[inv]


def fd_probabilistic(
    diffop,
    mesh_spatial,
    kernel=None,
    stencil_size_interior=3,
    stencil_size_boundary=3,
    nugget_gram_matrix=0.0,
    stencil_dedupe="auto",
):
    """Discretize ``diffop`` with probabilistic finite differences.

    Returns the differentiation matrix ``L`` (N x N, one stencil row per mesh
    point) and the diagonal error factor ``E_sqrtm`` (N x N).

    ``stencil_dedupe`` ("auto" | True | False): for stationary kernels the
    stencil system depends only on the neighbor *offsets*, so identical
    offset patterns (all interior points of a uniform grid) are solved once
    and broadcast — O(1) solves instead of O(N) at setup. "auto" enables this
    whenever the kernel declares itself stationary.
    """
    if kernel is None:
        kernel = kernels.SquareExponential(input_scale=1.0, output_scale=1.0)

    L_kx, LL_kx = _differentiate_kernel(diffop, kernel)
    coeff_batch = jax.jit(
        jax.vmap(
            partial(
                fd_coefficients,
                k=kernel,
                L_k=L_kx,
                LL_k=LL_kx,
                nugget_gram_matrix=nugget_gram_matrix,
            )
        )
    )
    dedupe = (
        bool(stencil_dedupe)
        if stencil_dedupe != "auto"
        else getattr(kernel, "stationary", False)
    )

    points_interior, _, indices_interior = mesh_spatial.interior
    points_boundary, _, indices_boundary = mesh_spatial.boundary

    neighbors_interior, neighbor_idx_interior = mesh_spatial.neighbours(
        point=points_interior, num=stencil_size_interior
    )
    neighbors_boundary, neighbor_idx_boundary = mesh_spatial.neighbours(
        point=points_boundary, num=stencil_size_boundary
    )

    w_int, u_int = _stencil_coefficients(
        coeff_batch, mesh_spatial, points_interior, indices_interior,
        neighbors_interior, neighbor_idx_interior, dedupe,
    )
    w_bnd, u_bnd = _stencil_coefficients(
        coeff_batch, mesh_spatial, points_boundary, indices_boundary,
        neighbors_boundary, neighbor_idx_boundary, dedupe,
    )

    N = mesh_spatial.shape[0]
    dtype = config.default_dtype()
    L = jnp.zeros((N, N), dtype=dtype)
    E_sqrtm = jnp.zeros((N, N), dtype=dtype)

    L = L.at[indices_boundary[:, None], neighbor_idx_boundary].set(w_bnd)
    L = L.at[indices_interior[:, None], neighbor_idx_interior].set(w_int)
    E_sqrtm = E_sqrtm.at[indices_boundary, indices_boundary].set(u_bnd)
    E_sqrtm = E_sqrtm.at[indices_interior, indices_interior].set(u_int)
    return L, E_sqrtm


def fd_probabilistic_neumann_1d(
    mesh_spatial,
    kernel=None,
    stencil_size=2,
    nugget_gram_matrix=0.0,
):
    """Kernel-FD normal-derivative operator on a 1-D mesh's two boundary points.

    Two-point one-sided stencils; the left weights are negated so the operator
    is the *outward* normal derivative (reference: ``discretize.py:116-158``).
    Returns ``(B, R_sqrtm)`` with B of shape (2, N).
    """
    if stencil_size != 2:
        raise NotImplementedError
    if kernel is None:
        kernel = kernels.SquareExponential(input_scale=1.0, output_scale=1.0)

    D = diffops.gradient()  # 1-D: gradient == derivative
    L_k, LL_k = _differentiate_kernel(D, kernel)

    def one_sided(idx_x, idx_neighbors):
        return fd_coefficients(
            x=mesh_spatial[idx_x],
            neighbors=mesh_spatial[(idx_neighbors,)],
            k=kernel,
            L_k=L_k,
            LL_k=LL_k,
            nugget_gram_matrix=nugget_gram_matrix,
        )

    weights_left, uncertainty_left = one_sided(0, (0, 1))
    weights_right, uncertainty_right = one_sided(-1, (-1, -2))

    # Projection onto (left pt, its neighbor, right pt, its neighbor).
    N = len(mesh_spatial)
    B_select = jnp.eye(N, dtype=weights_left.dtype)[((0, 1, -1, -2),)]
    diffmatrix = jax.scipy.linalg.block_diag(-weights_left, weights_right)
    errormatrix = jnp.diag(jnp.stack([uncertainty_left, uncertainty_right]))
    return diffmatrix @ B_select, errormatrix


def fd_probabilistic_neumann(
    mesh_spatial,
    kernel=None,
    stencil_size=3,
    nugget_gram_matrix=0.0,
):
    """Kernel-FD outward-normal-derivative operator in ANY spatial dimension.

    Beyond the reference (1-D two-point stencils only,
    ``discretize.py:116-158``): per boundary point, solve the stencil system
    for the *directional* derivative along that point's outward normal
    (``mesh_spatial.boundary_normals``; normals are data, so all boundary
    points batch in one vmap — no per-normal operator retracing). Returns
    ``(B (b, N), R_sqrtm (b, b))`` like the 1-D variant.
    """
    if kernel is None:
        kernel = kernels.SquareExponential(input_scale=1.0, output_scale=1.0)

    pairwise = kernel.pairwise
    grad_x = jax.grad(lambda x, y: pairwise(x, y).squeeze(), argnums=0)
    hess_xy = jax.jacfwd(grad_x, argnums=1)

    # Matern52 removable singularity at zero distance (autodiff NaNs there,
    # like in fd_coefficients): grad of an even radial kernel is 0 at
    # coincidence, and d_x d_y k at coincidence is (5/3) sigma^2 rho^2 * I,
    # so n.H.n = (5/3) sigma^2 rho^2 for a unit normal.
    is_matern = isinstance(kernel, kernels.Matern52)
    if is_matern:
        hess_at_zero = (
            5.0 / 3.0 * kernel.output_scale**2 * kernel.input_scale**2
        )

    def one_point(x, neighbors, normal):
        s = neighbors.shape[0]
        gram = kernel(neighbors, neighbors.T) + nugget_gram_matrix * jnp.eye(
            s, dtype=x.dtype
        )
        lk = jax.vmap(lambda xj: jnp.dot(normal, grad_x(x, xj)))(neighbors)
        llk = normal @ hess_xy(x, x) @ normal
        if is_matern:
            lk = jnp.nan_to_num(lk, nan=0.0)
            llk = jnp.where(jnp.isnan(llk), hess_at_zero, llk)
        chol = jnp.linalg.cholesky(gram)
        weights = jax.scipy.linalg.cho_solve((chol, True), lk)
        uncertainty = llk - weights @ lk
        return weights, uncertainty

    points_boundary, _, indices_boundary = mesh_spatial.boundary
    neighbors, neighbor_idx = mesh_spatial.neighbours(
        point=points_boundary, num=stencil_size
    )
    normals = mesh_spatial.boundary_normals
    weights, uncertainties = jax.jit(jax.vmap(one_point))(
        points_boundary, neighbors, normals
    )

    N = mesh_spatial.shape[0]
    b = points_boundary.shape[0]
    B = jnp.zeros((b, N), dtype=weights.dtype)
    B = B.at[jnp.arange(b)[:, None], neighbor_idx].set(weights)
    return B, jnp.diag(uncertainties)


def collocation_global(
    diffop,
    mesh_spatial,
    kernel=None,
    nugget_gram_matrix=0.0,
    nugget_cholesky_E=0.0,
    symmetrize_cholesky_E=False,
):
    """Dense global (unsymmetric) collocation: ``D = (L_k K^{-1})^T`` and the
    full error covariance Cholesky (reference: ``discretize.py:204-236``).

    This is the variant that scales to large N on TPU: three dense N x N Gram
    assemblies, one solve, one Cholesky — all MXU-shaped; the sharded path in
    ``pnmol_tpu.parallel`` partitions these over the device mesh.
    """
    if kernel is None:
        kernel = kernels.SquareExponential(input_scale=1.0, output_scale=1.0)

    L_kx, LL_kx = _differentiate_kernel(diffop, kernel)

    points = mesh_spatial.points
    N = mesh_spatial.shape[0]
    gram_k = kernel(points, points.T) + nugget_gram_matrix * jnp.eye(N)
    gram_Lk = L_kx(points, points.T)
    gram_LLk = LL_kx(points, points.T)

    chol_k = jnp.linalg.cholesky(gram_k)
    D = jax.scipy.linalg.cho_solve((chol_k, True), gram_Lk.T).T
    E = gram_LLk - D @ gram_Lk.T
    if symmetrize_cholesky_E:
        E = 0.5 * (E + E.T)
    E = E + nugget_cholesky_E * jnp.eye(N)
    return D, jnp.linalg.cholesky(E)
