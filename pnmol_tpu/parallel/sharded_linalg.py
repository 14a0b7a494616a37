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
            # floor at tiny/eps: an exactly-zero panel (rank-deficient or
            # zero-padded input) otherwise gets a SUBNORMAL jitter whose
            # Cholesky underflows to 0 -> division by zero in the solve
            scale = jnp.maximum(
                jnp.trace(gram) / b,
                jnp.asarray(jnp.finfo(dtype).tiny / jnp.finfo(dtype).eps,
                            dtype),
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


def blocked_qr_r_sharded(stacked, mesh, axis="space", panel_size=None,
                         reorthogonalize=True, loop="unrolled"):
    """Distributed R factor with a ROW-SHARDED output.

    Same panel factorization as :func:`blocked_qr_r` (shifted CholeskyQR3
    panels + BGS2 trailing updates), but the R accumulates sharded: device
    ``p`` holds rows ``[p*L, (p+1)*L)`` of the (cols, cols) R and only ever
    materializes its own (L, cols) slice. The replicated-R variant holds
    the FULL R on every device — ~476 GB per device at the N=1e5 init
    pre-array (bench_artifacts/memory_analysis_n110592.json "init_blocked_
    panel_qr"), which is THE wall between "code-complete" and "fits a v5p"
    for the BASELINE N=1e5 config. Panel boundaries are aligned to the row
    partition (cols padded to P*L, L a multiple of the panel size), so each
    panel's R rows have exactly one owner; non-owners contribute an exact
    zero via a masked add.

    Returns R (cols, cols) upper-triangular, rows sharded over ``axis``;
    ``R^T R = stacked^T stacked`` exactly as in :func:`blocked_qr_r`.

    ``loop="scan"`` runs the panel sweep as ONE ``lax.scan`` body instead of
    an unrolled Python loop: the trailing update goes full-width with a
    column mask (finalized columns get an exact-zero projection), which
    costs ~2x the shrinking-trailing BGS FLOPs but bounds live memory at
    TWO generations of the local block — the unrolled sweep keeps one
    generation PER PANEL live under XLA:CPU's buffer assignment (~1 TB of
    temps per device at the N=1e5 pre-arrays;
    bench_artifacts/memory_analysis_n110592.json). Same scan-bodied-sweep
    medicine as the single-chip Pallas Householder engine (round 3).
    """
    rows, cols = stacked.shape
    P = mesh.shape[axis]
    L = -(-cols // P)
    if panel_size is None:
        panel_size = min(L, 256)
    b = max(1, min(panel_size, L))
    L = -(-L // b) * b  # L a multiple of the panel size
    cols_pad = P * L
    if cols_pad > cols:
        stacked = jnp.pad(stacked, ((0, 0), (0, cols_pad - cols)))
    pad = (-rows) % P
    if pad:
        stacked = jnp.concatenate(
            (stacked, jnp.zeros((pad, cols_pad), dtype=stacked.dtype)),
            axis=0,
        )

    panels = [(j, j + b) for j in range(0, cols_pad, b)]

    def local_factorize(block):
        dtype = block.dtype
        R_loc = jnp.zeros((L, cols_pad), dtype=dtype)
        eps = jnp.finfo(dtype).eps
        me = jax.lax.axis_index(axis)

        def cholqr(panel_block, jitter):
            # see blocked_qr_r.cholqr — identical numerics (the round-1
            # jitter drops out of the final R exactly)
            nb = panel_block.shape[1]
            gram = jax.lax.psum(panel_block.T @ panel_block, axis)
            scale = jnp.maximum(
                jnp.trace(gram) / nb,
                jnp.asarray(jnp.finfo(dtype).tiny / jnp.finfo(dtype).eps,
                            dtype),
            )
            gram = gram + (jitter * scale) * jnp.eye(nb, dtype=dtype)
            r = jnp.linalg.cholesky(gram).T
            q = jax.scipy.linalg.solve_triangular(
                r.T, panel_block.T, lower=True
            ).T
            return q, r

        for (j0, j1) in panels:
            panel_block = jax.lax.dynamic_slice_in_dim(block, j0, b, axis=1)
            q, r1 = cholqr(panel_block, jitter=jnp.sqrt(eps))
            q, r2 = cholqr(q, jitter=16.0 * eps)
            q, r3 = cholqr(q, jitter=16.0 * eps)
            r_panel = r3 @ (r2 @ r1)
            band = jnp.zeros((b, cols_pad), dtype=dtype)
            band = band.at[:, j0:j1].set(r_panel)
            if j1 < cols_pad:
                trailing = jax.lax.dynamic_slice_in_dim(
                    block, j1, cols_pad - j1, axis=1
                )
                proj = jax.lax.psum(q.T @ trailing, axis)
                trailing = trailing - q @ proj
                if reorthogonalize:
                    proj2 = jax.lax.psum(q.T @ trailing, axis)
                    trailing = trailing - q @ proj2
                    proj = proj + proj2
                band = band.at[:, j1:].set(proj)
                block = jax.lax.dynamic_update_slice(block, trailing, (0, j1))
            # masked ADD at a static row offset: the owner contributes the
            # band, everyone else exact zeros (an overwrite would need a
            # per-device dynamic index, which dynamic_update_slice clamps)
            owner = j0 // L
            row0 = j0 - owner * L
            masked = jnp.where(me == owner, band, jnp.zeros_like(band))
            R_loc = R_loc.at[row0:row0 + b, :].add(masked)
        return R_loc

    def local_factorize_scan(block):
        dtype = block.dtype
        eps = jnp.finfo(dtype).eps
        me = jax.lax.axis_index(axis)
        col_idx = jnp.arange(cols_pad)

        def cholqr(panel_block, jitter):
            nb = panel_block.shape[1]
            gram = jax.lax.psum(panel_block.T @ panel_block, axis)
            scale = jnp.maximum(
                jnp.trace(gram) / nb,
                jnp.asarray(jnp.finfo(dtype).tiny / jnp.finfo(dtype).eps,
                            dtype),
            )
            gram = gram + (jitter * scale) * jnp.eye(nb, dtype=dtype)
            r = jnp.linalg.cholesky(gram).T
            q = jax.scipy.linalg.solve_triangular(
                r.T, panel_block.T, lower=True
            ).T
            return q, r

        def body(carry, j0):
            block, R_loc = carry
            panel_block = jax.lax.dynamic_slice(
                block, (0, j0), (block.shape[0], b)
            )
            q, r1 = cholqr(panel_block, jitter=jnp.sqrt(eps))
            q, r2 = cholqr(q, jitter=16.0 * eps)
            q, r3 = cholqr(q, jitter=16.0 * eps)
            r_panel = r3 @ (r2 @ r1)
            # full-width trailing update, masked to columns >= j0 + b:
            # finalized (and own-panel) columns receive an exact zero
            mask = (col_idx >= j0 + b).astype(dtype)[None, :]
            proj = jax.lax.psum(q.T @ block, axis) * mask
            block = block - q @ proj
            if reorthogonalize:
                proj2 = jax.lax.psum(q.T @ block, axis) * mask
                block = block - q @ proj2
                proj = proj + proj2
            band = proj
            band = jax.lax.dynamic_update_slice(band, r_panel, (0, j0))
            # owner-masked add at a traced row offset: non-owners add an
            # exact zero at row 0 (a no-op), owners add at their local row
            owner = j0 // L
            row0 = jnp.where(me == owner, j0 - owner * L, 0)
            band = jnp.where(me == owner, band, jnp.zeros_like(band))
            slab = jax.lax.dynamic_slice(
                R_loc, (row0, 0), (b, cols_pad)
            )
            R_loc = jax.lax.dynamic_update_slice(
                R_loc, slab + band, (row0, 0)
            )
            return (block, R_loc), None

        R0 = jnp.zeros((L, cols_pad), dtype=dtype)
        starts = jnp.arange(0, cols_pad, b)
        (block, R_loc), _ = jax.lax.scan(body, (block, R0), starts)
        return R_loc

    fn = shard_map(
        local_factorize_scan if loop == "scan" else local_factorize,
        mesh=mesh,
        in_specs=PartitionSpec(axis, None),
        out_specs=PartitionSpec(axis, None),
        check_vma=False,
    )
    R = fn(stacked)
    if cols_pad > cols:
        R = R[:cols, :cols]
    return R


def _chol_pad_geometry(d, mesh, axis, panel_size):
    """(panel b, local rows r_loc, padded dim d_pad) for the panel loops.

    Local rows are rounded to a whole number of panels so every panel's rows
    live on exactly one device (the panel owner). The panel is CLAMPED to
    the raw local row count first: rounding ceil(d/P) up to an oversize
    panel made ``d_pad = P * panel`` grow LINEARLY in P once
    ``panel > d/P`` — the per-panel (b, d_pad) psum broadcast was 8.6 ->
    34.4 -> 68.7 GB at P = 8 -> 32 -> 64 for the N=1e5 innovation
    whitening, the round-4 memory analysis's anti-scaling signal (VERDICT
    round 4 weak #2; the sharded QR already clamps the same way).
    """
    P = mesh.shape[axis]
    r_loc = -(-d // P)
    b = panel_size if panel_size is not None else min(128, max(8, -(-d // (4 * P))))
    b = max(1, min(b, r_loc))
    r_loc = -(-r_loc // b) * b
    return b, r_loc, r_loc * P


def blocked_cholesky(G, mesh, axis="space", panel_size=None):
    """Distributed right-looking blocked Cholesky of a row-sharded SPD matrix.

    Returns the (unique) lower Cholesky factor of ``G``, row-sharded over the
    mesh axis like the input — nothing of size O(d^2) is ever replicated, so
    this is the initialization-scale counterpart of the step's distributed
    panel QR (the reference Cholesky-s the prior Gram on one device,
    ``/root/reference/src/pnmol/white.py:82-94``; at N >= 1e4 that replicated
    (d, d) factor is the scaling wall VERDICT round 2 names).

    Per panel: the owner's rows ride one ``psum`` broadcast, the (b, b)
    diagonal Cholesky runs redundantly on every device, the sub-panel
    triangular solve is row-local, and the trailing update is one masked
    rank-``b`` local matmul after an ``all_gather`` of the (d, b) column
    panel — communication O(d^2) total over the sweep, local FLOPs
    O(d^3 / P).
    """
    d = G.shape[0]
    dtype = G.dtype
    b, r_loc, d_pad = _chol_pad_geometry(d, mesh, axis, panel_size)
    if d_pad > d:
        G = jnp.pad(G, ((0, d_pad - d), (0, d_pad - d)))
        pad_diag = jnp.arange(d, d_pad)
        # unit diagonal on the pad block: chol(blockdiag(G, I)) = blockdiag(L, I)
        G = G.at[pad_diag, pad_diag].set(1.0)
    n_panels = d_pad // b
    hi = jax.lax.Precision.HIGHEST

    def local_chol(A_loc):
        idx = jax.lax.axis_index(axis)
        row0 = idx * r_loc
        rows_g = row0 + jnp.arange(r_loc)[:, None]  # (r_loc, 1) global rows
        col_g = jnp.arange(d_pad)[None, :]  # (1, d_pad)

        def panel_step(pj, A_loc):
            j = jnp.asarray(pj * b, jnp.int32)
            zi = jnp.zeros((), jnp.int32)
            local_off = jnp.clip(j - row0, 0, r_loc - b).astype(jnp.int32)
            is_owner = (j >= row0) & (j < row0 + r_loc)
            cand = jax.lax.dynamic_slice(A_loc, (local_off, zi), (b, d_pad))
            panel_rows = jax.lax.psum(
                jnp.where(is_owner, cand, jnp.zeros((), dtype)), axis
            )
            Djj = jax.lax.dynamic_slice(panel_rows, (zi, j), (b, b))
            Ljj = jnp.linalg.cholesky(Djj)

            # sub-panel columns: local rows' cols j:j+b through Ljj^{-T};
            # rows already finalized hold exact zeros there, so their solve
            # output is zero and the masks below never see garbage
            cols = jax.lax.dynamic_slice(A_loc, (zi, j), (r_loc, b))
            Lcols = jax.scipy.linalg.solve_triangular(
                Ljj, cols.T, lower=True
            ).T  # (r_loc, b)
            Lpan = jax.lax.all_gather(Lcols, axis).reshape(d_pad, b)

            below_row = rows_g >= j + b
            trail_col = col_g >= j + b
            in_panel_col = (col_g >= j) & (col_g < j + b)

            # [1] trailing update on rows >= j+b, cols >= j+b
            upd = jnp.dot(Lcols, Lpan.T, precision=hi)
            A_loc = A_loc - jnp.where(
                below_row & trail_col, upd, jnp.zeros((), dtype)
            )

            # [2] owner finalizes the panel rows: cols < j stay, cols j:j+b
            # get tril(Ljj), cols > j+b get zero
            Ljj_wide = jax.lax.dynamic_update_slice(
                jnp.zeros((b, d_pad), dtype), jnp.tril(Ljj), (zi, j)
            )
            new_panel_rows = jnp.where(col_g < j, panel_rows, Ljj_wide)
            written = jax.lax.dynamic_update_slice(
                A_loc, new_panel_rows, (local_off, zi)
            )
            row_in_panel = (rows_g >= j) & (rows_g < j + b)
            A_loc = jnp.where(is_owner & row_in_panel, written, A_loc)

            # [3] rows below the panel finalize their cols j:j+b
            Lcols_wide = jax.lax.dynamic_update_slice(
                jnp.zeros((r_loc, d_pad), dtype), Lcols, (zi, j)
            )
            A_loc = jnp.where(below_row & in_panel_col, Lcols_wide, A_loc)
            return A_loc

        return jax.lax.fori_loop(0, n_panels, panel_step, A_loc)

    fn = shard_map(
        local_chol,
        mesh=mesh,
        in_specs=PartitionSpec(axis, None),
        out_specs=PartitionSpec(axis, None),
        check_vma=False,
    )
    L = fn(G)
    return L[:d, :d] if d_pad > d else L


def _tri_solve_pad(L, B, mesh, axis, panel_size):
    d = L.shape[0]
    b, r_loc, d_pad = _chol_pad_geometry(d, mesh, axis, panel_size)
    if d_pad > d:
        L = jnp.pad(L, ((0, d_pad - d), (0, d_pad - d)))
        pad_diag = jnp.arange(d, d_pad)
        L = L.at[pad_diag, pad_diag].set(1.0)
        B = jnp.pad(B, ((0, d_pad - d), (0, 0)))
    return L, B, b, r_loc, d_pad


def blocked_tri_solve_lower(L, B, mesh, axis="space", panel_size=None,
                            transpose=False):
    """Distributed ``L^{-1} B`` (or ``L^{-T} B``) with row-sharded operands.

    ``L`` is a (d, d) lower-triangular factor and ``B`` a (d, K) right-hand
    side, both row-sharded over the mesh axis; the solution comes back
    row-sharded. Forward (``transpose=False``) substitution walks panels
    top-down broadcasting each solved (b, K) panel once; backward
    (``transpose=True``) walks bottom-up broadcasting the owner's L-row
    strip. Communication O(d*(d + K)) total; local FLOPs O(d^2 K / P).
    Together with :func:`blocked_cholesky` this gives the distributed
    ``cho_solve`` the initialization's closed-form y0 gain needs.
    """
    dtype = L.dtype
    d = L.shape[0]
    K = B.shape[1]
    L, B, b, r_loc, d_pad = _tri_solve_pad(L, B, mesh, axis, panel_size)
    n_panels = d_pad // b
    hi = jax.lax.Precision.HIGHEST

    def local_solve(L_loc, B_loc):
        idx = jax.lax.axis_index(axis)
        row0 = idx * r_loc
        rows_g = row0 + jnp.arange(r_loc)[:, None]  # (r_loc, 1)

        def fwd_step(pj, B_loc):
            j = jnp.asarray(pj * b, jnp.int32)
            zi = jnp.zeros((), jnp.int32)
            local_off = jnp.clip(j - row0, 0, r_loc - b).astype(jnp.int32)
            is_owner = (j >= row0) & (j < row0 + r_loc)
            zero = jnp.zeros((), dtype)

            L_cand = jax.lax.dynamic_slice(L_loc, (local_off, zi), (b, d_pad))
            L_rows = jax.lax.psum(jnp.where(is_owner, L_cand, zero), axis)
            Ljj = jax.lax.dynamic_slice(L_rows, (zi, j), (b, b))
            B_cand = jax.lax.dynamic_slice(B_loc, (local_off, zi), (b, K))
            B_panel = jax.lax.psum(jnp.where(is_owner, B_cand, zero), axis)
            Xp = jax.scipy.linalg.solve_triangular(Ljj, B_panel, lower=True)

            # owner stores the solved panel in place of its rhs rows
            written = jax.lax.dynamic_update_slice(B_loc, Xp, (local_off, zi))
            row_in_panel = (rows_g >= j) & (rows_g < j + b)
            B_loc = jnp.where(is_owner & row_in_panel, written, B_loc)

            # rows below eliminate the solved panel from their rhs
            Lcols = jax.lax.dynamic_slice(L_loc, (zi, j), (r_loc, b))
            upd = jnp.dot(Lcols, Xp, precision=hi)
            return B_loc - jnp.where(rows_g >= j + b, upd, zero)

        def bwd_step(k, B_loc):
            pj = n_panels - 1 - k
            j = jnp.asarray(pj * b, jnp.int32)
            zi = jnp.zeros((), jnp.int32)
            local_off = jnp.clip(j - row0, 0, r_loc - b).astype(jnp.int32)
            is_owner = (j >= row0) & (j < row0 + r_loc)
            zero = jnp.zeros((), dtype)

            L_cand = jax.lax.dynamic_slice(L_loc, (local_off, zi), (b, d_pad))
            L_rows = jax.lax.psum(jnp.where(is_owner, L_cand, zero), axis)
            Ljj = jax.lax.dynamic_slice(L_rows, (zi, j), (b, b))
            B_cand = jax.lax.dynamic_slice(B_loc, (local_off, zi), (b, K))
            B_panel = jax.lax.psum(jnp.where(is_owner, B_cand, zero), axis)
            Xp = jax.scipy.linalg.solve_triangular(
                Ljj, B_panel, lower=True, trans=1
            )

            written = jax.lax.dynamic_update_slice(B_loc, Xp, (local_off, zi))
            row_in_panel = (rows_g >= j) & (rows_g < j + b)
            B_loc = jnp.where(is_owner & row_in_panel, written, B_loc)

            # rows above eliminate via the L^T coupling L[j:j+b, :j]^T
            strip = jax.lax.dynamic_slice(
                L_rows, (zi, row0.astype(jnp.int32)), (b, r_loc)
            )
            upd = jnp.dot(strip.T, Xp, precision=hi)
            return B_loc - jnp.where(rows_g < j, upd, zero)

        step = bwd_step if transpose else fwd_step
        return jax.lax.fori_loop(0, n_panels, step, B_loc)

    fn = shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(PartitionSpec(axis, None), PartitionSpec(axis, None)),
        out_specs=PartitionSpec(axis, None),
        check_vma=False,
    )
    X = fn(L, B)
    return X[:d] if d_pad > d else X


def blocked_cho_solve(L, B, mesh, axis="space", panel_size=None):
    """Distributed ``(L L^T)^{-1} B`` from a row-sharded Cholesky factor."""
    Y = blocked_tri_solve_lower(L, B, mesh, axis=axis, panel_size=panel_size)
    return blocked_tri_solve_lower(
        L, Y, mesh, axis=axis, panel_size=panel_size, transpose=True
    )


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

    diag = jnp.arange(N)
    row_spec = NamedSharding(device_mesh, PartitionSpec("space", None))

    @jax.jit
    def compute(rows, full, nugget_gram, nugget_E):
        # nuggets enter as TRACED scalars through indexed diagonal adds: a
        # nugget*eye(N) literal would be constant-folded into an (N, N)
        # dense constant, which OOM-kills the XLA compile helper at N ~ 1e4
        # (the white.py:441-443 pattern)
        gram_k = kernel(rows, full.T).at[diag, diag].add(nugget_gram)
        gram_k = jax.lax.with_sharding_constraint(gram_k, row_spec)
        gram_Lk = L_kx(rows, full.T)
        gram_LLk = LL_kx(rows, full.T)
        chol_k = blocked_cholesky(gram_k, device_mesh)
        D = blocked_cho_solve(chol_k, gram_Lk.T, device_mesh).T
        E = gram_LLk - D @ gram_Lk.T
        if symmetrize_cholesky_E:
            E = 0.5 * (E + E.T)
        E = E.at[diag, diag].add(nugget_E)
        E = jax.lax.with_sharding_constraint(E, row_spec)
        # row-sharded distributed Cholesky: nothing O(N^2) is replicated
        # (the round-2 jnp.linalg.cholesky here was a replicated-output
        # local factorization — fine at test N, wrong shape for N >= 1e4)
        return D, blocked_cholesky(E, device_mesh)

    dtype = points_rows.dtype
    return compute(
        points_rows,
        points_rep,
        jnp.asarray(nugget_gram_matrix, dtype),
        jnp.asarray(nugget_cholesky_E, dtype),
    )


def ring_matmul(A, X, mesh, axis="space"):
    """``A @ X`` with ``A`` ROW-sharded and ``X``/output COLUMN-sharded —
    never materializing a full ``A`` (or a full output) on any device.

    GSPMD's own partitioning of this contraction all-gathers ``A``: with
    ``X`` column-sharded, each device computes its output column block
    ``A @ X[:, cols_p]`` and therefore wants ALL of ``A`` — a (d, d)
    all-gather that is ~49 GB/device at the N=1e5 3-D config (observed in
    the compiled step HLO, docs/SCALE.md round 4). This kernel instead
    rotates the (rows/P, k) shards of ``A`` around the ring (``ppermute``)
    while each device keeps only its own column block of ``X``: P rounds
    of (rows/P, cols/P) local matmuls, peak per-device memory
    O(rows*k/P + k*cols/P + rows*cols/P), communication = one full cycle
    of A's shards over ICI (the same bytes the all-gather moves, but only
    one shard resident at a time).

    ``A`` (ra, k) row-sharded over ``axis``; ``X`` (k, cx) column-sharded.
    Returns (ra, cx) column-sharded. The contraction dim ``k`` is
    unsharded in both operands.
    """
    ra, k = A.shape
    k2, cx = X.shape
    assert k == k2, (A.shape, X.shape)
    P = mesh.shape[axis]
    rb = -(-ra // P)
    ra_pad = rb * P
    if ra_pad > ra:
        A = jnp.pad(A, ((0, ra_pad - ra), (0, 0)))
    cb = -(-cx // P)
    cx_pad = cb * P
    if cx_pad > cx:
        X = jnp.pad(X, ((0, 0), (0, cx_pad - cx)))

    perm = [(i, (i + 1) % P) for i in range(P)]

    def body(A_loc, X_loc):
        me = jax.lax.axis_index(axis)

        def round_fn(r, carry):
            A_cur, out = carry
            # after r forward rotations, we hold the shard that started on
            # device (me - r) mod P -> its rows live at that global offset
            origin = jnp.mod(me - r, P).astype(jnp.int32)
            piece = A_cur @ X_loc  # (rb, cb)
            out = jax.lax.dynamic_update_slice(
                out, piece, (origin * rb, jnp.zeros((), origin.dtype))
            )
            A_next = jax.lax.ppermute(A_cur, axis, perm)
            return A_next, out

        out0 = jnp.zeros((ra_pad, X_loc.shape[1]), dtype=A_loc.dtype)
        _, out = jax.lax.fori_loop(0, P, round_fn, (A_loc, out0))
        return out

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(PartitionSpec(axis, None), PartitionSpec(None, axis)),
        out_specs=PartitionSpec(None, axis),
        check_vma=False,
    )
    out = fn(A, X)
    if ra_pad > ra or cx_pad > cx:
        out = out[:ra, :cx]
    return out


def gram_rowsharded(X, mesh, axis="space", unit_pad_diag=True):
    """``X @ X^T`` with ``X`` COLUMN-sharded and the Gram ROW-sharded —
    no device ever holds the full (m, m) Gram.

    The step's innovation covariance ``S = [HQl | E] [HQl | E]^T`` is
    (m, m): replicated it is ~61 GB/device at the N=1e5 3-D config, and
    GSPMD replicates it because the downstream ``cholesky`` cannot be
    partitioned (observed in the compiled step HLO). This assembles S as a
    RING REDUCE-SCATTER: each device starts a (m/P, m) row-block partial
    from its own column shard and the partials hop the ring, each device
    adding its contribution, so after P-1 hops every block lands fully
    reduced on its owner. Per-device bytes over the interconnect are
    (P-1)/P of the Gram — half of the previous psum-per-round form, which
    all-reduced every block to all P devices and had P-1 of them discard
    it (VERDICT round 4 weak #5). Peak per-device temp stays one row
    block. Feed the result to :func:`blocked_cholesky` (also row-sharded)
    and :func:`blocked_cho_solve` for the whitened residual.

    Rows are padded to P*ceil(m/P); with ``unit_pad_diag`` the pad block
    gets an identity diagonal so the padded Gram stays SPD
    (``chol(blockdiag(S, I)) = blockdiag(chol(S), I)``) and the padded
    result can go straight into the blocked Cholesky. Returns the PADDED
    (m_pad, m_pad) row-sharded Gram; callers slice results, not S.
    """
    m, k = X.shape
    P = mesh.shape[axis]
    rb = -(-m // P)
    m_pad = rb * P
    if m_pad > m:
        X = jnp.pad(X, ((0, m_pad - m), (0, 0)))
    kb = -(-k // P)
    if kb * P > k:
        X = jnp.pad(X, ((0, 0), (0, kb * P - k)))

    perm = [(i, (i + 1) % P) for i in range(P)]

    def body(X_loc):
        me = jax.lax.axis_index(axis)

        def contrib(b):
            # this device's column shard's contribution to S row-block b
            rows_b = jax.lax.dynamic_slice(
                X_loc, (b * rb, jnp.zeros((), b.dtype)),
                (rb, X_loc.shape[1]),
            )
            return rows_b @ X_loc.T

        # Ring reduce-scatter: at the start of hop s, this device holds the
        # partial for block (me + P-1-s) mod P; it forwards it and adds its
        # own contribution to the one arriving, so each block visits all P
        # devices exactly once and finishes on its owner (s = P-1 -> block
        # me). One (rb, m_pad) partial live + one in flight per device.
        acc = contrib(jnp.mod(me + P - 1, P))

        def hop(s, acc):
            b = jnp.mod(me + P - 1 - s, P)
            return jax.lax.ppermute(acc, axis, perm) + contrib(b)

        S_loc = jax.lax.fori_loop(1, P, hop, acc)
        if unit_pad_diag and m_pad > m:
            rows_gl = me * rb + jnp.arange(rb)
            cols_gl = jnp.arange(m_pad)
            on_pad_diag = (rows_gl[:, None] == cols_gl[None, :]) & (
                rows_gl[:, None] >= m
            )
            S_loc = S_loc + on_pad_diag.astype(S_loc.dtype)
        return S_loc

    fn = shard_map(
        body, mesh=mesh,
        in_specs=PartitionSpec(None, axis),
        out_specs=PartitionSpec(axis, None),
        check_vma=False,
    )
    return fn(X)
