"""Blocked Householder QR (R-only) with a Pallas panel kernel.

The PDE-filter step is QR-bound (docs/SCALE.md shootout): XLA's TPU QR
expander spends most of its wall-clock in per-column work that round-trips
HBM, while the step's pre-array factorization only ever needs the upper
factor ``R``. This module implements the classical compact-WY blocked
Householder QR the TPU way:

* **Leaf panels** (``leaf`` columns, default 32) are factorized inside ONE
  Pallas kernel invocation: the ``(rows, leaf)`` slab stays in VMEM for all
  column steps (column extraction, reflector formation, rank-1 updates, and
  the T-recurrence all happen on-chip) instead of launching per-column HLO.
* **WY aggregation**: leaf reflectors are merged into ``block``-wide
  (default 128) compact-WY factors with small matmuls, so the
* **trailing updates** run as plain rank-``block`` XLA matmuls — MXU work
  with a 128-deep contraction.

Numerically this is genuine Householder QR — columnwise backward stable,
``eps * ||A||`` error in the factor — unlike Gram/Cholesky-based fast QRs
(``parallel.sharded_linalg.blocked_qr_r``) whose ``eps * cond(A)^2`` error
loses the small posterior directions of sqrt-Kalman factors in f32
(docs/SCALE.md "Factorization shootout").

Fills the role LAPACK ``geqrt``/``larfb`` play against the reference's
``jax.scipy.linalg.qr`` calls (``/root/reference/src/pnmol/base/sqrt.py:21,66``).

Only ``R`` is returned; Householder vectors never leave the factorization
(the sqrt-Kalman update needs ``R`` alone — gain and innovation factor are
read out of its blocks, ``pnmol_tpu/ops/sqrt.py``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves where jaxlib has TPU support compiled in
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _roundup(x: int, q: int) -> int:
    return -(-x // q) * q


# All driver-level matmuls run at an explicit precision. The TPU default
# (one bf16 pass) silently destroys Householder's stability advantage: the
# WY trailing updates would inject ~1e-3-relative noise into the factor.
# "highest" (six bf16 passes) reproduces f32 accuracy; "high" (three) is a
# measured middle ground exposed for experiments.
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _dot(a, b, precision):
    return jnp.dot(
        a, b, preferred_element_type=a.dtype, precision=_PRECISIONS[precision]
    )


# ---------------------------------------------------------------------------
# Leaf panel kernel: Householder QR of a (rows, leaf) slab, entirely in VMEM.
# ---------------------------------------------------------------------------


def _leaf_kernel(a_in, vr_out, t_out, *, leaf: int):
    """Unblocked Householder QR of one VMEM-resident slab.

    ``a_in``: (rows, leaf) input slab; the slab's diagonal is its row 0..leaf
    (the caller slices A so that global row == global column at slab row k
    for column k).

    ``vr_out``: (rows, leaf) — R in the upper triangle of the top (leaf,
    leaf) square, Householder tails strictly below the diagonal (the unit
    diagonal of V is implicit).

    ``t_out``: (leaf, leaf) upper-triangular compact-WY factor with
    ``Q = H_0 H_1 ... = I - V T V^T`` and the per-column ``tau`` on the
    diagonal.

    The column loop is a *static* Python unroll with full-width masked
    VPU ops (Mosaic-friendly: no sub-tile slicing, no dim-1 matmuls). This
    narrow orientation keeps only ``leaf`` of 128 lanes busy — the wide LQ
    form below is the fast path; this one is kept as the row-oriented
    reference implementation.
    """
    rows = a_in.shape[0]
    dtype = a_in.dtype
    vr_out[:] = a_in[:]
    t_out[:] = jnp.zeros((leaf, leaf), dtype)

    # All masks/ops below are full-width VPU elementwise + reductions —
    # Mosaic-friendly (no dim-1 matmuls, no pads, no sub-tile slicing).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, leaf), 1)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, leaf), 1)
    t_rows = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 0)
    t_cols = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 1)

    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)

    for k in range(leaf):
        a = vr_out[:]  # (rows, leaf)
        x = jnp.sum(jnp.where(col_ids == k, a, zero), axis=1, keepdims=True)
        alpha = jnp.sum(jnp.where(row_ids == k, x, zero))
        tail_mask = row_ids > k
        sigma = jnp.sum(jnp.where(tail_mask, x * x, zero))
        norm = jnp.sqrt(alpha * alpha + sigma)
        # sign choice avoids cancellation; norm == 0 -> identity reflector
        sign = jnp.where(alpha >= 0, one, -one)
        beta = -sign * norm
        denom = alpha - beta
        safe = norm > 0
        inv_denom = jnp.where(safe, one / jnp.where(safe, denom, one), zero)
        tau = jnp.where(safe, (beta - alpha) / jnp.where(safe, beta, one), zero)

        # v: implicit-unit reflector column (0 above k, 1 at k, scaled below)
        v = jnp.where(tail_mask, x * inv_denom, jnp.where(row_ids == k, one, zero))

        # One reduction serves both the rank-1 update and the T recurrence:
        # s = v^T a; columns > k need w = tau * s, columns < k are exactly
        # V[:, :k]^T v (v is zero on rows < k, so stored R entries and the
        # unit diagonals of earlier reflectors drop out of the product).
        s = jnp.sum(v * a, axis=0, keepdims=True)  # (1, leaf)
        a_upd = a - v * (tau * s)
        col_new = jnp.where(row_ids == k, beta, jnp.where(tail_mask, x * inv_denom, x))
        vr_out[:] = jnp.where(
            col_ids > k, a_upd, jnp.where(col_ids == k, col_new, a)
        )

        # T recurrence: T[:k, k] = -tau * T[:k, :k] @ z with z = s[:k].
        z_masked = jnp.where(lane_ids < k, s, zero)  # (1, leaf)
        t_cur = t_out[:]
        tz = jnp.sum(t_cur * z_masked, axis=1, keepdims=True)  # (leaf, 1)
        t_col = jnp.where(
            t_rows == k, tau, jnp.where(t_rows < k, -tau * tz, zero)
        )
        t_out[:] = jnp.where(t_cols == k, t_col, t_cur)


def _leaf_qr(slab, *, leaf: int, interpret: bool = False):
    """Run the leaf kernel on one (rows, leaf) slab."""
    rows = slab.shape[0]
    dtype = slab.dtype
    kernel = functools.partial(_leaf_kernel, leaf=leaf)
    if _HAS_PLTPU and not interpret:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    else:  # interpreter / non-TPU fallback keeps the same semantics
        in_specs = [pl.BlockSpec(slab.shape, lambda: (0, 0))]
        out_specs = (
            pl.BlockSpec((rows, leaf), lambda: (0, 0)),
            pl.BlockSpec((leaf, leaf), lambda: (0, 0)),
        )
    vr, t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, leaf), dtype),
            jax.ShapeDtypeStruct((leaf, leaf), dtype),
        ),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret or not _HAS_PLTPU,
    )(slab)
    return vr, t


# ---------------------------------------------------------------------------
# Blocked driver: leaf factorization + WY merging + MXU trailing updates.
# ---------------------------------------------------------------------------


def _split_vr(vr, leaf: int):
    """(V with unit diagonal, R panel) from a leaf kernel output."""
    rows = vr.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, leaf), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, leaf), 1)
    v = jnp.where(
        row_ids > col_ids, vr, jnp.where(row_ids == col_ids, 1.0, 0.0)
    ).astype(vr.dtype)
    r = jnp.triu(vr[:leaf])
    return v, r


def _blocked_qr_r_impl(
    A,
    *,
    leaf: int = 32,
    block: int = 128,
    row_quant: int = 2048,
    interpret: bool = False,
    precision: str = "highest",
):
    """Upper-triangular R of a QR of ``A`` (M >= N), shape (N, N).

    Equivalent (up to row signs — any valid QR) to
    ``jnp.linalg.qr(A, mode="r")``; the Gram ``R^T R == A^T A`` holds to
    Householder accuracy. ``leaf`` columns are factorized per Pallas kernel
    call; ``block`` columns share one trailing update. Slab row counts are
    quantized to ``row_quant`` so only O(M / row_quant) distinct kernel
    shapes compile.

    Note on magnitudes: reflector norms are computed as ``sqrt(alpha^2 +
    sigma)`` without LAPACK-style rescaling — columns with entries beyond
    ~sqrt(dtype_max) overflow and columns below ~sqrt(dtype_tiny) collapse
    to an identity reflector. The sqrt-Kalman factors this module serves
    are O(1)-scaled; rescale inputs before calling on general data.
    """
    M, N = A.shape
    if M < N:
        raise ValueError(f"blocked_qr_r requires M >= N, got {A.shape}")
    block = max(block, leaf)
    row_quant = max(row_quant, block)  # keeps every slab inside the row pad
    dtype = A.dtype

    n_pad = _roundup(N, block)
    # column padding to a whole number of blocks; rows padded only as far as
    # needed so every block retains at least `width` active rows
    A = jnp.pad(A, ((0, max(n_pad - M, 0)), (0, n_pad - N)))

    # Left-to-right sweep over column blocks. The active submatrix `work`
    # shrinks by `block` rows and columns per iteration (rows above the
    # current diagonal are final R rows and are collected, never rewritten),
    # so no O(M x N) buffer is ever update-sliced — the only full-width
    # operation per block is the trailing matmul update itself.
    work = A
    # R is assembled progressively INSIDE the block loop: a strip held as a
    # lazy slice of the trailing-update buffer would keep every block's
    # (rows x cols) trail alive until the end of the sweep (observed 90 GB
    # peak at N=4096 — one ~1.6 GB dot buffer per block, all simultaneously
    # live); the in-loop dynamic_update_slice consumes the slice and lets
    # each trail buffer die with its block.
    R = jnp.zeros((n_pad, n_pad), dtype)
    for jb in range(0, n_pad, block):
        width = min(block, n_pad - jb)
        rows_w = work.shape[0]

        # --- factor the block columns, leaf by leaf -----------------------
        blk = jax.lax.slice(work, (0, 0), (rows_w, width))
        vs, ts = [], []
        for jl in range(0, width, leaf):
            # kernel slab rows quantized (padded with zero rows, which do
            # not perturb Householder norms), so only O(M / row_quant)
            # distinct Mosaic kernel shapes compile across the whole sweep
            rows = rows_w - jl
            rows_q = max(leaf, _roundup(rows, row_quant))
            slab = jax.lax.slice(blk, (jl, jl), (rows_w, jl + leaf))
            if rows_q > rows:
                slab = jnp.pad(slab, ((0, rows_q - rows), (0, 0)))
            vr, t = _leaf_qr(slab, leaf=leaf, interpret=interpret)
            vr = jax.lax.slice(vr, (0, 0), (rows, leaf))
            blk = jax.lax.dynamic_update_slice(blk, vr, (jl, jl))
            v, _ = _split_vr(vr, leaf)
            rest_w = width - (jl + leaf)
            if rest_w > 0:
                rest = jax.lax.slice(blk, (jl, jl + leaf), (rows_w, width))
                y = _dot(v.T, rest, precision)
                rest = rest - _dot(v, _dot(t.T, y, precision), precision)
                blk = jax.lax.dynamic_update_slice(blk, rest, (jl, jl + leaf))
            vs.append((jl, v))
            ts.append(t)

        # --- merge leaf reflectors into one block-wide compact WY ---------
        v_blk = jnp.zeros((rows_w, width), dtype)
        for i, (jl, v) in enumerate(vs):
            v_pad = jnp.pad(v, ((jl, 0), (0, 0)))
            v_blk = jax.lax.dynamic_update_slice(v_blk, v_pad, (0, i * leaf))
        t_blk = ts[0]
        for i in range(1, len(ts)):
            w1 = t_blk.shape[0]
            v1 = jax.lax.slice(v_blk, (0, 0), (rows_w, w1))
            v2 = jax.lax.slice(v_blk, (0, w1), (rows_w, w1 + leaf))
            cross = _dot(v1.T, v2, precision)
            t12 = -_dot(_dot(t_blk, cross, precision), ts[i], precision)
            t_blk = jnp.concatenate(
                (
                    jnp.concatenate((t_blk, t12), axis=1),
                    jnp.concatenate((jnp.zeros((leaf, w1), dtype), ts[i]), axis=1),
                ),
                axis=0,
            )

        # --- one trailing update, then shrink ------------------------------
        r_blk = jnp.triu(jax.lax.slice(blk, (0, 0), (width, width)))
        trail_w = n_pad - (jb + width)
        if trail_w > 0:
            trail = jax.lax.slice(work, (0, width), (rows_w, width + trail_w))
            y = _dot(v_blk.T, trail, precision)
            trail = trail - _dot(v_blk, _dot(t_blk.T, y, precision), precision)
            strip = jnp.concatenate(
                (r_blk, jax.lax.slice(trail, (0, 0), (width, trail_w))),
                axis=1,
            )
            # next block's active submatrix: rows/cols past this block
            work = jax.lax.slice(trail, (width, 0), (rows_w, trail_w))
        else:
            strip = r_blk
            work = work[:0, :0]
        R = jax.lax.dynamic_update_slice(R, strip, (jb, jb))
        # One barrier per block, threading BOTH the shrunk work matrix and
        # the accumulating R: it (a) materializes the work slice as its own
        # buffer (XLA duplicates cheap slices into every consumer, chaining
        # each block's full trail buffer alive) and (b) pins the R update
        # into the block's schedule slot (the R chain is off the critical
        # path, so the scheduler would otherwise sink every DUS - and the
        # trail operands fused into them - to the end of the sweep).
        # Without this: 90 GB peak at N=4096 for a 2 GB problem.
        work, R = jax.lax.optimization_barrier((work, R))

    return R[:N, :N]


# Public jitted entry point. The hooks below call the *impl* directly so the
# sweep traces inline into the caller's graph: a nested jit becomes an XLA
# closed_call whose temporaries defeat cross-block buffer reuse (observed
# 90 GB peak at N=4096 for a 2 GB problem).
blocked_qr_r = jax.jit(
    _blocked_qr_r_impl,
    static_argnames=("leaf", "block", "row_quant", "interpret", "precision"),
)


# ---------------------------------------------------------------------------
# Transposed orientation: LQ of W = A^T ("wide" Householder), L = R^T.
#
# On TPU the wide orientation is strictly better for this workload:
# * the long (M) dimension lies on the 128-lane axis, so every VPU op in the
#   leaf kernel uses all lanes (the (rows, leaf) slab of the R-form keeps
#   only `leaf` of 128 lanes busy),
# * the pivot row is a *static sublane slice* (w_ref[k]) instead of a masked
#   full-slab reduction, and
# * the step's pre-array assembles from [HACl, HQl, E; ACl, Ql, 0] with NO
#   transposes of the big factors (they enter pre-transposed by definition).
# ---------------------------------------------------------------------------


def _leaf_lq_kernel(off_in, w_in, lv_out, t_out, *, leaf: int,
                    pair: bool = False):
    """Householder LQ of a (leaf, cols) wide slab, diagonal at lane off + k.

    ``off_in``: (1,) int32 scalar (SMEM) — the slab's diagonal lane offset.
    It is a RUNTIME value, so one compiled kernel serves every block
    position of a ``lax.scan``-bodied sweep (the round-2 static-``off``
    variant forced one Mosaic compile per leaf position and an unrolled
    driver whose ~1e3-call graph OOM-killed the XLA compile helper at
    N=1e4 — docs/SCALE.md "Householder path").

    ``lv_out``: L values at lanes <= off + row (beta on the diagonal lane),
    reflector tails at lanes > off + row (unit diagonal implicit).
    ``t_out``: (leaf, leaf) — stores T^T (lower triangular, tau on the
    diagonal) of the compact-WY ``Q = I - V^T T V`` (V rows = reflectors).
    """
    cols = w_in.shape[1]
    dtype = w_in.dtype
    off = off_in[0]
    lv_out[:] = w_in[:]
    t_out[:] = jnp.zeros((leaf, leaf), dtype)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (leaf, 1), 0)
    t_rows = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 0)
    t_lanes = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 1)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)

    def reflector_parts(x, k):
        d_eq = lane_ids == off + k
        d_gt = lane_ids > off + k
        alpha = jnp.sum(jnp.where(d_eq, x, zero))
        sigma = jnp.sum(jnp.where(d_gt, x * x, zero))
        norm = jnp.sqrt(alpha * alpha + sigma)
        sign = jnp.where(alpha >= 0, one, -one)
        beta = -sign * norm
        denom = alpha - beta
        safe = norm > 0
        inv_denom = jnp.where(safe, one / jnp.where(safe, denom, one), zero)
        tau = jnp.where(
            safe, (beta - alpha) / jnp.where(safe, beta, one), zero
        )
        v = jnp.where(d_gt, x * inv_denom, jnp.where(d_eq, one, zero))
        return v, beta, tau, inv_denom, d_eq, d_gt

    def t_row_insert(k, tau, z):
        # T^T recurrence (row k of T^T): -tau * z^T T^T with z = s[:k];
        # rows < k of v are zero on the already-finalized L lanes, so the
        # stored L entries never contaminate s.
        tT_cur = t_out[:]
        tT_row = -tau * jnp.sum(z * tT_cur, axis=0, keepdims=True)  # (1, leaf)
        t_col_new = jnp.where(
            t_lanes == k, tau, jnp.where(t_lanes < k, tT_row, zero)
        )
        t_out[:] = jnp.where(t_rows == k, t_col_new, tT_cur)

    if pair and leaf % 2:
        raise ValueError(f"pair=True requires an even leaf, got {leaf}")

    for k in range(0, leaf, 2 if pair else 1):
        x = lv_out[k : k + 1, :]  # (1, cols) static sublane slice
        v, beta, tau, inv_denom, d_eq, d_gt = reflector_parts(x, k)

        if not pair:
            w = lv_out[:]  # (leaf, cols)
            s = jnp.sum(w * v, axis=1, keepdims=True)  # (leaf, 1) reduction
            # gated rank-1 update (tau for rows > k, else 0): one fused FMA
            # pass instead of FMA + full-slab select; row k overwritten
            # separately
            gate = jnp.where(row_ids > k, tau, zero)  # (leaf, 1)
            lv_out[:] = w - (gate * s) * v
            lv_out[k : k + 1, :] = jnp.where(
                d_eq, beta, jnp.where(d_gt, x * inv_denom, x)
            )
            z = jnp.where(row_ids < k, s, zero)  # (leaf, 1)
            t_row_insert(k, tau, z)
            continue

        # paired form (see _block_lq_kernel): reflector k+1 from the
        # singly-updated row k+1, then ONE rank-2 slab pass for both
        x1_raw = lv_out[k + 1 : k + 2, :]
        s01 = jnp.sum(x1_raw * v)
        x1 = x1_raw - (tau * s01) * v
        v1, beta1, tau1, inv_denom1, d_eq1, d_gt1 = reflector_parts(
            x1, k + 1
        )

        w = lv_out[:]
        s0 = jnp.sum(w * v, axis=1, keepdims=True)  # W v_k
        s1r = jnp.sum(w * v1, axis=1, keepdims=True)  # W v_{k+1}
        c01 = jnp.sum(v * v1)
        s1 = s1r - (tau * c01) * s0
        gate0 = jnp.where(row_ids > k + 1, tau, zero)
        gate1 = jnp.where(row_ids > k + 1, tau1, zero)
        lv_out[:] = w - (gate0 * s0) * v - (gate1 * s1) * v1
        lv_out[k : k + 1, :] = jnp.where(
            d_eq, beta, jnp.where(d_gt, x * inv_denom, x)
        )
        lv_out[k + 1 : k + 2, :] = jnp.where(
            d_eq1, beta1, jnp.where(d_gt1, x1 * inv_denom1, x1)
        )

        z0 = jnp.where(row_ids < k, s0, zero)
        t_row_insert(k, tau, z0)
        z1 = jnp.where(
            row_ids < k, s1r, jnp.where(row_ids == k, c01, zero)
        )
        t_row_insert(k + 1, tau1, z1)


def _leaf_lq(slab, off, *, leaf: int, interpret: bool = False,
             pair: bool = False):
    """Run the wide leaf kernel on one (leaf, cols) slab.

    ``off`` (diagonal lane offset) may be a traced int32 scalar — it enters
    the kernel through SMEM, not as a compile-time constant.
    """
    cols = slab.shape[1]
    dtype = slab.dtype
    kernel = functools.partial(_leaf_lq_kernel, leaf=leaf, pair=pair)
    extra = {}
    if _HAS_PLTPU and not interpret:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        # the default 16 MB scoped-vmem limit is too tight for the unrolled
        # column loop's live temporaries at wide slabs; v5e has 128 MB VMEM
        slab_bytes = cols * leaf * slab.dtype.itemsize
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(110 * 2**20, 10 * slab_bytes + 2**21)
        )
    else:
        in_specs = [
            pl.BlockSpec((1,), lambda: (0,)),
            pl.BlockSpec(slab.shape, lambda: (0, 0)),
        ]
        out_specs = (
            pl.BlockSpec((leaf, cols), lambda: (0, 0)),
            pl.BlockSpec((leaf, leaf), lambda: (0, 0)),
        )
    off_arr = jnp.asarray(off, jnp.int32).reshape((1,))
    lv, t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((leaf, cols), dtype),
            jax.ShapeDtypeStruct((leaf, leaf), dtype),
        ),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret or not _HAS_PLTPU,
        **extra,
    )(off_arr, slab)
    return lv, t


def _dot_nt(a, b, precision):
    """a @ b^T without materializing the transpose."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=a.dtype,
        precision=_PRECISIONS[precision],
    )


# ---------------------------------------------------------------------------
# Block panel kernel: the FULL (block, cols) panel factorization — leaf
# column loops, intra-block trailing updates, and the block-wide compact-WY
# T^T — in ONE Pallas kernel invocation.
#
# Motivation (round 3, docs/SCALE.md roofline): at N <= 2048 the sweep is
# dispatch-bound, not MXU-bound — the leaf-kernel form issues ~15 XLA ops
# per block (4 leaf calls, 3 merge chains, slices/updates), each a
# microsecond-scale launch on millisecond-scale steps. Fusing the whole
# panel into one kernel cuts the per-block op count ~5x at identical FLOPs
# and identical arithmetic (same column steps, same leaf-merge order, same
# `highest`-precision dots — factors match the leaf form to roundoff).
# ---------------------------------------------------------------------------


def _block_lq_kernel(off_in, w_in, lv_out, t_out, *, leaf, block, precision,
                     pair=False):
    """Householder LQ of a (block, cols) wide panel, diagonal at lane
    ``off + row``.

    ``off_in``: (1,) int32 SMEM scalar — diagonal lane offset of panel row 0
    (runtime value: one compiled kernel serves every block position of the
    scan-bodied sweep, exactly like :func:`_leaf_lq_kernel`).

    ``lv_out``: (block, cols) — L values at lanes <= off + row, reflector
    tails at lanes > off + row (unit diagonals implicit).
    ``t_out``: (block, block) — block-wide T^T (lower triangular, tau on the
    diagonal) of the compact WY ``Q = I - V^T T V`` (V rows = reflectors).

    Structure per ``leaf`` rows: the column loop is the exact
    :func:`_leaf_lq_kernel` recurrence (static unroll, full-width masked VPU
    ops); afterwards the leaf's T^T merges into the block T^T and the
    remaining panel rows take one rank-``leaf`` MXU trailing update — the
    same dataflow the driver runs across kernels in the leaf form, here
    fused on-chip.

    ``pair=True`` forms TWO reflectors per slab pass: reflector ``k`` is
    applied to row ``k+1`` alone (one (1, cols) pass), reflector ``k+1`` is
    formed from that row, and the slab takes ONE combined rank-2 update
    (``s'_{k+1} = W v_{k+1} - tau_k (v_k . v_{k+1}) W v_k`` — the standard
    rank-2 composition, algebraically identical to two sequential rank-1
    updates). The column loop's serial slab passes halve — at small N the
    sweep is bound by exactly those (leaf, cols) VPU passes, not FLOPs
    (docs/SCALE.md roofline: N=512 runs at 0.60x of the precision ceiling
    on the single-column form).
    """
    cols = w_in.shape[1]
    dtype = w_in.dtype
    off = off_in[0]
    lv_out[:] = w_in[:]
    t_out[:] = jnp.zeros((block, block), dtype)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cols), 1)
    row_ids_leaf = jax.lax.broadcasted_iota(jnp.int32, (leaf, 1), 0)
    t_rows = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 0)
    t_lanes = jax.lax.broadcasted_iota(jnp.int32, (leaf, leaf), 1)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)

    def reflectors(rows_slab, first_row):
        """Masked reflector rows (unit diagonal explicit) of stored rows."""
        h = rows_slab.shape[0]
        rr = jax.lax.broadcasted_iota(jnp.int32, (h, cols), 0) + first_row
        ll = jax.lax.broadcasted_iota(jnp.int32, (h, cols), 1)
        diag = ll - off
        return jnp.where(
            diag > rr, rows_slab, jnp.where(diag == rr, one, zero)
        ).astype(dtype)

    def reflector_parts(x, row):
        """(v, beta, tau, inv_denom) of the Householder reflector that
        annihilates row ``x`` past diagonal lane ``off + row``."""
        d_eq = lane_ids == off + row
        d_gt = lane_ids > off + row
        alpha = jnp.sum(jnp.where(d_eq, x, zero))
        sigma = jnp.sum(jnp.where(d_gt, x * x, zero))
        norm = jnp.sqrt(alpha * alpha + sigma)
        sign = jnp.where(alpha >= 0, one, -one)
        beta = -sign * norm
        denom = alpha - beta
        safe = norm > 0
        inv_denom = jnp.where(safe, one / jnp.where(safe, denom, one), zero)
        tau = jnp.where(
            safe, (beta - alpha) / jnp.where(safe, beta, one), zero
        )
        v = jnp.where(d_gt, x * inv_denom, jnp.where(d_eq, one, zero))
        return v, beta, tau, inv_denom, d_eq, d_gt

    def t_row_insert(tT_leaf, k, tau, z):
        """Insert row ``k`` of the leaf T^T: ``-tau * z^T T^T`` at lanes
        < k, ``tau`` on the diagonal (z: (leaf, 1) = V_{0..k-1} . v_k)."""
        tT_row = -tau * jnp.sum(z * tT_leaf, axis=0, keepdims=True)
        t_col_new = jnp.where(
            t_lanes == k, tau, jnp.where(t_lanes < k, tT_row, zero)
        )
        return jnp.where(t_rows == k, t_col_new, tT_leaf)

    if pair and leaf % 2:
        raise ValueError(f"pair=True requires an even leaf, got {leaf}")

    for jl in range(0, block, leaf):
        tT_leaf = jnp.zeros((leaf, leaf), dtype)
        for k in range(0, leaf, 2 if pair else 1):
            row = jl + k
            x = lv_out[row : row + 1, :]  # (1, cols) static sublane slice
            v, beta, tau, inv_denom, d_eq, d_gt = reflector_parts(x, row)

            if not pair:
                w_leaf = lv_out[jl : jl + leaf, :]  # static slice
                s = jnp.sum(w_leaf * v, axis=1, keepdims=True)  # (leaf, 1)
                # rank-1 update with a per-row gate (tau for rows > k, else
                # 0): one fused FMA pass over the slab instead of FMA +
                # full-slab select; row k is overwritten by a row write
                gate = jnp.where(row_ids_leaf > k, tau, zero)  # (leaf, 1)
                lv_out[jl : jl + leaf, :] = w_leaf - (gate * s) * v
                lv_out[row : row + 1, :] = jnp.where(
                    d_eq, beta, jnp.where(d_gt, x * inv_denom, x)
                )

                # leaf-local T^T recurrence (row k): -tau z^T T^T, z = s[:k]
                z = jnp.where(row_ids_leaf < k, s, zero)  # (leaf, 1)
                tT_leaf = t_row_insert(tT_leaf, k, tau, z)
                continue

            # --- paired form: reflector k+1 from the singly-updated row,
            # then ONE rank-2 slab pass for both -------------------------
            row1 = row + 1
            x1_raw = lv_out[row1 : row1 + 1, :]
            s01 = jnp.sum(x1_raw * v)  # scalar: row_{k+1} . v_k
            x1 = x1_raw - (tau * s01) * v
            v1, beta1, tau1, inv_denom1, d_eq1, d_gt1 = reflector_parts(
                x1, row1
            )

            w_leaf = lv_out[jl : jl + leaf, :]
            s0 = jnp.sum(w_leaf * v, axis=1, keepdims=True)  # W v_k
            s1r = jnp.sum(w_leaf * v1, axis=1, keepdims=True)  # W v_{k+1}
            c01 = jnp.sum(v * v1)  # v_k . v_{k+1}
            s1 = s1r - (tau * c01) * s0  # (W - tau_k s0 v_k^T) v_{k+1}
            gate0 = jnp.where(row_ids_leaf > k + 1, tau, zero)
            gate1 = jnp.where(row_ids_leaf > k + 1, tau1, zero)
            lv_out[jl : jl + leaf, :] = (
                w_leaf - (gate0 * s0) * v - (gate1 * s1) * v1
            )
            lv_out[row : row + 1, :] = jnp.where(
                d_eq, beta, jnp.where(d_gt, x * inv_denom, x)
            )
            lv_out[row1 : row1 + 1, :] = jnp.where(
                d_eq1, beta1, jnp.where(d_gt1, x1 * inv_denom1, x1)
            )

            # T^T rows k and k+1. Row k+1's z needs V_j . v_{k+1}: rows
            # j < k read off s1r (their stored L lanes are below v1's
            # support, so only the reflector tails contribute — same
            # argument as the single-column form) and j = k is c01.
            z0 = jnp.where(row_ids_leaf < k, s0, zero)
            tT_leaf = t_row_insert(tT_leaf, k, tau, z0)
            z1 = jnp.where(
                row_ids_leaf < k, s1r,
                jnp.where(row_ids_leaf == k, c01, zero),
            )
            tT_leaf = t_row_insert(tT_leaf, k + 1, tau1, z1)

        # --- merge the leaf T^T into the block-wide T^T -------------------
        # Only full-lane-width row strips are written (sublane slicing is
        # cheap in Mosaic; lane slicing is not): the leaf T^T lands at lanes
        # jl..jl+leaf via a tiny selector matmul, the cross term fills lanes
        # < jl, and rows are stored with one strip write.
        v_leaf = reflectors(lv_out[jl : jl + leaf, :], jl)
        sel_rows = jax.lax.broadcasted_iota(jnp.int32, (leaf, block), 0)
        sel_lanes = jax.lax.broadcasted_iota(jnp.int32, (leaf, block), 1)
        sel = jnp.where(sel_lanes == jl + sel_rows, one, zero)  # (leaf, block)
        strip = jnp.dot(
            tT_leaf, sel, precision=_PRECISIONS[precision],
            preferred_element_type=dtype,
        )  # tT_leaf placed at lanes jl..jl+leaf
        if jl > 0:
            v_prev = reflectors(lv_out[:jl, :], 0)
            cross = jax.lax.dot_general(  # V2 V1^T, (leaf, jl)
                v_leaf, v_prev,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
                precision=_PRECISIONS[precision],
            )
            tT_prev = t_out[:jl, :]  # (jl, block) — support lanes < jl
            strip = strip - jnp.dot(
                jnp.dot(tT_leaf, cross, precision=_PRECISIONS[precision],
                        preferred_element_type=dtype),
                tT_prev, precision=_PRECISIONS[precision],
                preferred_element_type=dtype,
            )
        t_out[jl : jl + leaf, :] = strip

        # --- intra-panel trailing update (rows below this leaf) -----------
        rest_h = block - (jl + leaf)
        if rest_h > 0:
            rest = lv_out[jl + leaf : block, :]
            u = jax.lax.dot_general(  # rest @ V^T, (rest_h, leaf)
                rest, v_leaf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
                precision=_PRECISIONS[precision],
            )
            ut = jax.lax.dot_general(  # u @ (T^T)^T = u @ T
                u, tT_leaf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
                precision=_PRECISIONS[precision],
            )
            lv_out[jl + leaf : block, :] = rest - jnp.dot(
                ut, v_leaf, precision=_PRECISIONS[precision],
                preferred_element_type=dtype,
            )


def _block_lq(slab, off, *, leaf: int, block: int, interpret: bool = False,
              precision: str = "highest", pair: bool = False):
    """Run the block panel kernel on one (block, cols) slab.

    ``off`` may be a traced int32 scalar (SMEM), as in :func:`_leaf_lq`.
    """
    cols = slab.shape[1]
    dtype = slab.dtype
    kernel = functools.partial(
        _block_lq_kernel, leaf=leaf, block=block, precision=precision,
        pair=pair,
    )
    extra = {}
    if _HAS_PLTPU and not interpret:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        out_specs = (
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        slab_bytes = cols * block * slab.dtype.itemsize
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(110 * 2**20, 12 * slab_bytes + 2**23)
        )
    else:
        in_specs = [
            pl.BlockSpec((1,), lambda: (0,)),
            pl.BlockSpec(slab.shape, lambda: (0, 0)),
        ]
        out_specs = (
            pl.BlockSpec((block, cols), lambda: (0, 0)),
            pl.BlockSpec((block, block), lambda: (0, 0)),
        )
    off_arr = jnp.asarray(off, jnp.int32).reshape((1,))
    lv, t = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((block, cols), dtype),
            jax.ShapeDtypeStruct((block, block), dtype),
        ),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret or not _HAS_PLTPU,
        **extra,
    )(off_arr, slab)
    return lv, t


def _split_lv(lv, off: int):
    """(V_W with unit diagonal, rows = reflectors) from a wide leaf output."""
    leaf, cols = lv.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (leaf, cols), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (leaf, cols), 1)
    diag = lane_ids - off
    return jnp.where(
        diag > row_ids, lv, jnp.where(diag == row_ids, 1.0, 0.0)
    ).astype(lv.dtype)


def _blocked_lq_l_impl(
    W,
    *,
    leaf: int = 32,
    block: int = 128,
    lane_quant: int = 2048,
    superblocks: int = None,
    interpret: bool = False,
    precision: str = "highest",
    panel: str = "auto",
    band=None,
    pair_columns: bool = False,
):
    """Lower-triangular L of an LQ of wide ``W`` (rows <= cols), shape
    (rows, rows) — i.e. ``blocked_qr_r(W.T).T`` up to row signs, computed in
    the TPU-friendly wide orientation.

    Sweep structure (round 3): ``superblocks`` outer Python iterations, each
    running the row blocks of its strip through ONE ``lax.scan`` body. The
    scan body uses a runtime diagonal offset (SMEM scalar into the leaf
    kernel, dynamic slices elsewhere), so the traced graph is O(superblocks)
    regardless of the matrix size — the round-2 fully-unrolled sweep's ~1e3
    Pallas-call graph OOM-killed the relay's XLA compile helper at N=1e4 and
    took ~23 min to build at N=512 (docs/SCALE.md). The cost: within a
    superblock the trailing update spans the whole resident work matrix
    instead of the shrinking trail (finalized rows are annihilated exactly —
    their stored support ends strictly below the reflectors' first lane);
    shrinking still happens at superblock boundaries, so the FLOP overhead
    is ~1/(2*superblocks) of the sweep, ~6% at the default 8.

    Note on magnitudes: reflector norms are computed as ``sqrt(alpha^2 +
    sigma)`` without LAPACK-style rescaling, so rows with entries beyond
    ~sqrt(dtype_max) overflow and rows below ~sqrt(dtype_tiny) collapse to
    an identity reflector. The sqrt-Kalman factors this module serves are
    O(1)-scaled; rescale inputs before calling on general data.

    ``band=(b0, slope)`` declares that row ``r`` of ``W`` has EXACT zeros in
    every column ``>= b0 + slope * r`` (callers must guarantee it; wrong
    declarations silently corrupt the factor). The sweep then windows each
    superblock's slabs and trailing updates to the declared support — the
    omitted columns would only ever receive exact-zero updates, so the
    result matches the dense sweep to reduction-order roundoff while the
    trailing-update FLOPs drop from O(rows^2 * cols) to
    O(rows^2 * (b0 + slope * block)) early in the sweep. The two structured cases in this codebase: the propagate
    pre-array ``[A@Cl | Ql]`` with ``Ql`` lower-triangular (``band=(D, 1)``,
    no condition on ``Cl``), and its point-interleaved form (``band=(2n, 2)``
    via :func:`make_householder_propagate`'s ``interleave_q``, which
    additionally requires ``Cl`` lower-triangular). Band support survives
    the sweep: a reflector from rows ``<= r`` touches only columns inside
    row ``r``'s own declared support (slope >= 1).
    """
    Nr, M = W.shape
    if M < Nr:
        raise ValueError(f"blocked_lq_l requires cols >= rows, got {W.shape}")
    block = _roundup(max(block, leaf), leaf)
    dtype = W.dtype

    n_pad = _roundup(Nr, block)
    m_pad = max(M, n_pad)
    W = jnp.pad(W, ((0, n_pad - Nr), (0, m_pad - M)))
    nb = n_pad // block
    if superblocks is None:
        # auto policy, measured on v5e (docs/SCALE.md round 3): the fully
        # unrolled sweep (superblocks = nb -> inline bodies, per-block
        # shrinking) is ~1.4x faster per call and its graph compiles fine up
        # to ~512 Pallas calls; beyond that the scan form caps the graph at
        # O(8) bodies (the relay's XLA compile helper dies near ~1e3 calls).
        # The block-panel kernel issues ONE call per block (the leaf form
        # issues block/leaf), so it stays unrolled 4x longer — past the
        # N=1e4 pre-array shapes, whose scan form costs ~6% extra sweep
        # FLOPs (full-span trailing updates between superblock shrinks).
        cols_q0 = max(_roundup(m_pad, lane_quant), block)
        first_is_block = panel == "block" or (
            panel == "auto"
            and block * cols_q0 * W.dtype.itemsize <= 4_718_592
        )
        if first_is_block:
            # block-panel form: one call per block AND slabs bounded at
            # 4.5 MB (cols <= ~9k), so the unrolled graph stays small —
            # cap on call count alone
            superblocks = nb if nb <= 320 else 8
        else:
            # leaf form at large shapes: the relay's compile helper dies on
            # big unrolled graphs (measured: 316 leaf calls at 40k-wide
            # slabs SIGKILL it; ~512 calls at 4k-wide compile fine) — keep
            # the proven shape bound from the round-3 first session
            superblocks = nb if n_pad <= 16384 else 8
    sb_blocks = max(1, -(-nb // max(1, superblocks)))

    work = W
    # L strips are harvested per superblock and ASSEMBLED ONLY AT THE END:
    # carrying the (n_pad, n_pad) L buffer through the sweep put it
    # alongside the full work matrix and the trailing-update temp — the
    # ~3.6 GB that OOMed the N=1e4 initialization on a 16 GB chip. The
    # barrier per superblock still materializes each strip into its own
    # buffer (a lazy slice would keep the whole superblock's work alive —
    # the 90 GB liveness trap documented in blocked_qr_r).
    strips = []
    done = 0
    while done < n_pad:
        rows_w = n_pad - done
        cols_w = m_pad - done
        blocks_here = min(sb_blocks, rows_w // block)
        S = blocks_here * block
        # Banded input: window this superblock's work to the declared row
        # support (quantized so superblocks share Mosaic shapes). Shrinking
        # by ``done`` rows+cols shifts the band intercept by (slope-1)*done.
        if band is not None:
            b0_cur = band[0] + (band[1] - 1) * done
            win = min(
                cols_w,
                max(_roundup(b0_cur + band[1] * S, lane_quant), block),
            )
        else:
            win = cols_w
        if win < cols_w:
            # columns beyond the window hold later rows' (untouched) support
            work_r = jax.lax.slice(work, (0, win), (rows_w, cols_w))
            work = jax.lax.slice(work, (0, 0), (rows_w, win))
        else:
            work_r = None
        # kernel slab lanes quantized so superblocks share Mosaic shapes
        cols_q = max(_roundup(win, lane_quant), block)
        # Panel-form resolution: the block-panel kernel holds the whole
        # (block, cols) slab in VMEM through an unrolled 128-column program
        # whose live temporaries cost ~10x the slab — measured: a 2 MB slab
        # compiles at a 16 MB scoped limit, a 31 MB slab demands 118 MB and
        # exceeds the 128 MB chip VMEM (the N=1e4 init shape). "auto" uses
        # the fused block kernel only where it fits with headroom and the
        # leaf kernel (slab = leaf rows, 4x smaller) beyond.
        slab_bytes = block * cols_q * W.dtype.itemsize
        use_block = panel == "block" or (
            panel == "auto" and slab_bytes <= 4_718_592  # 4.5 MB
        )

        def body(work, blk_idx, cols_w=win, cols_q=cols_q,
                 use_block=use_block):
            off = blk_idx * block
            zero_i = jnp.zeros((), off.dtype)
            blk = jax.lax.dynamic_slice(work, (off, zero_i), (block, cols_w))

            if use_block:
                # --- whole-panel Pallas kernel (leaf loops, intra-panel
                # trailing updates, block-wide T^T — one launch per block) --
                slab = blk
                if cols_q > cols_w:
                    slab = jnp.pad(slab, ((0, 0), (0, cols_q - cols_w)))
                lv, tT_blk = _block_lq(
                    slab, off, leaf=leaf, block=block, interpret=interpret,
                    precision=precision, pair=pair_columns,
                )
                blk = jax.lax.slice(lv, (0, 0), (block, cols_w))
                v_blk = _split_lv(blk, off)  # (block, cols_w) reflector rows
            else:
                # --- factor the block rows, leaf by leaf ------------------
                vs, ts = [], []
                for jl in range(0, block, leaf):
                    slab = jax.lax.slice(blk, (jl, 0), (jl + leaf, cols_w))
                    if cols_q > cols_w:
                        slab = jnp.pad(slab, ((0, 0), (0, cols_q - cols_w)))
                    lv, t = _leaf_lq(
                        slab, off + jl, leaf=leaf, interpret=interpret,
                        pair=pair_columns,
                    )
                    lv = jax.lax.slice(lv, (0, 0), (leaf, cols_w))
                    blk = jax.lax.dynamic_update_slice(blk, lv, (jl, 0))
                    v = _split_lv(lv, off + jl)  # (leaf, cols_w) reflectors
                    rest_h = block - (jl + leaf)
                    if rest_h > 0:
                        rest = jax.lax.slice(
                            blk, (jl + leaf, 0), (block, cols_w)
                        )
                        u = _dot_nt(rest, v, precision)  # (rest_h, leaf)
                        # t stores T^T: U T = U (T^T)^T
                        rest = rest - _dot(
                            _dot_nt(u, t, precision), v, precision
                        )
                        blk = jax.lax.dynamic_update_slice(
                            blk, rest, (jl + leaf, 0)
                        )
                    vs.append(v)
                    ts.append(t)

                # --- merge leaf reflectors into one block-wide compact WY -
                v_blk = jnp.concatenate(vs, axis=0) if len(vs) > 1 else vs[0]
                tT_blk = ts[0]
                for i in range(1, len(ts)):
                    w1 = tT_blk.shape[0]
                    v1 = jax.lax.slice(v_blk, (0, 0), (w1, cols_w))
                    cross = _dot_nt(v1, vs[i], precision)  # (w1, leaf)
                    # T^T12 = -T2^T cross^T T1^T
                    t12T = -_dot(
                        _dot(ts[i], cross.T, precision), tT_blk, precision
                    )
                    tT_blk = jnp.concatenate(
                        (
                            jnp.concatenate(
                                (tT_blk, jnp.zeros((w1, leaf), dtype)), axis=1
                            ),
                            jnp.concatenate((t12T, ts[i]), axis=1),
                        ),
                        axis=0,
                    )

            # finalized block rows: L values only, reflector tails zeroed —
            # the exact zeros above the diagonal are what annihilates these
            # rows under every later block's trailing update
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (block, cols_w), 0)
            lane_ids = jax.lax.broadcasted_iota(jnp.int32, (block, cols_w), 1)
            blk_final = jnp.where(
                lane_ids <= off + row_ids, blk, jnp.zeros((), dtype)
            )

            # --- one trailing update over the whole resident matrix -------
            # (rows above the block contribute exactly zero, the block's own
            # rows are overwritten right after)
            u = _dot_nt(work, v_blk, precision)  # (rows_w, block)
            work = work - _dot(_dot_nt(u, tT_blk, precision), v_blk, precision)
            work = jax.lax.dynamic_update_slice(work, blk_final, (off, zero_i))
            return work

        if blocks_here == 1:
            work = body(work, jnp.asarray(0, jnp.int32))
        else:
            work, _ = jax.lax.scan(
                lambda c, i: (body(c, i), None),
                work,
                jnp.arange(blocks_here, dtype=jnp.int32),
            )

        # --- harvest the superblock's L strips, then shrink ---------------
        # Finalized L rows have support <= their diagonal < S <= win, so a
        # windowed sweep's missing top columns are exact zeros.
        top_w = min(rows_w, win)
        top = jax.lax.slice(work, (0, 0), (S, top_w))
        if top_w < rows_w:
            top = jnp.pad(top, ((0, 0), (0, rows_w - top_w)))
        if S < rows_w:
            below = jax.lax.slice(work, (S, 0), (rows_w, S))
            new_work = jax.lax.slice(work, (S, S), (rows_w, win))
            if work_r is not None:
                new_work = jnp.concatenate(
                    (
                        new_work,
                        jax.lax.slice(work_r, (S, 0), (rows_w, cols_w - win)),
                    ),
                    axis=1,
                )
            new_work, top, below = jax.lax.optimization_barrier(
                (new_work, top, below)
            )
            strips.append((done, top, below))
            work = new_work
        else:
            (top,) = jax.lax.optimization_barrier((top,))
            strips.append((done, top, None))
            work = work[:0, :0]
        done += S

    L = jnp.zeros((n_pad, n_pad), dtype)
    for off, top, below in strips:
        L = jax.lax.dynamic_update_slice(L, top, (off, off))
        if below is not None:
            L = jax.lax.dynamic_update_slice(
                L, below, (off + top.shape[0], off)
            )
    return L[:Nr, :Nr]


# Public jitted entry point; hooks call the impl directly (see blocked_qr_r).
blocked_lq_l = jax.jit(
    _blocked_lq_l_impl,
    static_argnames=(
        "leaf", "block", "lane_quant", "superblocks", "interpret",
        "precision", "panel", "band", "pair_columns",
    ),
)


# ---------------------------------------------------------------------------
# Factorization hook for the white-noise step (sqrt.fused_predict_update
# contract: see pnmol_tpu/solvers/white.py `factorization=`).
# ---------------------------------------------------------------------------


def make_householder_factorization(
    *, leaf: int = 32, block: int = 128, row_quant: int = 2048,
    interpret: bool = False, precision: str = "highest",
):
    """A ``factorization=`` hook running the pre-array QR through
    :func:`blocked_qr_r` instead of XLA's QR.

    Same contract as :func:`pnmol_tpu.ops.sqrt.fused_predict_update`:
    ``(HACl, ACl, HQl, Ql, R) -> (posterior_factor, gain, innovation_factor)``.
    """

    def factorization(HACl, ACl, HQl, Ql, meascov_sqrtm):
        m, D = HACl.shape
        top = jnp.concatenate((HACl.T, ACl.T), axis=1)
        mid = jnp.concatenate((HQl.T, Ql.T), axis=1)
        bottom = jnp.concatenate(
            (meascov_sqrtm.T, jnp.zeros((m, D), dtype=HACl.dtype)), axis=1
        )
        pre = jnp.concatenate((top, mid, bottom), axis=0)  # (2D + m, m + D)
        R = _blocked_qr_r_impl(
            pre, leaf=leaf, block=block, row_quant=row_quant,
            interpret=interpret, precision=precision,
        )
        R1 = R[:m, :m]
        R2 = R[:m, m:]
        R3 = R[m:, m:]
        gain = jax.scipy.linalg.solve_triangular(R1, R2, lower=False).T
        return R3.T, gain, R1.T

    return factorization



def _gain_solve_lower(L1, L21, precision):
    """gain = (L21 L1^T)(L1 L1^T)^{-1} = L21 L1^{-1} via L1^T X = L21^T.

    Size-gated blocked substitution: XLA's triangular-solve expander plans
    ~18 live (m, m) temporaries for a wide RHS (~7 GB at m = 1e4, measured
    via memory_analysis) — the blocked panel solve is O(matrix).
    """
    m = L1.shape[0]
    if m >= 4096:
        from pnmol_tpu.ops import trisolve

        return trisolve.tri_solve_lower_blocked(L1, L21.T, transpose=True).T
    return jax.scipy.linalg.solve_triangular(L1, L21.T, lower=True, trans=1).T


def make_householder_update_from_products(
    *, leaf: int = 32, block: int = 128, lane_quant: int = 2048,
    superblocks=None, interpret: bool = False, precision: str = "highest",
    panel: str = "auto", pair_columns: bool = False,
):
    """Householder-LQ drop-in for
    :func:`pnmol_tpu.ops.sqrt.update_sqrt_from_products`:
    ``(HC, C, R) -> (posterior_factor, gain, innovation_factor)`` with the
    pre-array transpose ``[[HC, R], [C, 0]]`` assembled transpose-free.
    Used by the solver initialization (its ``(D+m) x (m+D)`` QR is the
    single-chip memory peak at large N) and valid anywhere the dense-tier
    function is."""

    def _blocks(HC, C, meascov_sqrtm, band):
        m, D = HC.shape
        top = jnp.concatenate((HC, meascov_sqrtm), axis=1)
        bottom = jnp.concatenate(
            (C, jnp.zeros((D, m), dtype=C.dtype)), axis=1
        )
        W = jnp.concatenate((top, bottom), axis=0)  # (m + D, D + m)
        L = _blocked_lq_l_impl(
            W, leaf=leaf, block=block, lane_quant=lane_quant,
            superblocks=superblocks, interpret=interpret, precision=precision,
            panel=panel, band=band, pair_columns=pair_columns,
        )
        return L[m:, m:], L[m:, :m], L[:m, :m]  # (L3, L21, L1)

    def blocks(HC, C, meascov_sqrtm):
        return _blocks(HC, C, meascov_sqrtm, None)

    def blocks_banded(HC, C, meascov_sqrtm):
        """As ``blocks``, with the measurement-noise factor declared
        LOWER-TRIANGULAR (true throughout this framework: diagonal FD
        ``E_sqrtm``, Cholesky collocation factors, diagonal/zero BC noise):
        top row ``i`` of ``[[HC, R], [C, 0]]`` then ends at column ``D + i``
        and the bottom rows end before ``D``, so the sweep runs with
        ``band=(D+1, 1)`` — the m-column tail of every trailing update
        disappears (~15% of the update FLOPs at m ~ D/2). No condition on
        ``C``."""
        return _blocks(HC, C, meascov_sqrtm, (HC.shape[1] + 1, 1))

    def update(HC, C, meascov_sqrtm):
        L3, L21, L1 = blocks(HC, C, meascov_sqrtm)
        gain = _gain_solve_lower(L1, L21, precision)
        return L3, gain, L1

    # raw factor blocks (no gain solve): the step-level mean update only
    # needs K @ z = L21 @ (L1^{-1} z) — see sqrt.update_sqrt_from_products_blocks
    update.blocks = blocks
    update.blocks_banded = blocks_banded
    return update


def make_householder_propagate(
    *, leaf: int = 32, block: int = 128, lane_quant: int = 2048,
    superblocks=None, interpret: bool = False, precision: str = "highest",
    panel: str = "auto", pair_columns: bool = False,
):
    """Householder-LQ drop-in for
    :func:`pnmol_tpu.ops.sqrt.propagate_cholesky_factor`: the Cholesky-like
    factor of ``S1 S1^T + S2 S2^T`` from one LQ of ``[S1 S2]`` — no
    transposes, L returned lower-triangular directly.

    The returned callable carries two structured variants exploiting the
    sqrt-Kalman propagate's triangular blocks (``band=`` in
    :func:`blocked_lq_l`):

    * ``propagate.banded(S1, S2)`` — requires ``S2`` lower-triangular
      (always true for the point-major process-noise factor
      ``kron(chol_gram, LQ1d)``): row ``r`` of ``[S1 | S2]`` ends at column
      ``D + r``, cutting the dense sweep's trailing FLOPs by ~40%.
    * ``propagate.interleaved(S1, S2, q)`` — additionally requires ``S1``
      block-banded with ``q x q`` point blocks (true for ``A @ Cl`` in the
      point-major layout with ``Cl`` lower-triangular, since
      ``kron(I_d, A1d)`` is point-block-diagonal). Interleaving the two
      factors' point blocks gives row support ``<= 2r + q`` — the LQ of an
      effectively banded matrix, ~5x fewer FLOPs than the dense sweep.

    Both perform the dense sweep's arithmetic on the touched columns (the
    windowed-out columns only ever receive exact-zero updates; results agree
    to reduction-order roundoff), verified in
    tests/test_ops/test_qr_householder.py.
    """
    kw = dict(
        leaf=leaf, block=block, lane_quant=lane_quant,
        superblocks=superblocks, interpret=interpret, precision=precision,
        panel=panel, pair_columns=pair_columns,
    )

    def propagate(S1, S2):
        return _blocked_lq_l_impl(jnp.concatenate((S1, S2), axis=1), **kw)

    def banded(S1, S2):
        # row r's last nonzero is the S2 diagonal at column D1 + r
        return _blocked_lq_l_impl(
            jnp.concatenate((S1, S2), axis=1), band=(S1.shape[1] + 1, 1), **kw
        )

    def interleaved(S1, S2, q):
        D, D1 = S1.shape
        d = D1 // q
        # interleave point blocks via a constant COLUMN PERMUTATION of the
        # concatenated pre-array — never through a (D, d, q) reshape: a
        # trailing dim of q=2 gets padded to the 128-lane tile on TPU, a
        # 64x memory blowup (compile-time OOM observed at D=2e4: the
        # f32[2e4,1e4,2] copy "would exceed memory" at 102.4 GB)
        idx = np.arange(d)[:, None] * q + np.arange(q)[None, :]  # (d, q)
        perm = np.concatenate((idx, D1 + idx), axis=1).reshape(-1)
        M = jnp.concatenate((S1, S2), axis=1)[:, perm]
        return _blocked_lq_l_impl(M, band=(2 * q, 2), **kw)

    propagate.banded = banded
    propagate.interleaved = interleaved
    return propagate


def make_householder_lq_factorization(
    *, leaf: int = 32, block: int = 128, lane_quant: int = 2048,
    superblocks=None, interpret: bool = False, precision: str = "highest",
    panel: str = "auto", pair_columns: bool = False,
):
    """A ``factorization=`` hook running the pre-array factorization in the
    wide (LQ) orientation of :func:`blocked_lq_l` — the TPU-preferred form:
    the pre-array transpose assembles with NO transposes of the big factors
    and every kernel op runs at full lane width.

    Same contract as :func:`pnmol_tpu.ops.sqrt.fused_predict_update`. The
    returned hook additionally carries ``.propagate`` and
    ``.update_from_products`` attributes (the two-QR pipeline's primitives),
    so the solvers can route the memory-lighter non-fused path through the
    same factorization — at the largest single-chip N the fused pre-array
    is the HBM peak and the two-QR split is what fits.
    """

    def _blocks(HACl, ACl, HQl, Ql, meascov_sqrtm, band):
        m, D = HACl.shape
        # W = pre_array^T = [[HACl, HQl, E], [ACl, Ql, 0]]  ((m+D) x (2D+m))
        top = jnp.concatenate((HACl, HQl, meascov_sqrtm), axis=1)
        bottom = jnp.concatenate(
            (ACl, Ql, jnp.zeros((D, m), dtype=HACl.dtype)), axis=1
        )
        W = jnp.concatenate((top, bottom), axis=0)
        L = _blocked_lq_l_impl(
            W, leaf=leaf, block=block, lane_quant=lane_quant,
            superblocks=superblocks, interpret=interpret, precision=precision,
            panel=panel, band=band, pair_columns=pair_columns,
        )
        # (posterior L3, cross L21, innovation L1) — all lower, directly
        return L[m:, m:], L[m:, :m], L[:m, :m]

    def blocks(HACl, ACl, HQl, Ql, meascov_sqrtm):
        return _blocks(HACl, ACl, HQl, Ql, meascov_sqrtm, None)

    def blocks_banded(HACl, ACl, HQl, Ql, meascov_sqrtm):
        """Fused pre-array with the measurement-noise factor declared
        LOWER-TRIANGULAR: top row ``i`` ends at column ``2D + i`` (E's
        triangle), bottom rows before ``2D`` — band=(2D+1, 1) windows the
        m-column tail out of every trailing update."""
        return _blocks(
            HACl, ACl, HQl, Ql, meascov_sqrtm, (2 * HACl.shape[1] + 1, 1)
        )

    def factorization(HACl, ACl, HQl, Ql, meascov_sqrtm):
        L3, L21, L1 = blocks(HACl, ACl, HQl, Ql, meascov_sqrtm)
        # gain = S_xz S_zz^{-1} = (L21 L1^T)(L1 L1^T)^{-1} = L21 L1^{-1}
        gain = _gain_solve_lower(L1, L21, precision)
        return L3, gain, L1

    # raw factor blocks (no gain solve): the step-level mean update only
    # needs K @ z = L21 @ (L1^{-1} z), where L1^{-1} z is the whitened
    # residual the diffusion calibration computes anyway
    factorization.blocks = blocks
    factorization.blocks_banded = blocks_banded

    def tri(C):
        """Lower-triangular factor with C's Gram (one LQ). Used by the
        solvers to re-triangularize the init covariance factor before
        enabling the interleaved banded propagate."""
        return _blocked_lq_l_impl(
            C, leaf=leaf, block=block, lane_quant=lane_quant,
            superblocks=superblocks, interpret=interpret,
            precision=precision, panel=panel, pair_columns=pair_columns,
        )

    factorization.tri = tri

    factorization.propagate = make_householder_propagate(
        leaf=leaf, block=block, lane_quant=lane_quant,
        superblocks=superblocks, interpret=interpret, precision=precision,
        panel=panel, pair_columns=pair_columns,
    )
    factorization.update_from_products = make_householder_update_from_products(
        leaf=leaf, block=block, lane_quant=lane_quant,
        superblocks=superblocks, interpret=interpret, precision=precision,
        panel=panel, pair_columns=pair_columns,
    )
    return factorization
