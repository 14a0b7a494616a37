"""Profiling and work accounting.

Upgrades the reference's ``time.time()``-around-the-solver pattern
(``/root/reference/experiments/figure3.py:43-46``) to first-class tools:
``jax.profiler`` trace capture (Perfetto/XProf-compatible), a blocking timer,
and analytic FLOP accounting for the sqrt-Kalman step so benchmarks can
report hardware utilization (BASELINE.md metric of record: sqrt-Kalman QR
GFLOP/s).
"""

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in Perfetto / TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Timer:
    """Blocking wall-clock timer for jitted computations."""

    def __init__(self):
        self.elapsed = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        return False


def time_blocked(fn, *args, repeats=3, **kwargs):
    """Best-of-N wall clock of ``fn`` with ``block_until_ready`` semantics."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)  # warmup / compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return out, best


def qr_flops(rows: int, cols: int) -> float:
    """Householder QR flop count: 2 r c^2 - (2/3) c^3 (r >= c)."""
    return 2.0 * rows * cols**2 - (2.0 / 3.0) * cols**3


def lq_sweep_flops(rows: int, cols: int, *, b0: int = None,
                   slope: float = 1.0) -> float:
    """Householder LQ sweep FLOPs of a (rows, cols) pre-array whose row
    ``r`` has column support ``min(b0 + slope * r, cols)``.

    ``b0=None`` means dense (support = cols everywhere) and reproduces
    :func:`qr_flops` of the transposed problem. Counts the standard
    4 * (rows_below) * (reflector_length) trailing-update work per
    reflector — the term the banded/interleaved structured sweeps window
    (``ops/qr_householder.py``; docs/SCALE.md "Banded/interleaved
    structured LQ").

    Note on orientation: an LQ of an (n_rows, n_cols) WIDE matrix is the
    QR of its transpose, so a caller holding a (D, 2D) propagate pre-array
    passes ``rows=D, cols=2D`` here (vs ``qr_flops(2D, D)``).
    """
    import numpy as np

    k = np.arange(min(rows, cols), dtype=np.float64)
    if b0 is None:
        support = np.full_like(k, float(cols))
    else:
        support = np.minimum(b0 + slope * k, float(cols))
    reflector = np.maximum(support - k, 0.0)
    return float(np.sum(4.0 * (rows - k) * reflector))


#: Pipelines of the white-noise step, matching the solver's dispatch
#: (solvers/white.py): "fused" = single pre-array LQ; "two_qr" = separate
#: propagate + update factorizations; "banded"/"interleaved" = two-QR with
#: the structured sweeps; "steady" = the mean-only stationary step.
WHITE_PIPELINES = ("fused", "two_qr", "banded", "interleaved", "steady")


def white_step_flops(d: int, nu: int, b: int,
                     pipeline: str = "fused") -> float:
    """Approximate FLOPs of one white-noise EK1 step, PER PIPELINE.

    d grid points, nu derivatives (n = nu + 1, D = n d), b boundary rows.
    The factorization volume differs by ~5x between pipelines (fused
    single LQ vs interleaved banded sweeps), so effective-TFLOP/s and MFU
    are only meaningful against the model of the pipeline that actually
    ran — mixing them over-credits the two-QR configurations by ~2x
    (the round-3 SCALE.md N=1e4 row nominally exceeded its own precision
    ceiling for exactly this reason).
    """
    n = nu + 1
    D = n * d
    m = d + b
    if pipeline == "steady":
        # mean-only stationary step: transition + residual products +
        # whiten matvec + gain matvec; no factorization at all
        return (2.0 * n * n * d + 2.0 * d * d + 2.0 * m * m
                + 2.0 * D * m)
    h_products = 3 * (2.0 * d * d * D)  # H @ {ACl, Ql} and error-estimate S
    gain = 2.0 * D * m
    transition = 2.0 * n * n * d * D  # kron(I, A_1d) batched matmul
    other = h_products + gain + transition
    if pipeline == "fused":
        return qr_flops(2 * D + m, m + D) + other
    # two-QR split: propagate LQ of the (D, 2D) pre-array [A Cl | Ql],
    # then update LQ of the ((m+D), (m+D)) pre-array
    if pipeline == "two_qr":
        fact = lq_sweep_flops(D, 2 * D) + lq_sweep_flops(m + D, m + D)
    elif pipeline == "banded":
        # Ql lower-triangular: propagate support D + r + 1 (~40% fewer
        # trailing FLOPs); E_bc lower-triangular: update support D + r + 1
        # (~15% fewer at m ~ D/2)
        fact = (
            lq_sweep_flops(D, 2 * D, b0=D + 1, slope=1.0)
            + lq_sweep_flops(m + D, m + D, b0=D + 1, slope=1.0)
        )
    elif pipeline == "interleaved":
        # both propagate factors triangular, point blocks interleaved:
        # support 2r + n (~5x fewer sweep FLOPs in the large-D limit)
        fact = (
            lq_sweep_flops(D, 2 * D, b0=n, slope=2.0)
            + lq_sweep_flops(m + D, m + D, b0=D + 1, slope=1.0)
        )
    else:
        raise ValueError(
            f"unknown pipeline {pipeline!r}; one of {WHITE_PIPELINES}"
        )
    return fact + other


def steps_per_sec_to_gflops(steps_per_sec: float, d: int, nu: int, b: int,
                            pipeline: str = "fused") -> float:
    return steps_per_sec * white_step_flops(d, nu, b, pipeline) / 1e9


def roofline(d: int, nu: int, b: int, *, fused: bool = True,
             pipeline: str = None,
             mxu_highest_tflops: float = 15.0,
             mxu_default_tflops: float = 90.0,
             bf16_peak_tflops: float = 197.0) -> dict:
    """Analytic roofline of one white-noise EK1 step on a v5e chip.

    The step is QR-bound, and the QR's FLOPs are almost entirely compact-WY
    trailing updates — matmuls that MUST run at explicit ``highest``
    precision (six bf16 MXU passes; anything less injects ~1e-3-relative
    noise into the factor, docs/SCALE.md). The measured v5e throughputs:
    ~15 TFLOP/s at ``highest``, ~90 at the 1-pass default, 197 bf16 peak.

    Consequence: the MFU-vs-bf16-peak of a CORRECT f32 sqrt-Kalman step can
    never exceed ``mxu_highest_tflops / bf16_peak_tflops`` (~7.6%) times
    the QR's share of step FLOPs — that is the number the measured MFU
    should be compared against, not 100%.

    Returns the ceiling steps/s and the expected MFU at the ceiling.
    ``pipeline`` (preferred over the legacy ``fused`` flag) selects the
    matching per-pipeline FLOP model — see :func:`white_step_flops`.
    """
    n = nu + 1
    D = n * d
    m = d + b
    if pipeline is None:
        pipeline = "fused" if fused else "two_qr"
    if pipeline == "steady":
        raise ValueError(
            "the steady step has no factorization; its ceiling is the "
            "HBM/dispatch floor, not the MXU — use "
            "white_step_flops(..., 'steady') directly"
        )
    other = white_step_flops(d, nu, b, "fused") - qr_flops(2 * D + m, m + D)
    qr = white_step_flops(d, nu, b, pipeline) - other
    total = qr + other
    # QR trailing updates at `highest`; the H-products/transition tolerate
    # the default 1-pass precision
    t_ceiling = qr / (mxu_highest_tflops * 1e12) + other / (
        mxu_default_tflops * 1e12
    )
    steps_ceiling = 1.0 / t_ceiling
    return {
        "qr_flops": qr,
        "other_flops": other,
        "qr_share": qr / total,
        "steps_per_sec_ceiling": steps_ceiling,
        "tflops_at_ceiling": total * steps_ceiling / 1e12,
        "mfu_ceiling_vs_bf16_peak": total * steps_ceiling / (
            bf16_peak_tflops * 1e12
        ),
    }

def force_complete(tree):
    """Force REAL completion of every array in ``tree`` via a data-dependent
    scalar pull. ``block_until_ready`` can return before remote (relay)
    device work completes — observed impossible multi-TB/s readings on the
    axon tunnel — so timing code must read a value that depends on the
    result instead."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            # sum of a flat slice: O(n) device work, one scalar transfer
            total += float(jnp.sum(jnp.ravel(leaf)[:: max(1, leaf.size // 4096)]))
    return total


class PhaseTimer:
    """Env-gated wall-clock breakdown of a multi-phase setup path.

    ``PhaseTimer(enabled)``: call ``timer(name, value)`` after each phase —
    when enabled it forces completion of ``value`` and records the seconds
    since the previous mark in ``timer.profile``; when disabled it is a
    zero-cost passthrough (no completion barrier is added)."""

    def __init__(self, enabled: bool):
        self.profile = {} if enabled else None
        self._last = time.perf_counter() if enabled else None

    def __call__(self, name, value):
        if self.profile is not None:
            force_complete(value)
            now = time.perf_counter()
            self.profile[name] = round(now - self._last, 3)
            self._last = now
        return value
