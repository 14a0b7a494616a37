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


def white_step_flops(d: int, nu: int, b: int) -> float:
    """Approximate FLOPs of one fused white-noise EK1 step.

    d grid points, nu derivatives (n = nu + 1, D = n d), b boundary rows.
    Dominant terms: the fused pre-array QR ((2D + m) x (m + D)), the three
    H-product matmuls (m x D through a (d x d) factor), and the gain apply.
    """
    n = nu + 1
    D = n * d
    m = d + b
    fused_qr = qr_flops(2 * D + m, m + D)
    h_products = 3 * (2.0 * d * d * D)  # H @ {ACl, Ql} and error-estimate S
    gain = 2.0 * D * m
    transition = 2.0 * n * n * d * D  # kron(I, A_1d) batched matmul
    return fused_qr + h_products + gain + transition


def steps_per_sec_to_gflops(steps_per_sec: float, d: int, nu: int, b: int) -> float:
    return steps_per_sec * white_step_flops(d, nu, b) / 1e9


def roofline(d: int, nu: int, b: int, *, fused: bool = True,
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
    """
    n = nu + 1
    D = n * d
    m = d + b
    if fused:
        qr = qr_flops(2 * D + m, m + D)
    else:
        qr = qr_flops(2 * D, D) + qr_flops(D + m, m + D)
    other = white_step_flops(d, nu, b) - qr_flops(2 * D + m, m + D)
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
