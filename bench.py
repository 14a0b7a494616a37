"""Benchmark: PDE-filter step throughput (the metric of record, BASELINE.md).

Measures steps/sec of the fully-jitted white-noise EK1 scan loop on the 1-D
heat equation at N grid points:

* device run in float32 (TPU MXU path),
* CPU oracle run in float64 (the reference implementation's precision and
  platform — the original reference code cannot run on modern JAX, so the
  baseline is this framework's own math on the reference's platform).

Prints ONE JSON line:
  {"metric": ..., "value": steps/s on device, "unit": "steps/s",
   "vs_baseline": device_steps_per_sec / cpu_f64_steps_per_sec}

Env knobs: PNMOL_BENCH_N (grid points, default 256), PNMOL_BENCH_STEPS,
PNMOL_BENCH_REPEATS.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Defaults measured on TPU v5e (single chip), f32 vs CPU f64 oracle:
#   N=256:  554 steps/s,  55x,  1.9 TFLOP/s effective
#   N=512:  188 steps/s, 121x,  5.0 TFLOP/s
#   N=1024:  40 steps/s, 222x,  8.5 TFLOP/s
N_POINTS = int(os.environ.get("PNMOL_BENCH_N", "512"))
NUM_STEPS = int(os.environ.get("PNMOL_BENCH_STEPS", "32"))
CPU_STEPS = int(os.environ.get("PNMOL_BENCH_CPU_STEPS", "4"))
REPEATS = int(os.environ.get("PNMOL_BENCH_REPEATS", "3"))
NU = 2


def build(dtype):
    import pnmol_tpu
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white as white_module

    heat = pnmol_tpu.pde.examples.heat_1d_discretized(
        dx=1.0 / (N_POINTS - 1), tmax=1.0
    )
    solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=1e-3),
        num_derivatives=NU,
        spatial_kernel=pnmol_tpu.kernels.Matern52() + pnmol_tpu.kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)
    cache = jax.tree_util.tree_map(lambda x: x.astype(dtype), solver._cache)
    mean = state.y.mean.astype(dtype)
    cov = state.y.cov_sqrtm.astype(dtype)
    step_fn = white_module.make_white_step_fn(
        cache=cache, num_derivatives=NU, f=None, df=None, linear=True
    )
    return step_fn, mean, cov


def make_runner(step_fn, dtype, num_steps):
    dt = jnp.asarray(1e-3, dtype)

    @jax.jit
    def run(mean, cov):
        def body(carry, t):
            m, c = carry
            m, c, _, _, _ = step_fn(m, c, t, dt)
            return (m, c), None

        ts = jnp.arange(1, num_steps + 1, dtype=dtype) * dt
        (m, c), _ = jax.lax.scan(body, (mean, cov), ts)
        return m, c

    return run


def measure(step_fn, mean, cov, dtype, device, num_steps):
    mean = jax.device_put(mean, device)
    cov = jax.device_put(cov, device)
    run = make_runner(step_fn, dtype, num_steps)
    out = run(mean, cov)  # compile + warmup
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = run(mean, cov)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return num_steps / best


def main():
    devices = jax.devices()
    accel = devices[0]
    cpu = jax.devices("cpu")[0] if accel.platform != "cpu" else accel

    # Device (f32) measurement.
    step_f32, mean32, cov32 = build(jnp.float32)
    device_sps = measure(step_f32, mean32, cov32, jnp.float32, accel, NUM_STEPS)

    # CPU float64 oracle (reference platform + precision).
    with jax.default_device(cpu):
        step_f64, mean_f64, cov_f64 = build(jnp.float64)
        cpu_sps = measure(step_f64, mean_f64, cov_f64, jnp.float64, cpu, CPU_STEPS)

    from pnmol_tpu.utils import profiling

    gflops = profiling.steps_per_sec_to_gflops(device_sps, d=N_POINTS, nu=NU, b=2)
    print(
        json.dumps(
            {
                "metric": f"pdefilter_steps_per_sec_n{N_POINTS}",
                "value": round(device_sps, 3),
                "unit": "steps/s",
                "vs_baseline": round(device_sps / cpu_sps, 3),
                "detail": {
                    "device": str(accel),
                    "cpu_f64_steps_per_sec": round(cpu_sps, 3),
                    "grid_points": N_POINTS,
                    "state_dim": N_POINTS * (NU + 1),
                    "num_steps": NUM_STEPS,
                    "sqrt_kalman_gflops_per_sec": round(gflops, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
