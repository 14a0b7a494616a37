"""Factorization accuracy vs an f64 oracle, on the real step trajectory.

Phase 'device' (run under PNMOL_TPU_X32=1 on the TPU): build the N-point
heat problem, save the f32 init (cache, mean, cov), then run `steps` white
EK1 steps with each factorization (XLA QR / Householder-LQ at the chosen
precisions) and save the final mean + covariance factor of each.

Phase 'oracle' (fresh process, CPU f64): load the SAME f32 initial state,
cast to f64, run the same steps with XLA QR in f64 — the ground truth for
exactly this trajectory — and report each f32 run's error against it:
max |mean - mean64| and the relative Gram error of the covariance factor.

Usage:
  PNMOL_TPU_X32=1 python experiments/qr_accuracy_probe.py device --n 512
  python experiments/qr_accuracy_probe.py oracle --n 512
"""

import argparse
import json
import os
import sys

import numpy as np

OUTDIR = "/tmp/qr_accuracy"


def _step_scan(cache, mean, cov, num_steps, nu, factorization, dtype):
    import jax
    import jax.numpy as jnp

    from pnmol_tpu.solvers import white as white_module

    dt = jnp.asarray(1e-3, dtype)

    @jax.jit
    def run(cache, mean, cov):
        def body(carry, t):
            m, c = carry
            m, c, _, _, _ = white_module.white_attempt_step(
                cache, m, c, t, dt, num_derivatives=nu, f=None, df=None,
                linear=True, fused=True, factorization=factorization,
            )
            return (m, c), None

        ts = jnp.arange(1, num_steps + 1, dtype=dtype) * dt
        return jax.lax.scan(body, (mean, cov), ts)[0]

    out = run(cache, mean, cov)
    jax.block_until_ready(out)
    return out


def phase_device(n_points, nu, num_steps):
    import jax
    import jax.numpy as jnp

    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.ops import qr_householder

    dx = 1.0 / (n_points - 1)
    heat = pnmol_tpu.pde.examples.heat_1d_discretized(
        dx=dx, tmax=1.0,
        kernel=kernels.SquareExponential(input_scale=0.1 / dx),
    )
    solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=1e-3), num_derivatives=nu,
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)
    cache, mean, cov = solver._cache, state.y.mean, state.y.cov_sqrtm
    dtype = mean.dtype

    os.makedirs(OUTDIR, exist_ok=True)
    np.savez(
        f"{OUTDIR}/init_n{n_points}.npz",
        mean=np.asarray(mean), cov=np.asarray(cov),
        **{f"cache_{k}": np.asarray(v) for k, v in cache._asdict().items()},
    )

    runs = {
        "xla": None,
        "hh_lq_highest": qr_householder.make_householder_lq_factorization(
            precision="highest"),
        "hh_lq_high": qr_householder.make_householder_lq_factorization(
            precision="high"),
    }
    for name, fact in runs.items():
        m_out, c_out = _step_scan(cache, mean, cov, num_steps, nu, fact, dtype)
        np.savez(
            f"{OUTDIR}/run_{name}_n{n_points}.npz",
            mean=np.asarray(m_out), cov=np.asarray(c_out),
        )
        print(f"device run {name}: saved", flush=True)


def phase_oracle(n_points, nu, num_steps):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pnmol_tpu.solvers import white as white_module

    init = np.load(f"{OUTDIR}/init_n{n_points}.npz")
    cache = white_module.WhiteSolverCache(
        **{k[len("cache_"):]: jnp.asarray(init[k], jnp.float64)
           for k in init.files if k.startswith("cache_")}
    )
    mean = jnp.asarray(init["mean"], jnp.float64)
    cov = jnp.asarray(init["cov"], jnp.float64)
    m64, c64 = _step_scan(cache, mean, cov, num_steps, nu, None, jnp.float64)
    gram64 = c64 @ c64.T
    gnorm = float(jnp.max(jnp.abs(gram64)))

    results = {}
    for f in sorted(os.listdir(OUTDIR)):
        if not (f.startswith("run_") and f.endswith(f"_n{n_points}.npz")):
            continue
        name = f[len("run_"):-len(f"_n{n_points}.npz")]
        run = np.load(f"{OUTDIR}/{f}")
        m32 = jnp.asarray(run["mean"], jnp.float64)
        c32 = jnp.asarray(run["cov"], jnp.float64)
        gram32 = c32 @ c32.T
        results[name] = {
            "mean_abs_err": float(jnp.max(jnp.abs(m32 - m64))),
            "cov_gram_rel_err": float(jnp.max(jnp.abs(gram32 - gram64))) / gnorm,
        }
    print(json.dumps({
        "probe": "qr_accuracy_vs_f64", "N": n_points, "nu": nu,
        "steps": num_steps, "results": results,
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("phase", choices=("device", "oracle"))
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--nu", type=int, default=2)
    p.add_argument("--steps", type=int, default=16)
    a = p.parse_args()
    if a.phase == "device":
        phase_device(a.n, a.nu, a.steps)
    else:
        phase_oracle(a.n, a.nu, a.steps)
