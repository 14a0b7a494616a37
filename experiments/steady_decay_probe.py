"""Long-horizon decay of the frozen-gain (steady-state) mean recursion.

The direct stability/accuracy evidence for the steady tier: seed a 1-D heat
solve, freeze the stationary factors, run ``--steps`` mean-only steps, and
record the amplitude ratio against the PDE's physical decay. Used for the
round-5 SCALE.md ladder (CPU f64 healthy at N=512: ratio ~0.03 over
t=20.48; TPU f32 at N=1e4: stable but ~200x slower decay — the f32 frozen
gain's slow-mode error floor, docs/SCALE.md "Steady-state at N=1e4").

Usage (CPU f64):   python experiments/steady_decay_probe.py f64 512 2048
      (TPU f32):   PNMOL_TPU_X32=1 python ... f32 2048 512
"""

import json
import os
import sys

import jax

dtype_flag = sys.argv[1] if len(sys.argv) > 1 else "f64"
if dtype_flag == "f64":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import pnmol_tpu
from pnmol_tpu import kernels
from pnmol_tpu.odetools import step as step_module


def main():
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    dt_f = float(sys.argv[4]) if len(sys.argv) > 4 else 0.01
    dx = 1.0 / (n - 1)
    heat = pnmol_tpu.pde.examples.heat_1d_discretized(
        dx=dx, tmax=1.0,
        kernel=kernels.SquareExponential(input_scale=0.1 / dx))
    solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=dt_f), num_derivatives=1,
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        steady_state=True)
    state = solver.initialize(heat)
    mean, cov = state.y.mean, state.y.cov_sqrtm
    m0 = float(jnp.max(jnp.abs(mean[0])))
    step_fn = solver._step_fn
    dt = jnp.asarray(dt_f, mean.dtype)

    @jax.jit
    def run(mean, cov):
        def body(carry, t):
            m, c, *_ = step_fn(carry[0], carry[1], t, dt)
            return (m, c), None

        ts = jnp.arange(1, steps + 1, dtype=mean.dtype) * dt
        (m, _), _ = jax.lax.scan(body, (mean, cov), ts)
        return m

    m_final = run(mean, cov)
    mf = float(jnp.max(jnp.abs(m_final[0])))
    # physical reference: slowest Dirichlet mode of u_t = 0.05 u_xx on [0,1]
    expected = float(jnp.exp(-0.05 * jnp.pi ** 2 * steps * dt_f))
    print(json.dumps({
        "experiment": "steady_decay_probe",
        "device": str(jax.devices()[0]),
        "dtype": dtype_flag, "n": n, "steps": steps, "dt": dt_f,
        "absmax0": m0, "absmax_final": mf,
        "ratio": mf / m0,
        "per_step_factor": (mf / m0) ** (1.0 / steps),
        "slowest_mode_ratio": expected,
        "riccati_iters": int(solver.steady_cache.iterations),
        "dare_residual": solver.steady_diagnostics.get("dare_residual"),
    }))


if __name__ == "__main__":
    main()
