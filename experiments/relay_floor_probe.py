"""Isolate the relay's fixed per-execution cost from true device time.

Hypothesis (round 3): every jitted execution dispatched through the axon
relay pays a fixed ~O(10 ms) roundtrip, so a 32-iteration scan of ANY tiny
body reads ~roundtrip/32 per iteration — which would mean all small-N
step timings (bench.py NUM_STEPS=32) include a large constant artifact.

Measures a trivial-body scan and the real white step at several scan
lengths; if ms/iter falls as 1/num_steps toward an asymptote, the
asymptote is the true device time and the difference is the relay floor.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def measure(run, ops, num_steps):
    t0 = time.perf_counter()
    out = run(ops)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(ops)
        jax.block_until_ready(out)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    return best / num_steps * 1e3, compile_s, best


def main(n_points, nu):
    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import white as white_module

    t0 = time.perf_counter()
    _ = float(jnp.sum(jnp.ones((8,), jnp.float32) * 2.0))
    print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 1),
                      "device": str(jax.devices()[0])}), flush=True)

    # --- trivial body: any per-iteration reading is pure overhead --------
    for num_steps in (8, 32, 128, 1024):
        @jax.jit
        def run(x, _n=num_steps):
            def body(c, _):
                return c * 1.000001 + 1e-9, None
            return jax.lax.scan(body, x, jnp.arange(_n))[0]

        ms, comp, total = measure(run, jnp.ones((8,), jnp.float32), num_steps)
        print(json.dumps({"probe": "trivial", "num_steps": num_steps,
                          "ms_per_iter": round(ms, 4),
                          "total_ms": round(total * 1e3, 2)}), flush=True)

    # --- the real step at several scan lengths ---------------------------
    dx = 1.0 / (n_points - 1)
    heat = pnmol_tpu.pde.examples.heat_1d_discretized(
        dx=dx, tmax=1.0,
        kernel=kernels.SquareExponential(input_scale=0.1 / dx),
    )
    solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=1e-3),
        num_derivatives=nu,
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        factorization="householder",
    )
    state = solver.initialize(heat)
    cache = solver._cache
    fact = solver.factorization
    mean, cov = state.y.mean, state.y.cov_sqrtm
    dtype = mean.dtype
    dt = jnp.asarray(1e-3, dtype)

    for num_steps in (32, 128, 512):
        @jax.jit
        def run(ops, _n=num_steps):
            m, c = ops
            def body(carry, t):
                m_, c_ = carry
                m_, c_, _, _, _ = white_module.white_attempt_step(
                    cache, m_, c_, t, dt, num_derivatives=nu, f=None,
                    df=None, linear=True, fused=True, factorization=fact,
                )
                return (m_, c_), None
            ts = jnp.arange(1, _n + 1, dtype=dtype) * dt
            return jax.lax.scan(body, (m, c), ts)[0]

        ms, comp, total = measure(run, (mean, cov), num_steps)
        print(json.dumps({"probe": "white_step_hh", "num_steps": num_steps,
                          "ms_per_iter": round(ms, 3),
                          "steps_per_sec": round(1e3 / ms, 1),
                          "compile_s": round(comp, 1)}), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--nu", type=int, default=2)
    a = p.parse_args()
    main(a.n, a.nu)
