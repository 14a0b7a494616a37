"""In-process (leaf, block) sweep of the Pallas blocked Householder LQ on
the end-to-end white-noise EK1 step — the N=512 headline-bench shape.

One process builds the problem/init once (the axon relay charges a
multi-minute warm-up to every fresh process), then times the jitted
``num_steps``-scan once per configuration. Prints one JSON line per config
plus an XLA-QR baseline row.

Usage:
    PNMOL_TPU_X32=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python experiments/qr_config_sweep.py --n 512 --steps 16
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main(n_points, nu, num_steps, configs):
    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.ops import qr_householder
    from pnmol_tpu.solvers import white as white_module

    t0 = time.perf_counter()
    _ = float(jnp.sum(jnp.ones((8,), jnp.float32) * 2.0))
    print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 1),
                      "device": str(jax.devices()[0])}), flush=True)

    dx = 1.0 / (n_points - 1)
    heat = pnmol_tpu.pde.examples.heat_1d_discretized(
        dx=dx, tmax=1.0,
        kernel=kernels.SquareExponential(input_scale=0.1 / dx),
    )
    solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=1e-3),
        num_derivatives=nu,
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)
    cache = solver._cache
    mean, cov = state.y.mean, state.y.cov_sqrtm
    dtype = mean.dtype
    dt = jnp.asarray(1e-3, dtype)

    def runner(factorization):
        @jax.jit
        def run(cache, mean, cov):
            def body(carry, t):
                m, c = carry
                m, c, _, _, _ = white_module.white_attempt_step(
                    cache, m, c, t, dt, num_derivatives=nu, f=None,
                    df=None, linear=True, fused=True,
                    factorization=factorization,
                )
                return (m, c), None

            ts = jnp.arange(1, num_steps + 1, dtype=dtype) * dt
            return jax.lax.scan(body, (mean, cov), ts)[0]

        return run

    def measure(run):
        t0 = time.perf_counter()
        out = run(cache, mean, cov)
        jax.block_until_ready(out)
        float(jnp.sum(out[0]))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(cache, mean, cov)
            jax.block_until_ready(out)
            float(jnp.sum(out[0]))
            best = min(best, time.perf_counter() - t0)
        return num_steps / best, compile_s, out

    sps_xla, comp_xla, out_xla = measure(runner(None))
    print(json.dumps({
        "config": "xla_qr", "N": n_points, "nu": nu,
        "steps_per_sec": round(sps_xla, 2), "compile_s": round(comp_xla, 1),
    }), flush=True)

    hp = jax.lax.Precision.HIGHEST
    gram_xla = jnp.dot(out_xla[1], out_xla[1].T, precision=hp)
    denom = float(jnp.maximum(jnp.max(jnp.abs(gram_xla)), 1e-30))

    for cfg in configs:
        leaf, block = cfg[0], cfg[1]
        pair = len(cfg) > 2 and bool(cfg[2])
        label = f"leaf{leaf}_block{block}" + ("_pair" if pair else "")
        fact = qr_householder.make_householder_lq_factorization(
            leaf=leaf, block=block, pair_columns=pair)
        try:
            sps, comp, out = measure(runner(fact))
        except Exception as e:  # config may violate kernel constraints
            print(json.dumps({"config": label,
                              "error": repr(e)[:200]}), flush=True)
            continue
        gram = jnp.dot(out[1], out[1].T, precision=hp)
        rel_err = float(jnp.max(jnp.abs(gram_xla - gram))) / denom
        print(json.dumps({
            "config": label, "N": n_points, "nu": nu,
            "steps_per_sec": round(sps, 2), "compile_s": round(comp, 1),
            "speedup_vs_xla": round(sps / sps_xla, 3),
            "cov_gram_rel_err": rel_err,
        }), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--nu", type=int, default=2)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--configs", type=str,
                   default="32:128,32:256,64:128,64:256,64:512,128:256,128:512,16:128")
    a = p.parse_args()
    cfgs = [tuple(int(x) for x in c.split(":")) for c in a.configs.split(",")]
    main(a.n, a.nu, a.steps, cfgs)
