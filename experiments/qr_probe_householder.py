"""Single-device step shootout: XLA Householder QR vs the Pallas blocked
Householder QR (`pnmol_tpu.ops.qr_householder`) via the `factorization=`
hook — end-to-end white-noise EK1 steps, the metric that matters.

Usage: PNMOL_TPU_X32=1 python experiments/qr_probe_householder.py --n 512
Prints one JSON line.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main(n_points, nu, leaf, block, num_steps, variant="lq", precision="highest",
         solver_kind="white"):
    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.ops import qr_householder
    from pnmol_tpu.solvers import white as white_module
    from pnmol_tpu.solvers import latent as latent_module

    dx = 1.0 / (n_points - 1)
    heat = pnmol_tpu.pde.examples.heat_1d_discretized(
        dx=dx, tmax=1.0,
        kernel=kernels.SquareExponential(input_scale=0.1 / dx),
    )
    solver_cls = (
        pnmol_tpu.white.LinearWhiteNoiseEK1 if solver_kind == "white"
        else pnmol_tpu.latent.LinearLatentForceEK1
    )
    solver = solver_cls(
        steprule=step_module.Constant(dt=1e-3),
        num_derivatives=nu,
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )
    state = solver.initialize(heat)
    cache = solver._cache
    mean, cov = state.y.mean, state.y.cov_sqrtm
    dtype = mean.dtype
    dt = jnp.asarray(1e-3, dtype)

    if variant == "lq":
        fact = qr_householder.make_householder_lq_factorization(
            leaf=leaf, block=block, precision=precision
        )
    else:
        fact = qr_householder.make_householder_factorization(
            leaf=leaf, block=block, precision=precision
        )

    def runner(factorization):
        @jax.jit
        def run(cache, mean, cov):
            def body(carry, t):
                m, c = carry
                if solver_kind == "white":
                    m, c, _, _, _ = white_module.white_attempt_step(
                        cache, m, c, t, dt, num_derivatives=nu, f=None,
                        df=None, linear=True, fused=True,
                        factorization=factorization,
                    )
                else:
                    m, c, _, _, _ = latent_module.latent_attempt_step(
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
        float(jnp.sum(out[0]))  # force remote completion
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(cache, mean, cov)
            jax.block_until_ready(out)
            float(jnp.sum(out[0]))
            best = min(best, time.perf_counter() - t0)
        return num_steps / best, compile_s, out

    sps_xla, comp_xla, out_xla = measure(runner(None))
    sps_hh, comp_hh, out_hh = measure(runner(fact))

    # Gram comparison at full precision (the TPU default matmul precision
    # is a single bf16 pass and would swamp the factor differences)
    hp = jax.lax.Precision.HIGHEST
    gram_xla = jnp.dot(out_xla[1], out_xla[1].T, precision=hp)
    gram_hh = jnp.dot(out_hh[1], out_hh[1].T, precision=hp)
    denom = jnp.maximum(jnp.max(jnp.abs(gram_xla)), 1e-30)
    rel_err = float(jnp.max(jnp.abs(gram_xla - gram_hh)) / denom)
    mean_err = float(jnp.max(jnp.abs(out_xla[0] - out_hh[0])))

    # per-path magnitudes: a cross-path error comparison is only
    # meaningful when both trajectories are themselves sane (the latent
    # solver in f32 diverges at this probe's dt/prior configuration, so its
    # row is diagnostic, not a publishable accuracy claim)
    norm_xla = float(jnp.max(jnp.abs(out_xla[0])))
    norm_hh = float(jnp.max(jnp.abs(out_hh[0])))
    print(json.dumps({
        "probe": "qr_householder_shootout",
        "N": n_points, "nu": nu, "leaf": leaf, "block": block,
        "variant": variant, "precision": precision, "solver": solver_kind,
        "dtype": str(dtype), "device": str(jax.devices()[0]),
        "xla_qr_steps_per_sec": round(sps_xla, 4),
        "householder_steps_per_sec": round(sps_hh, 4),
        "speedup": round(sps_hh / sps_xla, 3),
        "cov_gram_rel_err": rel_err,
        "mean_abs_err": mean_err,
        "mean_max_abs": {"xla": norm_xla, "hh": norm_hh},
        "compile_s": {"xla": round(comp_xla, 1), "hh": round(comp_hh, 1)},
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--nu", type=int, default=2)
    p.add_argument("--leaf", type=int, default=32)
    p.add_argument("--block", type=int, default=128)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--variant", choices=("lq", "r"), default="lq")
    p.add_argument("--precision", choices=("default", "high", "highest"),
                   default="highest")
    p.add_argument("--solver", choices=("white", "latent"), default="white")
    a = p.parse_args()
    main(a.n, a.nu, a.leaf, a.block, a.steps, a.variant, a.precision,
         a.solver)
