"""Single-device factorization shootout: XLA Householder QR vs the
all-matmul blocked CholeskyQR2 + block-Gram-Schmidt panel factorization.

XLA's QR on TPU lowers to a blocked Householder pipeline with substantial
non-matmul work; the panel factorization spends almost all FLOPs in MXU
matmuls. If it wins single-device, it is a drop-in step speedup via the
`factorization=` hook (it is already the distributed path).

Usage: PNMOL_TPU_X32=1 python experiments/qr_probe.py --n 2048 [--panel 512]
Prints one JSON line.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


def main(n_points, nu, panel, num_steps):
    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.parallel import meshes, sharded_filter
    from pnmol_tpu.solvers import white as white_module

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

    mesh = meshes.make_mesh(1, batch=1)  # trivial mesh: psum is a no-op
    fact = functools.partial(
        sharded_filter.pre_array_blocked_qr, mesh=mesh, panel_size=panel
    )

    def runner(factorization):
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

        return run

    def measure(run):
        out = run(cache, mean, cov)
        jax.block_until_ready(out)
        float(jnp.sum(out[0]))  # force remote completion
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(cache, mean, cov)
            jax.block_until_ready(out)
            float(jnp.sum(out[0]))
            best = min(best, time.perf_counter() - t0)
        return num_steps / best, out

    sps_xla, out_xla = measure(runner(None))
    sps_chol, out_chol = measure(runner(fact))

    gram_xla = out_xla[1] @ out_xla[1].T
    gram_chol = out_chol[1] @ out_chol[1].T
    denom = jnp.maximum(jnp.max(jnp.abs(gram_xla)), 1e-30)
    rel_err = float(jnp.max(jnp.abs(gram_xla - gram_chol)) / denom)
    mean_err = float(jnp.max(jnp.abs(out_xla[0] - out_chol[0])))

    print(json.dumps({
        "probe": "qr_shootout",
        "N": n_points, "nu": nu, "panel": panel, "dtype": str(dtype),
        "device": str(jax.devices()[0]),
        "xla_qr_steps_per_sec": round(sps_xla, 4),
        "cholqr_steps_per_sec": round(sps_chol, 4),
        "cholqr_speedup": round(sps_chol / sps_xla, 3),
        "cov_gram_rel_err": rel_err,
        "mean_abs_err": mean_err,
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--nu", type=int, default=2)
    p.add_argument("--panel", type=int, default=512)
    p.add_argument("--steps", type=int, default=4)
    a = p.parse_args()
    main(a.n, a.nu, a.panel, a.steps)
