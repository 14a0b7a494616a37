"""Banded-propagate shootout on the two-QR Householder pipeline.

The propagate pre-array ``[A@Cl | Ql]`` is structurally banded in the
point-major layout (``Ql = kron(chol_gram, LQ1d)`` is lower-triangular; with
``Cl`` triangular the point-interleaved form has row support ``2r + n``).
This probe times one solver's step at propagate_band in
{None, "banded", "interleaved"} in a single process (shared relay warm-up +
initialization) and cross-checks the three results against each other.

Usage: PNMOL_TPU_X32=1 python experiments/band_probe.py --n 2048 [--nu 2]
       [--steps 32] [--solver white|latent]
Prints one JSON line per variant.
"""

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main(n_points, nu, num_steps, solver_kind, leaf=None, block=None):
    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import latent as latent_module
    from pnmol_tpu.solvers import white as white_module

    t0 = time.perf_counter()
    _ = float(jnp.sum(jnp.ones((8,), jnp.float32) * 2.0))
    warm_s = time.perf_counter() - t0

    dx = 1.0 / (n_points - 1)
    heat = pnmol_tpu.pde.examples.heat_1d_discretized(
        dx=dx, tmax=1.0,
        kernel=kernels.SquareExponential(input_scale=0.1 / dx),
    )
    d = heat.L.shape[0]
    solver_cls = (
        pnmol_tpu.white.LinearWhiteNoiseEK1 if solver_kind == "white"
        else pnmol_tpu.latent.LinearLatentForceEK1
    )
    t0 = time.perf_counter()
    solver = solver_cls(
        steprule=step_module.Constant(dt=1e-3),
        num_derivatives=nu,
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        factorization="householder",
    )
    state = solver.initialize(heat)
    jax.block_until_ready(state.y.cov_sqrtm)
    init_s = time.perf_counter() - t0

    cache = solver._cache
    fact = solver.factorization
    mean, cov = state.y.mean, state.y.cov_sqrtm
    dtype = mean.dtype
    dt = jnp.asarray(1e-3, dtype)
    # the interleaved variant's precondition: lower-triangular state factor
    cov_tri = jax.jit(fact.tri)(cov)
    jax.block_until_ready(cov_tri)
    del state, solver, heat

    attempt = (
        white_module.white_attempt_step if solver_kind == "white"
        else latent_module.latent_attempt_step
    )

    def runner(band):
        @functools.partial(jax.jit, static_argnames=("pb",))
        def run(cache, mean, cov, pb):
            def body(carry, t):
                m, c = carry
                m, c, _, _, _ = attempt(
                    cache, m, c, t, dt, num_derivatives=nu, f=None, df=None,
                    linear=True, fused=False, factorization=fact,
                    propagate_band=pb,
                )
                return (m, c), None

            ts = jnp.arange(1, num_steps + 1, dtype=dtype) * dt
            return jax.lax.scan(body, (mean, cov), ts)[0]

        c0 = cov_tri if band == "interleaved" else cov
        t0 = time.perf_counter()
        out = run(cache, mean, c0, band)
        jax.block_until_ready(out)
        float(jnp.sum(out[0]))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out2 = run(cache, mean, c0, band)
            jax.block_until_ready(out2)
            float(jnp.sum(out2[0]))
            best = min(best, time.perf_counter() - t0)
        return out, best, compile_s

    results = {}
    for band in (None, "banded", "interleaved"):
        out, best, compile_s = runner(band)
        results[band] = out
        print(json.dumps({
            "probe": "band_probe", "solver": solver_kind, "N": d, "nu": nu,
            "band": band, "steps_per_sec": round(num_steps / best, 4),
            "compile_seconds": round(compile_s, 1),
            "warmup_s": round(warm_s, 1), "init_s": round(init_s, 1),
        }), flush=True)

    ref_m, ref_c = results[None]
    for band in ("banded", "interleaved"):
        m, c = results[band]
        dm = float(jnp.max(jnp.abs(m - ref_m)))
        dg = float(jnp.max(jnp.abs(c @ c.T - ref_c @ ref_c.T)))
        print(json.dumps({"band": band, "mean_absdiff_vs_none": dm,
                          "gram_absdiff_vs_none": dg}), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--nu", type=int, default=2)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--solver", default="white", choices=("white", "latent"))
    a = p.parse_args()
    main(a.n, a.nu, a.steps, a.solver)
