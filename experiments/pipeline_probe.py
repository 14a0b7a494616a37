"""On-device A/B of the STEP-PIPELINE shape at the N=512 headline-bench point.

``qr_config_sweep.py`` swept the Pallas LQ's (leaf, block) tiling and
``pair_probe.py`` measured the rank-2 leaf (negative); both held the pipeline
fixed at the fused single-pre-array LQ. This probe sweeps the remaining axis
that was never A/B'd at the headline shape: the PIPELINE itself —

* ``fused``            — one (m+D, 2D+m) pre-array LQ (the bench default),
* ``fused_banded``     — same pre-array, measurement-noise triangle declared
                         to the sweep (band (2D+1, 1): the m-lane tail drops
                         out of every trailing update),
* ``two_qr_banded``    — propagate LQ (band (D+1, 1) from Ql's triangle) +
                         update LQ (band (D+1, 1) from E's triangle),
* ``two_qr_interleaved`` — propagate band 2r+q via point-block interleaving
                         (requires the triangular init factor; the solver
                         re-triangularizes it once at init).

All four are exactness-pinned against each other on CPU
(tests/test_ops/test_qr_householder.py: *_matches_default / _matches_dense);
this probe measures them on the real chip, 512-step scans (relay floor <3%,
docs/SCALE.md "relay floor"), best of ``--repeats``.

One process builds the problem once; each config re-initializes its own
solver (the interleaved config needs its re-triangularized init factor) and
times the jitted scan. Prints one JSON line per config and writes
``bench_artifacts/pipeline_probe_n512.json``.

Usage:
    PNMOL_TPU_X32=1 python experiments/pipeline_probe.py --n 512 --steps 512
"""

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

# (label, solver kwargs, hook kwargs). hook kwargs None -> the production
# "householder" string (leaf/block/lane_quant from resolve_householder_hooks);
# a dict -> an explicit make_householder_lq_factorization(**kwargs) hook.
# The lane_quant=256 variants matter at N=512: the default 2048 window
# quantization rounds every banded window up to (almost) full width at
# cols ~ 3-3.6k, silently turning the band declarations into no-ops — the
# finer quantum is what lets the band actually drop trailing lanes here.
CONFIGS = (
    ("fused", {"factorization": "householder"}, None),
    ("fused_banded", {"factorization": "householder",
                      "propagate_band": "banded"}, None),
    ("two_qr_banded", {"factorization": "householder", "fused": False,
                       "propagate_band": "banded"}, None),
    ("two_qr_interleaved", {"factorization": "householder", "fused": False,
                            "propagate_band": "interleaved"}, None),
    ("two_qr_banded_lq256", {"fused": False, "propagate_band": "banded"},
     {"leaf": 32, "block": 128, "lane_quant": 256}),
    ("two_qr_interleaved_lq256",
     {"fused": False, "propagate_band": "interleaved"},
     {"leaf": 32, "block": 128, "lane_quant": 256}),
)


def main(n_points, nu, num_steps, repeats, out_path):
    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module
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
    dt_f = 1e-3

    # CPU smoke runs (probe-wiring checks) need interpret-mode Pallas: swap
    # the "householder" string for an equivalently-sized explicit hook.
    interp_hook = None
    if jax.default_backend() == "cpu":
        from pnmol_tpu.ops import qr_householder

        interp_hook = qr_householder.make_householder_lq_factorization(
            leaf=8, block=16, interpret=True
        )

    from pnmol_tpu.ops import qr_householder

    rows = []
    ref_mean = ref_gram = None
    hp = jax.lax.Precision.HIGHEST
    for label, kwargs, hook_kwargs in CONFIGS:
        if interp_hook is not None:
            kwargs = {**kwargs, "factorization": interp_hook}
        elif hook_kwargs is not None:
            kwargs = {
                **kwargs,
                "factorization":
                    qr_householder.make_householder_lq_factorization(
                        **hook_kwargs),
            }
        solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
            steprule=step_module.Constant(dt=dt_f),
            num_derivatives=nu,
            spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
            **kwargs,
        )
        state = solver.initialize(heat)
        cache = solver._cache
        mean, cov = state.y.mean, state.y.cov_sqrtm
        dtype = mean.dtype
        dt = jnp.asarray(dt_f, dtype)
        fused = kwargs.get("fused", True)
        band = kwargs.get("propagate_band")
        factorization = solver.factorization

        @jax.jit
        def run(cache, mean, cov, _fused=fused, _band=band,
                _fact=factorization):
            def body(carry, t):
                m, c = carry
                m, c, _, _, _ = white_module.white_attempt_step(
                    cache, m, c, t, dt, num_derivatives=nu, f=None,
                    df=None, linear=True, fused=_fused,
                    factorization=_fact, propagate_band=_band,
                )
                return (m, c), None

            ts = jnp.arange(1, num_steps + 1, dtype=dtype) * dt
            return jax.lax.scan(body, (mean, cov), ts)[0]

        t0 = time.perf_counter()
        out = run(cache, mean, cov)
        jax.block_until_ready(out)
        float(jnp.sum(out[0]))
        compile_s = time.perf_counter() - t0
        # post-compile numerical record BEFORE the timing loop (checksums
        # must not depend on the repeat count)
        mean_out, cov_out = out
        gram = jnp.dot(cov_out, cov_out.T, precision=hp)
        if ref_mean is None:
            ref_mean, ref_gram = mean_out, gram
            denom_m = float(jnp.maximum(jnp.max(jnp.abs(ref_mean)), 1e-30))
            denom_g = float(jnp.maximum(jnp.max(jnp.abs(ref_gram)), 1e-30))
        mean_err = float(jnp.max(jnp.abs(mean_out - ref_mean))) / denom_m
        gram_err = float(jnp.max(jnp.abs(gram - ref_gram))) / denom_g

        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = run(cache, mean, cov)
            jax.block_until_ready(out)
            float(jnp.sum(out[0]))
            best = min(best, time.perf_counter() - t0)
        row = {
            "config": label, "N": n_points, "nu": nu,
            "num_steps": num_steps,
            "ms_per_step": round(1e3 * best / num_steps, 4),
            "steps_per_sec": round(num_steps / best, 2),
            "compile_s": round(compile_s, 1),
            "mean_rel_err_vs_fused": None if label == "fused" else mean_err,
            "gram_rel_err_vs_fused": None if label == "fused" else gram_err,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        del run

    payload = {
        "experiment": "pipeline_probe",
        "device": str(jax.devices()[0]),
        "n": n_points, "nu": nu, "num_steps": num_steps,
        "repeats": repeats, "configs": rows,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--nu", type=int, default=2)
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "bench_artifacts",
        "pipeline_probe_n512.json"))
    a = p.parse_args()
    main(a.n, a.nu, a.steps, a.repeats, a.out)
