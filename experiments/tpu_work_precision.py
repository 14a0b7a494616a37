"""TPU work-precision: f32 device solves vs the CPU-f64 curve.

BASELINE.md names "work-precision vs reference" a metric of record, and
VERDICT round 4 (Missing #3) found zero committed TPU data for it beyond
heat sanity checks. This experiment runs the figure4-style RMSE/chi^2-vs-
runtime sweep (reference anchor:
``/root/reference/experiments/figure4.py:108-117``) with the SAME problems
and dt ladders on two platforms:

* CPU f64 — the reference implementation's precision/platform,
* TPU f32 end-to-end (``PNMOL_TPU_X32`` policy, the bench configuration),

on (a) the Lotka-Volterra reaction-diffusion SYSTEM (semilinear — the
figure4 problem, "beyond heat-decay") and (b) the 1-D heat bench problem at
N in {512, 2048}. The claim under test: the f32 TPU solver's accuracy lands
ON the f64 work-precision curve until dt is small enough that the f32
roundoff floor binds — i.e. going to the TPU costs no accuracy at the step
sizes anyone would run there, while each step is orders of magnitude
faster (bench_artifacts/pdefilter_steps_per_sec_*).

Each (problem, platform) leg runs in its own subprocess so the dtype
policy/backend is pinned cleanly (bench.py pattern). Writes
``bench_artifacts/tpu_work_precision.json``.

Usage:  python experiments/tpu_work_precision.py            # all legs
        python experiments/tpu_work_precision.py --legs lv_cpu,lv_tpu
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

LV_DTS = [0.316, 0.1, 0.0316, 0.01, 0.00562, 0.00316]
HEAT_DTS_TPU = [0.1, 0.05, 0.02, 0.01, 0.005, 0.002, 0.001]
HEAT_DTS_CPU = [0.1, 0.05, 0.02, 0.01]  # f64 CPU: minutes/point past this
HEAT_DTS_CPU_2048 = [0.1, 0.05]
NU = 2


def _child(leg):
    import jax

    platform = leg.rsplit("_", 1)[-1]
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import reference_solver
    from pnmol_tpu.odetools import step as step_module

    sys.path.insert(0, HERE)
    import common

    # relay warm-up flush (see bench.py) — harmless on CPU
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8,), jnp.float32)))
    warm = time.perf_counter() - t0

    def chi2_f64(err, cov):
        err = np.asarray(err, np.float64)
        cov = np.asarray(cov, np.float64)
        w = np.linalg.solve(cov + 1e-12 * np.eye(cov.shape[0]), err)
        return float(err @ w / err.size)

    rows = []

    def record(problem, n, dt, final, solver, u_ref, elapsed, info):
        if problem == "lv":
            u_full, _ = jnp.split(final.y.mean[0], 2)
            cov = final.y.cov_sqrtm @ final.y.cov_sqrtm.T
            cov0 = solver.E0 @ cov @ solver.E0.T
            u_cov = jnp.split(jnp.split(cov0, 2, axis=1)[0], 2, axis=0)[0]
            u, u_cov = u_full[1:-1], u_cov[1:-1, 1:-1]
            ref = u_ref
        else:
            # the LSODA reference solves the interior-only MOL system
            # (to_ivp eliminates boundary rows) — compare interiors
            u = final.y.mean[0][1:-1]
            cov = final.y.cov_sqrtm @ final.y.cov_sqrtm.T
            u_cov = (solver.E0 @ cov @ solver.E0.T)[1:-1, 1:-1]
            ref = u_ref
        # all error metrics in host f64: under the X32 policy jnp would
        # silently downcast the f64 reference and mask the very f32 floor
        # this experiment measures
        u64 = np.asarray(u, np.float64)
        ref64 = np.asarray(ref, np.float64)
        err = np.abs(u64 - ref64)
        rel = err / np.abs(ref64)
        rows.append({
            "problem": problem, "platform": platform, "n": n, "dt": dt,
            "num_steps": int(info["num_steps"]),
            "rmse_rel": float(np.linalg.norm(rel) / np.sqrt(rel.size)),
            "chi2": chi2_f64(err, u_cov),
            "seconds": round(elapsed, 3),
            "dtype": str(final.y.mean.dtype),
        })
        print(json.dumps(rows[-1]), flush=True)

    def lsoda_final(ivp):
        import jax as _jax

        sol = reference_solver.solve_ivp_stiff(
            _jax.jit(ivp.f), ivp.t_span, ivp.y0,
            t_eval=jnp.asarray([ivp.tmax]), rtol=1e-10, atol=1e-10,
            jac=_jax.jit(ivp.df) if getattr(ivp, "df", None) is not None
            else None,
        )
        return np.asarray(sol.y[-1], np.float64)

    def cached_ref(tag, build_ivp):
        # the LSODA reference is identical across platform legs (f64 host
        # math either way) and expensive — cache it on disk
        path = os.path.join(HERE, "results", f"wp_ref_{tag}.npy")
        if os.path.exists(path):
            return np.load(path)
        val = lsoda_final(build_ivp())
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, val)
        return val

    if leg.startswith("lv"):
        dx = 0.01
        pde = pnmol_tpu.pde.examples.lotka_volterra_1d_discretized(
            dx=dx, t0=0.0, tmax=1.0,
            stencil_size_interior=3, stencil_size_boundary=4,
        )
        # f64 LSODA reference on a refined grid, restricted (figure4
        # recipe; scale 4 keeps the stiff 2240-dim LSODA tractable on the
        # 1-core box — its rtol=1e-10 is far below the dt ladder's floor)
        scale = 4
        y_ref = cached_ref(
            f"lv_dx{dx}_s{scale}",
            lambda: pnmol_tpu.pde.examples.lotka_volterra_1d_discretized(
                dx=dx / scale, t0=0.0, tmax=1.0,
                stencil_size_interior=3, stencil_size_boundary=4,
            ).to_ivp(),
        )
        # keep the reference in host f64 end-to-end (jnp would downcast
        # under the X32 policy)
        u_full = np.split(y_ref, 2)[0]
        u_ref = u_full[scale - 1::scale]
        prior = pnmol_tpu.kernels.duplicate(
            kernels.Matern52() + kernels.WhiteNoise(), num=2
        )
        for dt in LV_DTS:
            solver = pnmol_tpu.white.SemiLinearWhiteNoiseEK1(
                num_derivatives=NU, steprule=step_module.Constant(dt),
                spatial_kernel=prior,
            )
            final, info = solver.simulate_final_state(pde)  # compile+run
            (final, info), elapsed = common.timed(
                solver.simulate_final_state, pde
            )
            record("lv", pde.L.shape[0] // 2, dt, final, solver,
                   u_ref, elapsed, info)
    else:
        n = int(leg.split("_")[1])
        dx = 1.0 / (n - 1)
        pde = pnmol_tpu.pde.examples.heat_1d_discretized(
            dx=dx, tmax=1.0,
            kernel=kernels.SquareExponential(input_scale=0.1 / dx),
        )
        u_ref = cached_ref(f"heat_n{n}", pde.to_ivp)  # host f64
        dts = (HEAT_DTS_TPU if platform == "tpu" else
               (HEAT_DTS_CPU_2048 if n >= 2048 else HEAT_DTS_CPU))
        for dt in dts:
            solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
                num_derivatives=NU, steprule=step_module.Constant(dt),
                spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
            )
            final, info = solver.simulate_final_state(pde)
            (final, info), elapsed = common.timed(
                solver.simulate_final_state, pde
            )
            record("heat", n, dt, final, solver, u_ref, elapsed, info)

    print("WP_CHILD " + json.dumps({"leg": leg, "warmup_s": round(warm, 1),
                                    "rows": rows}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs",
                    default="lv_cpu,lv_tpu,heat_512_cpu,heat_512_tpu,"
                            "heat_2048_cpu,heat_2048_tpu")
    args = ap.parse_args()
    all_rows = []
    for leg in args.legs.split(","):
        env = dict(os.environ)
        if leg.endswith("_tpu"):
            env["PNMOL_TPU_X32"] = "1"
        else:
            env.pop("PNMOL_TPU_X32", None)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", leg],
            env=env, capture_output=True, text=True, timeout=14000,
        )
        if proc.returncode != 0:
            sys.stderr.write(f"leg {leg} FAILED:\n" + proc.stderr[-3000:])
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("WP_CHILD "):
                payload = json.loads(line[len("WP_CHILD "):])
                all_rows.extend(payload["rows"])
                print(json.dumps({"leg": leg, "rows": len(payload["rows"])}),
                      flush=True)

    import datetime

    path = os.path.join(os.path.dirname(HERE), "bench_artifacts",
                        "tpu_work_precision.json")
    # merge with prior runs: legs are run separately around chip/core
    # availability; re-run legs replace their own rows only
    ran = {(r["problem"], r["platform"], r["n"]) for r in all_rows}
    if os.path.exists(path):
        with open(path) as fh:
            prior = json.load(fh).get("rows", [])
        all_rows = [
            r for r in prior
            if (r["problem"], r["platform"], r["n"]) not in ran
        ] + all_rows
    out = {
        "experiment": "tpu_work_precision",
        "note": ("figure4-style constant-dt work-precision; TPU legs are "
                 "f32 end-to-end (X32 policy), CPU legs f64. rmse_rel is "
                 "relative RMSE vs an LSODA rtol=1e-10 reference; chi2 is "
                 "the calibration statistic (f64 host math)."),
        "rows": all_rows,
        "recorded_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
    }
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"artifact": path}))


if __name__ == "__main__":
    if "--child" in sys.argv:
        _child(sys.argv[sys.argv.index("--child") + 1])
    else:
        main()
