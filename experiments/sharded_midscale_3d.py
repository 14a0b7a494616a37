"""Mid-scale 3-D advection-diffusion on the 8-device virtual mesh, shard-exact.

VERDICT round-3 "Next #3(b)": the sharded correctness tests run at toy sizes
(d = 16-96 points); this script runs the SAME end-to-end space-sharded
constant solve (distributed QR, sharded covariance) at a mid-scale 3-D
configuration — the BASELINE.md N=1e5 model family
(/root/reference/src/pnmol/discretize.py:204-236 is the reference's
single-device dense anchor) at the largest virtual-mesh-verifiable point —
and records the deviation from the single-device oracle as a committed JSON
artifact (bench_artifacts/sharded_midscale_3d.json).

Usage (defaults: 10^3 grid, nu=1, 4 steps, 8 virtual CPU devices, f64):
    python experiments/sharded_midscale_3d.py --n 10 --steps 4
"""

import argparse
import json
import os
import time

import jax

# Pin the backend BEFORE any computation: the container's site hook
# force-registers the remote TPU relay, so env vars alone are not enough
# (same pattern as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10, help="points per side")
    parser.add_argument("--nu", type=int, default=1)
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--dt", type=float, default=0.01)
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--panel", type=int, default=64)
    parser.add_argument("--two-qr", action="store_true",
                        help="route every step through the memory-bounded "
                             "two-QR split + measurement hooks (ring "
                             "matmul, row-sharded innovation whitening) — "
                             "the N=1e5 configuration, VERDICT r4 item 3")
    parser.add_argument("--qr-loop", default="scan",
                        choices=("scan", "unrolled"))
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    jax.config.update("jax_num_cpu_devices", args.devices)

    import jax.numpy as jnp

    from pnmol_tpu import kernels
    from pnmol_tpu.models import examples
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.parallel import meshes, sharded_filter
    from pnmol_tpu.solvers import white

    t0 = time.perf_counter()
    pde = examples.advection_diffusion_discretized(
        dim=3,
        num_points=(args.n,) * 3,
        tmax=args.steps * args.dt,
        velocity=[1.0, 0.5, 0.25],
        diffusion_rate=0.05,
    )
    d = pde.L.shape[0]
    build_s = time.perf_counter() - t0

    solver = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt=args.dt),
        num_derivatives=args.nu,
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
    )

    # single-device oracle (the full driver: scan + calibration + rescale)
    t0 = time.perf_counter()
    final, info = solver.simulate_final_state(pde)
    jax.block_until_ready(final.y.mean)
    oracle_s = time.perf_counter() - t0
    assert info["num_steps"] == args.steps, info

    state0 = solver.initialize(pde)
    mesh = meshes.make_mesh(args.devices, batch=1)
    cache_sharded = sharded_filter.shard_cache(
        solver._cache, mesh, distributed_qr=True,
        shard_operands=args.two_qr,
    )
    solve = sharded_filter.make_space_sharded_constant_solve(
        cache=cache_sharded, num_derivatives=args.nu, mesh=mesh,
        dt=args.dt, num_steps=args.steps, linear=True,
        distributed_qr=True, panel_size=args.panel,
        two_qr=args.two_qr, qr_loop=args.qr_loop,
    )
    t0 = time.perf_counter()
    with mesh:
        mean, cov, diff_sq = solve(
            state0.y.mean, state0.y.cov_sqrtm, jnp.asarray(pde.t0)
        )
    jax.block_until_ready(cov)
    sharded_s = time.perf_counter() - t0

    mean_err = float(jnp.max(jnp.abs(mean - final.y.mean)))
    gram = cov @ cov.T
    gram_ref = final.y.cov_sqrtm @ final.y.cov_sqrtm.T
    gram_err = float(jnp.max(jnp.abs(gram - gram_ref)))
    gram_scale = float(jnp.max(jnp.abs(gram_ref)))
    diff_rel = float(
        jnp.abs(diff_sq - final.diffusion_squared_local)
        / jnp.abs(final.diffusion_squared_local)
    )
    record = {
        "experiment": "sharded_midscale_3d",
        "model": "advection_diffusion_3d",
        "grid": [args.n] * 3,
        "N": d,
        "nu": args.nu,
        "state_dim": d * (args.nu + 1),
        "measurement_dim": int(solver._cache.B.shape[0] + d),
        "num_steps": args.steps,
        "dt": args.dt,
        "devices": args.devices,
        "pipeline": ("two_qr_memory_bounded" if args.two_qr
                     else "fused_distributed_qr"),
        "qr_loop": args.qr_loop if args.two_qr else None,
        "cov_shards": len(cov.addressable_shards),
        "dtype": str(mean.dtype),
        "mean_max_abs_err": mean_err,
        "gram_max_abs_err": gram_err,
        "gram_max_abs": gram_scale,
        "gram_rel_err": gram_err / gram_scale,
        "diffusion_rel_err": diff_rel,
        "mean_nan_free": not bool(jnp.any(jnp.isnan(mean))),
        "build_seconds": round(build_s, 2),
        "oracle_seconds": round(oracle_s, 2),
        "sharded_seconds": round(sharded_s, 2),
    }
    print(json.dumps(record))
    stem = "sharded_midscale_3d" + (
        f"_n{args.n}_two_qr" if args.two_qr else
        ("" if args.n == 10 else f"_n{args.n}")
    )
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_artifacts", f"{stem}.json",
    )
    with open(out, "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps({"artifact": out}))


if __name__ == "__main__":
    main()
