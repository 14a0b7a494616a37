"""Trajectory error vs Riccati convergence quality (VERDICT r3 weak-#1).

The steady-state mode's mean-only step is EXACT for whatever factors are
frozen; the user-facing question is how much trajectory error a
partially-converged freeze leaves behind. This probe measures it directly
on CPU f64 (heat 1-D): solve the same problem with

  (a) the full per-step-QR solver (the exact recursion — ground truth for
      the mean trajectory),
  (b) steady mode, UNSEEDED, with the recursion capped at an iteration
      ladder (the round-3 configuration whose fine-dx runs exited the
      200-cap at delta ~ 4e-3),
  (c) steady mode with the doubling (SDA) seed (round 4's default).

and report, per configuration: the convergence delta, the DARE residual
(the certificate), and the max-abs mean deviation from (a) over the whole
trajectory after the transient window. Writes one JSON line per row plus
``bench_artifacts/steady_error_probe.json``; docs/SCALE.md tabulates the
result.

Run: python experiments/steady_error_probe.py [--dx 0.02] [--dt 0.001]
"""

import argparse
import json
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from pnmol_tpu import kernels  # noqa: E402
from pnmol_tpu.models import examples  # noqa: E402
from pnmol_tpu.odetools import step as step_module  # noqa: E402
from pnmol_tpu.solvers import white  # noqa: E402


def solve_mean(pde, dt, steady_state):
    solver = white.LinearWhiteNoiseEK1(
        steprule=step_module.Constant(dt),
        spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
        steady_state=steady_state,
    )
    sol = solver.solve(pde)
    u = sol.mean[:, 0, :]
    assert not bool(jnp.any(jnp.isnan(u))), "NaNs"
    return u, solver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dx", type=float, default=0.02)
    ap.add_argument("--dt", type=float, default=0.001)
    ap.add_argument("--tmax", type=float, default=1.0)
    ap.add_argument("--iters-ladder", default="5,10,25,50,100,200")
    args = ap.parse_args()

    pde = examples.heat_1d_discretized(dx=args.dx, tmax=args.tmax)
    u_exact, _ = solve_mean(pde, args.dt, steady_state=False)
    scale = float(jnp.max(jnp.abs(u_exact[0])))
    num_steps = u_exact.shape[0]
    # skip the transient: the frozen gain is the STATIONARY one, so the
    # first O(mixing) steps differ by design; the tail is the regime the
    # mode is for (docs/SCALE.md "Steady-state mode")
    tail = slice(num_steps // 4, None)

    rows = []

    def add_row(label, u, solver):
        sc = solver.steady_cache
        diag = dict(solver.steady_diagnostics)
        err_tail = float(jnp.max(jnp.abs(u[tail] - u_exact[tail]))) / scale
        err_full = float(jnp.max(jnp.abs(u - u_exact))) / scale
        row = {
            "config": label,
            "riccati_iterations": int(sc.iterations),
            "delta": float(sc.delta),
            "dare_residual": diag.get("dare_residual"),
            "rel_mean_err_tail": err_tail,
            "rel_mean_err_full": err_full,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    for iters in [int(x) for x in args.iters_ladder.split(",")]:
        u, solver = solve_mean(
            pde, args.dt,
            steady_state={"seed": False, "max_iters": iters},
        )
        add_row(f"unseeded_cap{iters}", u, solver)

    u, solver = solve_mean(pde, args.dt, steady_state=True)
    add_row("sda_seeded", u, solver)

    out = {
        "config": {"dx": args.dx, "dt": args.dt, "tmax": args.tmax,
                   "d": u_exact.shape[1], "num_steps": num_steps,
                   "platform": "cpu-f64",
                   "tail_window": f"steps {num_steps // 4}..{num_steps}"},
        "note": ("rel_mean_err_* = max-abs mean deviation from the full "
                 "per-step-QR solver, relative to the initial amplitude; "
                 "tail excludes the by-design transient window"),
        "rows": rows,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "bench_artifacts",
                        "steady_error_probe.json")
    with open(os.path.abspath(path), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"artifact": os.path.abspath(path)}))


if __name__ == "__main__":
    main()
