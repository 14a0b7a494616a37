"""On-device A/B probe: paired (rank-2) reflector formation in the Pallas
Householder LQ sweep vs the single-column form, on the N=512 step kernel.

VERDICT round-3 item 10: at N=512 the fused step runs at ~0.60x of the
precision-roofline ceiling; the gap is the leaf kernel's serial VPU column
loop (one (leaf, cols) slab pass per reflector). ``pair_columns=True``
(``ops/qr_householder.py``, paired form) halves those serial slab passes by
forming two reflectors per pass with one combined rank-2 update —
correctness is pinned in tests/test_ops/test_qr_householder.py; this probe
measures whether it actually moves the end-to-end step on a real chip.

Usage (real TPU, f32 policy like bench.py's device child):
    PNMOL_TPU_X32=1 python experiments/pair_probe.py [N]

Prints one JSON line per config: {"pair": bool, "steps_per_sec": ...}.
Reference anchor this step replaces: /root/reference/src/pnmol/white.py:96-146
(one dense XLA QR of the stacked pre-array per step, per derivative order).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    num_steps = int(os.environ.get("PNMOL_PAIR_STEPS", "128"))
    repeats = int(os.environ.get("PNMOL_PAIR_REPEATS", "3"))

    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.ops import qr_householder
    from pnmol_tpu.solvers import white as white_module

    # relay warm-up flush (see bench.py)
    t0 = time.perf_counter()
    _ = float(jnp.sum(jnp.ones((8,), jnp.float32) * 2.0))
    print(f"# warmup {time.perf_counter() - t0:.1f} s", file=sys.stderr)

    dx = 1.0 / (n_points - 1)
    heat = pnmol_tpu.pde.examples.heat_1d_discretized(
        dx=dx, tmax=1.0,
        kernel=kernels.SquareExponential(input_scale=0.1 / dx),
    )

    results = []
    for pair in (False, True):
        # Size leaf/block through the SAME helper the production solver uses
        # (white.resolve_householder_hooks keys on the state-point count, not
        # the stacked dim), so A/B conclusions transfer to the solver at
        # every n_points — advisor round 4.
        factorization, _ = white_module.resolve_householder_hooks(
            n_points, pair_columns=pair
        )
        solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
            steprule=step_module.Constant(dt=0.001),
            num_derivatives=2,
            spatial_kernel=kernels.Matern52() + kernels.WhiteNoise(),
            factorization=factorization,
        )
        state = solver.initialize(heat)
        step_fn = solver._step_function(heat)
        dtype = state.y.mean.dtype
        dt = jnp.asarray(0.001, dtype)

        def scan_steps(mean, cov, dt):
            # Thread real time through the carry: LINEAR solvers ignore
            # t_next, but this probe gets copied — keep it correct for all.
            def body(carry, _):
                m, c, t = carry
                t2 = t + dt
                m2, c2, *_ = step_fn(m, c, t2, dt)
                return (m2, c2, t2), None

            (m, c, _), _ = jax.lax.scan(
                body, (mean, cov, jnp.zeros((), dtype)), None,
                length=num_steps,
            )
            return m, c

        run = jax.jit(scan_steps)
        m, c = run(state.y.mean, state.y.cov_sqrtm, dt)
        jax.block_until_ready(c)  # compile + first run
        # checksum of the FIRST post-compile run (repeat-count independent):
        # compared across configs below to catch numerical divergence of the
        # paired form on the real end-to-end step
        checksum = float(jnp.sum(m))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            m, c = run(state.y.mean, state.y.cov_sqrtm, dt)
            jax.block_until_ready(c)
            best = min(best, (time.perf_counter() - t0) / num_steps)
        rec = {
            "pair": pair,
            "n": n_points,
            "ms_per_step": best * 1e3,
            "steps_per_sec": 1.0 / best,
            "mean_checksum": checksum,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if len(results) == 2:
        print(json.dumps({
            "speedup_pair_over_single":
                results[0]["ms_per_step"] / results[1]["ms_per_step"],
            "checksum_delta": abs(
                results[1]["mean_checksum"] - results[0]["mean_checksum"]
            ),
        }))


if __name__ == "__main__":
    main()
