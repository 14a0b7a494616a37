"""Scale demonstration: 2-D diffusion at N=1e4 grid points (BASELINE.md).

Runs the full pipeline — mesh, dx-adapted FD assembly, structured init,
f32 stepping — on the accelerator, and separately times Gram assembly
(Pallas kernel vs the XLA jnp path). Results are recorded in docs/SCALE.md.

Usage (f32 end-to-end; run under the X32 policy):
    PNMOL_TPU_X32=1 python experiments/scale_demo.py step --n 100 --nu 1
    PNMOL_TPU_X32=1 python experiments/scale_demo.py gram --n 10000

Prints one JSON line per measurement.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def _sync(x):
    jax.block_until_ready(x)
    return x


def demo_step(n_side, nu, num_steps, fused, dim=2, factorization="xla",
              solver_name="white", propagate_band=None, steady_state=False,
              steady_iters=None, steady_tol=None, steady_dtype=None,
              steady_chunk=None, steady_seed=True, dt=1e-3):
    import functools

    import pnmol_tpu
    from pnmol_tpu import discretize, kernels
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.solvers import latent as latent_module
    from pnmol_tpu.solvers import white as white_module

    t0 = time.perf_counter()
    dx = 1.0 / (n_side - 1)
    if dim == 1:
        # the 1-D N-ladder family (bench.py's problem at arbitrary N; the
        # latent ladder runs here — docs/SCALE.md)
        heat = pnmol_tpu.pde.examples.heat_1d_discretized(
            dx=dx,
            tmax=1.0,
            kernel=kernels.SquareExponential(input_scale=0.1 / dx),
        )
    elif dim == 2:
        heat = pnmol_tpu.pde.examples.heat_2d_discretized(
            num_points=(n_side, n_side),
            kernel=kernels.SquareExponential(input_scale=0.15 / dx),
            stencil_size_interior=5,
            stencil_size_boundary=5,
            nugget_gram_matrix_fd=1e-10,
            tmax=1.0,
        )
    else:
        # 3-D advection-diffusion (the BASELINE.md N=1e5 family, at the
        # largest size one chip holds; beyond that: the sharded step)
        heat = pnmol_tpu.pde.examples.advection_diffusion_discretized(
            dim=3,
            num_points=(n_side,) * 3,
            kernel=kernels.SquareExponential(input_scale=0.15 / dx),
            stencil_size_interior=7,
            stencil_size_boundary=7,
            nugget_gram_matrix_fd=1e-10,
            tmax=1.0,
            velocity=[1.0, 0.5, 0.25],
            diffusion_rate=0.05,
        )
    build_s = time.perf_counter() - t0
    d = heat.L.shape[0]

    t0 = time.perf_counter()
    solver_cls = (
        pnmol_tpu.white.LinearWhiteNoiseEK1
        if solver_name == "white"
        else pnmol_tpu.latent.LinearLatentForceEK1
    )
    solver_kwargs = {}
    if steady_state:
        opts = {}
        if steady_iters is not None:
            opts["max_iters"] = steady_iters
        if steady_tol is not None:
            opts["tol"] = steady_tol
        if steady_dtype is not None:
            opts["dtype"] = steady_dtype
        if steady_chunk is not None:
            opts["chunk_iters"] = steady_chunk
        if not steady_seed:
            opts["seed"] = False
        solver_kwargs["steady_state"] = opts or True
    solver = solver_cls(
        steprule=step_module.Constant(dt=dt),
        num_derivatives=nu,
        spatial_kernel=pnmol_tpu.kernels.Matern52() + pnmol_tpu.kernels.WhiteNoise(),
        factorization=None if factorization == "xla" else factorization,
        fused=fused,
        propagate_band=propagate_band,
        **solver_kwargs,
    )
    state = solver.initialize(heat)
    _sync(state.y.cov_sqrtm)
    init_s = time.perf_counter() - t0
    init_profile = getattr(solver, "init_profile", None)
    if init_profile:
        # per-phase forced-completion breakdown (PNMOL_INIT_PROFILE=1)
        print(json.dumps({"init_profile_seconds": {
            k: round(v, 2) for k, v in init_profile.items()}}), flush=True)
    steady_iters = (
        int(solver.steady_cache.iterations) if steady_state else None
    )
    steady_delta = (
        float(solver.steady_cache.delta) if steady_state else None
    )
    steady_diag = dict(getattr(solver, "steady_diagnostics", {}) or {})
    if steady_state:
        # stability certificate for the frozen closed loop (matvec-only
        # power iteration; rho < 1 <=> the mean recursion is stable)
        rho_fn = (
            white_module.steady_closed_loop_radius
            if solver_name == "white"
            else getattr(latent_module, "steady_closed_loop_radius", None)
        )
        if rho_fn is not None:
            steady_diag["closed_loop_rho"] = round(float(rho_fn(
                solver._cache, solver.steady_cache, dt,
                num_derivatives=nu,
            )), 8)

    cache = solver._cache
    mean, cov = state.y.mean, state.y.cov_sqrtm
    dtype_str = str(mean.dtype)
    dt = jnp.asarray(dt, mean.dtype)
    attempt = (
        white_module.white_attempt_step
        if solver_name == "white"
        else latent_module.latent_attempt_step
    )
    attempt = functools.partial(
        attempt, num_derivatives=nu, f=None, df=None, linear=True,
        fused=fused, factorization=solver.factorization,
        propagate_band=propagate_band,
    )
    if steady_state:
        # mean-only stationary step (no QR in the time loop). The frozen
        # blocks ride as RUNTIME ARGUMENTS through the cache slot — closed
        # over, they would be serialized as constants into the remote
        # compile request (observed HTTP 413 past ~0.5 GB of blocks). The
        # carried cov is a (1, 1) dummy: the stationary factor is frozen,
        # and carrying a second (D, D) alongside the cov_inf in the cache
        # would double-buffer it through donation.
        make_steady = (
            white_module.make_steady_state_white_step
            if solver_name == "white"
            else latent_module.make_steady_state_latent_step
        )

        def attempt(cache_and_steady, m, c, t, dt, _make=make_steady, _nu=nu):
            base, steady = cache_and_steady
            return _make(cache=base, steady=steady, num_derivatives=_nu)(
                m, c, t, dt
            )

        # the mean-only step reads only (L21, Sl_inv, err_vec): strip the
        # (D, D) stationary factor and (m, m) Sl so they don't stay resident
        dummy = jnp.zeros((1, 1), mean.dtype)
        cache = (cache, solver.steady_cache._replace(cov_inf=dummy, Sl=dummy))
        cov = dummy

    # Free everything the step does not consume before it runs: the problem
    # (E_sqrtm etc.), the solver (its IWP holds the (d, d) Gram factor), and
    # the state container — at N = 1e4 these ~GB-scale leftovers are the
    # difference between fitting and ResourceExhausted. The decay check
    # keeps a host copy of the initial solution row.
    mean0_host = jnp.asarray(mean[0, :d]).block_until_ready()
    mean0_max = float(jnp.max(jnp.abs(mean0_host)))
    del mean0_host, state, solver, heat

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def run(cache, mean, cov):
        def body(carry, t):
            m, c = carry
            m, c, _, _, _ = attempt(cache, m, c, t, dt)
            return (m, c), None

        ts = jnp.arange(1, num_steps + 1, dtype=dt.dtype) * dt
        return jax.lax.scan(body, (mean, cov), ts)[0]

    # mean/cov are DONATED: each call consumes its inputs and the timing
    # call continues the solve from the warm-up call's output, so only one
    # state generation is ever resident.
    t0 = time.perf_counter()
    out = run(cache, mean, cov)
    _sync(out)
    float(jnp.sum(out[0]))  # force remote completion
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = run(cache, *out)
    _sync(out)
    float(jnp.sum(out[0]))
    steps_per_sec = num_steps / (time.perf_counter() - t0)

    mean_final = out[0]
    nan_free = not bool(jnp.any(jnp.isnan(mean_final)))
    # latent state glues [solution | latent force]; judge decay on the
    # solution half only
    final_max = float(jnp.abs(mean_final[0, :d]).max())
    decayed = final_max < mean0_max
    decay_ratio = final_max / mean0_max
    print(json.dumps({
        "demo": {1: "heat1d_step", 2: "heat2d_step", 3: "advdiff3d_step"}[dim],
        "solver": solver_name,
        "grid": [n_side] * dim,
        "N": d,
        "state_dim": d * (nu + 1) * (2 if solver_name == "latent" else 1),
        "nu": nu,
        "dtype": dtype_str,
        "device": str(jax.devices()[0]),
        "fused_qr": fused,
        "propagate_band": propagate_band,
        "steady_state": steady_state,
        "steady_riccati_iterations": steady_iters,
        "steady_riccati_delta": steady_delta,
        **({"steady_diagnostics": steady_diag} if steady_diag else {}),
        "steps_per_sec": round(steps_per_sec, 4),
        "build_seconds": round(build_s, 2),
        "init_seconds": round(init_s, 2),
        "compile_seconds": round(compile_s, 2),
        "dt": float(dt),
        "nan_free": nan_free,
        "heat_decays": decayed,
        "decay_ratio": round(decay_ratio, 6),
    }))


def demo_gram(n_points, input_scale):
    """Pallas tiled Gram kernel vs the XLA jnp path at (N, N)."""
    import numpy as np

    from pnmol_tpu.ops import pallas_gram

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(size=(n_points, 2)), dtype=jnp.float32)

    on_tpu = jax.devices()[0].platform != "cpu"

    def time_fn(fn, *args, **kwargs):
        # Force completion by pulling a data-dependent scalar to host:
        # on the remote-execution relay, block_until_ready can return before
        # the work finishes, producing impossible (multi-TB/s) timings.
        out = fn(*args, **kwargs)
        float(jnp.sum(out))  # compile + materialize
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args, **kwargs)))
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_jnp, g_jnp = time_fn(
        pallas_gram.gram_fast_jnp, pts, pts,
        input_scale, 1.0, phi_name="matern52",
    )
    result = {
        "demo": "gram_assembly",
        "N": n_points,
        "device": str(jax.devices()[0]),
        "xla_jnp_seconds": round(t_jnp, 4),
        "gbytes_out": round(n_points * n_points * 4 / 1e9, 2),
    }
    if on_tpu:
        t_pal, g_pal = time_fn(
            pallas_gram.gram_radial, pts, pts,
            input_scale, 1.0, phi_name="matern52",
        )
        result["pallas_seconds"] = round(t_pal, 4)
        result["pallas_speedup_vs_xla"] = round(t_jnp / t_pal, 3)
        result["max_abs_diff"] = float(jnp.max(jnp.abs(g_pal - g_jnp)))
    print(json.dumps(result))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["step", "gram"])
    parser.add_argument("--n", type=int, default=100,
                        help="grid side (step mode) or total points (gram)")
    parser.add_argument("--nu", type=int, default=1)
    parser.add_argument("--dim", type=int, default=2, choices=(1, 2, 3))
    parser.add_argument("--solver", choices=("white", "latent"),
                        default="white")
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--fused", action="store_true")
    parser.add_argument("--propagate-band", default=None,
                        choices=("banded", "interleaved"))
    parser.add_argument("--steady-state", action="store_true",
                        help="freeze the Riccati fixed point at init; "
                             "mean-only steps (linear solvers only)")
    parser.add_argument("--steady-iters", type=int, default=None,
                        help="Riccati max_iters override (default 200)")
    parser.add_argument("--steady-tol", type=float, default=None,
                        help="Riccati stationarity tol override")
    parser.add_argument("--steady-dtype", default=None,
                        choices=("float64",),
                        help="run the Riccati recursion in f64 and cast the "
                             "frozen blocks back (required past D ~ 1e4 in "
                             "f32 — see docs/SCALE.md)")
    parser.add_argument("--steady-chunk", type=int, default=None,
                        help="Riccati iterations per device execution")
    parser.add_argument("--steady-no-seed", action="store_true",
                        help="disable the doubling (SDA) seed and converge "
                             "the recursion from scratch (for comparison)")
    parser.add_argument("--dt", type=float, default=1e-3,
                        help="step size (throughput is dt-independent; the "
                             "Riccati mixes at the dynamics' rate, so "
                             "steady-state runs converge faster at larger dt)")
    parser.add_argument("--input-scale", type=float, default=5.0)
    parser.add_argument("--factorization", choices=("xla", "householder"),
                        default="xla")
    args = parser.parse_args()
    if args.mode == "step":
        demo_step(args.n, args.nu, args.steps, args.fused, dim=args.dim,
                  factorization=args.factorization, solver_name=args.solver,
                  propagate_band=args.propagate_band,
                  steady_state=args.steady_state,
                  steady_iters=args.steady_iters, steady_tol=args.steady_tol,
                  steady_dtype=args.steady_dtype,
                  steady_chunk=args.steady_chunk,
                  steady_seed=not args.steady_no_seed, dt=args.dt)
    else:
        demo_gram(args.n, args.input_scale)
