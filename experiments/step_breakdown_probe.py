"""Attribute the small-N white-step wall-clock across its components.

The roofline note (docs/SCALE.md) says N=512 runs at ~0.37x of the
correct-arithmetic ceiling and blames dispatch/epilogue overhead on
millisecond-scale steps. This probe measures, on the real device and in one
process (one relay warm-up):

* the full fused Householder-LQ step (the bench configuration),
* the LQ factorization alone on the step's pre-array shape,
* the epilogue pieces: gain triangular solve, error-estimate Cholesky +
  cho_solve, the predict/measurement matmul chain,
* the step with the leaf-kernel sweep vs the fused block-panel kernel.

Each timing is a jitted lax.scan of ``--steps`` iterations (so per-op launch
overhead is represented exactly as in the bench), forced-completion timed.

Usage:
    PNMOL_TPU_X32=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python experiments/step_breakdown_probe.py --n 512 --steps 32
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def timed_scan(fn, operands, num_steps, label):
    """Time a jitted scan of ``fn`` threaded over its first operand."""

    @jax.jit
    def run(ops):
        def body(carry, _):
            return fn(carry, *ops[1:]), None

        out, _ = jax.lax.scan(body, ops[0], jnp.arange(num_steps))
        return out

    t0 = time.perf_counter()
    out = run(operands)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(operands)
        jax.block_until_ready(out)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    ms = best / num_steps * 1e3
    print(json.dumps({"component": label, "ms_per_iter": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def main(n_points, nu, num_steps):
    import pnmol_tpu
    from pnmol_tpu import kernels
    from pnmol_tpu.odetools import step as step_module
    from pnmol_tpu.ops import iwp, qr_householder as qh
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
    d = mean.shape[1]
    D = cov.shape[0]
    m_dim = d + cache.B.shape[0]
    print(json.dumps({"d": d, "D": D, "m": m_dim}), flush=True)

    # ---- full step, three sweep variants -------------------------------
    def full_step(fact):
        def step(carry):
            m, c = carry
            m, c, _, _, _ = white_module.white_attempt_step(
                cache, m, c, dt, dt, num_derivatives=nu, f=None, df=None,
                linear=True, fused=True, factorization=fact,
            )
            return (m, c)

        return step

    for label, fact in (
        ("step_xla_qr", None),
        ("step_hh_leaf", qh.make_householder_lq_factorization(panel="leaf")),
        ("step_hh_block", qh.make_householder_lq_factorization(panel="block")),
    ):
        timed_scan(lambda carry: full_step(fact)(carry), ((mean, cov),),
                   num_steps, label)

    # ---- LQ alone on the step's fused pre-array shape -------------------
    rng = jax.random.PRNGKey(0)
    W = jax.random.normal(rng, (m_dim + D, 2 * D + m_dim), dtype)

    def lq_only(panel):
        def fn(w):
            L = qh._blocked_lq_l_impl(w, panel=panel)
            # keep the carry shape: re-embed L into a same-shape w
            return w + jnp.pad(
                L, ((0, 0), (0, w.shape[1] - L.shape[1]))
            ) * 1e-30

        return fn

    timed_scan(lambda w: lq_only("leaf")(w), (W,), num_steps, "lq_leaf")
    timed_scan(lambda w: lq_only("block")(w), (W,), num_steps, "lq_block")

    # ---- epilogue pieces -------------------------------------------------
    L1 = jnp.tril(jax.random.normal(rng, (m_dim, m_dim), dtype)) + \
        10.0 * jnp.eye(m_dim, dtype=dtype)
    L21 = jax.random.normal(rng, (D, m_dim), dtype)

    def gain_solve(l21):
        return jax.scipy.linalg.solve_triangular(L1, l21.T, lower=True,
                                                 trans=1).T

    timed_scan(lambda l21: gain_solve(l21), (L21,), num_steps, "gain_trisolve")

    from pnmol_tpu.ops import trisolve

    def gain_solve_blocked(l21):
        return trisolve.tri_solve_lower_blocked(L1, l21.T, transpose=True).T

    timed_scan(lambda l21: gain_solve_blocked(l21), (L21,), num_steps,
               "gain_trisolve_blocked")

    S = L1 @ L1.T
    z = jax.random.normal(rng, (m_dim,), dtype)

    def err_est(s):
        S_chol = jnp.linalg.cholesky(s)
        w = jax.scipy.linalg.cho_solve((S_chol, True), z)
        return s + (z @ w) * 1e-30

    timed_scan(lambda s: err_est(s), (S,), num_steps, "error_estimate_chol")

    # ---- predict + measurement products ---------------------------------
    n = nu + 1

    def predict_products(c):
        M = mean * 1.0
        Mp = cache.A1d @ M
        ACl = iwp.apply_stack_matrix(cache.A1d, c)
        HQl = cache.L @ iwp.project_derivative(cache.Ql, 0, n)
        HACl = cache.L @ iwp.project_derivative(ACl, 0, n)
        return c + 1e-30 * (ACl + jnp.mean(HQl) + jnp.mean(HACl)
                            + jnp.mean(Mp))

    timed_scan(lambda c: predict_products(c), (cov,), num_steps,
               "predict_and_measurement_products")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--nu", type=int, default=2)
    p.add_argument("--steps", type=int, default=32)
    a = p.parse_args()
    main(a.n, a.nu, a.steps)
