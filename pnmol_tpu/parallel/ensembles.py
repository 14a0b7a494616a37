"""Data-parallel ensemble solves: vmapped + sharded filter steps.

The reference runs its hyperparameter grids (figure-2 input-scale sweep,
figure-3 dt x dx grid) as Python loops on one device
(``experiments/figure2.py:109-120``, ``figure3.py:169-275``). Here a batch of
PDE-filter instances with different prior diffusion factors advances as ONE
vmapped step, sharded over the device mesh's ``"batch"`` axis — the dp
dimension of this workload.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pnmol_tpu.solvers import pdefilter
from pnmol_tpu.solvers.white import (
    make_steady_state_white_step,
    make_white_step_fn,
    white_attempt_step,
)


class EnsembleState(NamedTuple):
    """Batched filter state: leading axis = ensemble member."""

    mean: jnp.ndarray  # (E, n, d)
    cov_sqrtm: jnp.ndarray  # (E, D, D)
    diffusion_sum: jnp.ndarray  # (E,)


def stack_caches(caches):
    """Stack per-member solver caches into one batched cache pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *caches)


def make_ensemble_step_fn(*, num_derivatives, f, df, linear, mesh=None):
    """Vmapped white-noise step over a batch of solver caches.

    The returned function takes ``(cache_batched, mean, cov, t_next, dt)``
    where ``cache_batched`` (see :func:`stack_caches`) holds per-member
    arrays with a leading ensemble axis (e.g. different Gram Cholesky factors
    in ``Ql``). With ``mesh`` given, the ensemble axis is sharded over the
    mesh's 'batch' axis so each device advances its members independently —
    no cross-device communication in the step.
    """
    def single(cache, mean, cov, t_next, dt):
        fn = make_white_step_fn(
            cache=cache, num_derivatives=num_derivatives, f=f, df=df, linear=linear
        )
        return fn(mean, cov, t_next, dt)

    batched = jax.vmap(single, in_axes=(0, 0, 0, None, None))

    if mesh is None:
        return jax.jit(batched)

    from jax.sharding import NamedSharding, PartitionSpec

    shard = NamedSharding(mesh, PartitionSpec("batch"))

    @jax.jit
    def sharded_step(cache, mean, cov, t_next, dt):
        mean = jax.lax.with_sharding_constraint(mean, shard)
        return batched(cache, mean, cov, t_next, dt)

    return sharded_step


def dt_sweep_final_states(*, cache, num_derivatives, f, df, linear,
                          mean0, cov0, t0, tmax, dts, mesh=None):
    """All constant-step solves of ONE problem over a dt ladder, as one
    padded vmapped scan (the figure-3 dt-sweep shape, SURVEY.md §2.2 item 4).

    Every lane shares the cache (broadcast, not stacked) and runs its own
    constant schedule; schedules are padded to the longest lane and padded
    steps are masked out (they compute with the lane's real dt and are
    discarded — no dt=0 ever reaches the preconditioner).

    Wall-clock = one scan of max-length over E lanes. On a multi-device
    'batch' axis the lanes advance in parallel, so the sweep costs about one
    finest-dt solve; on a single device the padding is wasted work versus a
    sequential loop (lane lengths of a geometric ladder sum to ~2x the
    longest) — use this on meshes, the host loop on one core.

    Returns ``(means (E, n, d), cov_sqrtms (E, D, D), diffusion_sq (E,))``
    with the covariance factors already calibration-scaled, matching
    ``simulate_final_state`` semantics.
    """
    dts = [float(dt) for dt in dts]
    schedules = [
        pdefilter.constant_step_schedule(t0, tmax, dt) for dt in dts
    ]
    lengths = [len(d) for _, d in schedules]
    max_len = max(lengths)
    E = len(dts)
    dtype = mean0.dtype

    ts_next = np.zeros((E, max_len))
    dts_pad = np.zeros((E, max_len))
    mask = np.zeros((E, max_len), dtype=bool)
    for i, (ts, ds) in enumerate(schedules):
        ts_next[i, : lengths[i]] = ts + ds
        dts_pad[i, : lengths[i]] = ds
        # padded steps reuse the lane's dt (masked out below)
        ts_next[i, lengths[i]:] = ts[-1] + ds[-1]
        dts_pad[i, lengths[i]:] = ds[-1]
        mask[i, : lengths[i]] = True

    ts_next = jnp.asarray(ts_next.T, dtype=dtype)  # (L, E)
    dts_pad = jnp.asarray(dts_pad.T, dtype=dtype)
    mask_arr = jnp.asarray(mask.T)

    def single(cache_arg, mean, cov, t_next, dt):
        return white_attempt_step(
            cache_arg, mean, cov, t_next, dt,
            num_derivatives=num_derivatives, f=f, df=df, linear=linear,
            fused=True,
        )

    lane_step = jax.vmap(single, in_axes=(None, 0, 0, 0, 0))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        shard = NamedSharding(mesh, PartitionSpec("batch"))
    else:
        shard = None

    # cache enters as a traced argument, never a closure (a closed-over cache
    # becomes XLA constants and its products get constant-folded at compile
    # time — the multi-second stall documented in bench.py)
    @jax.jit
    def sweep(cache_arg, mean_b, cov_b):
        def body(carry, xs):
            mean, cov, diff_sum = carry
            t_next, dt, live = xs
            new_mean, new_cov, _, _, diff = lane_step(
                cache_arg, mean, cov, t_next, dt
            )
            keep = live[:, None, None]
            mean = jnp.where(keep, new_mean, mean)
            cov = jnp.where(keep, new_cov, cov)
            diff_sum = diff_sum + jnp.where(live, diff, 0.0)
            return (mean, cov, diff_sum), None

        if shard is not None:
            mean_b = jax.lax.with_sharding_constraint(mean_b, shard)
            cov_b = jax.lax.with_sharding_constraint(cov_b, shard)
        diff0 = jnp.zeros((E,), dtype=dtype)
        (mean, cov, diff_sum), _ = jax.lax.scan(
            body, (mean_b, cov_b, diff0), (ts_next, dts_pad, mask_arr)
        )
        return mean, cov, diff_sum

    mean_b = jnp.broadcast_to(mean0[None], (E,) + mean0.shape)
    cov_b = jnp.broadcast_to(cov0[None], (E,) + cov0.shape)
    mean, cov, diff_sum = sweep(cache, mean_b, cov_b)
    n_steps = jnp.asarray(lengths, dtype=dtype)
    diffusion = diff_sum / n_steps
    cov_scaled = cov * jnp.sqrt(diffusion)[:, None, None]
    return mean, cov_scaled, diffusion


def steady_dt_sweep_final_states(*, cache, num_derivatives, mean0, t0, tmax,
                                 dts, steady_caches, mesh=None):
    """The dt-ladder sweep with FROZEN per-lane stationary factors.

    For linear problems at constant dt the full-QR lane step of
    :func:`dt_sweep_final_states` is pure overhead: every lane's covariance
    recursion converges to its own (dt-specific) Riccati fixed point, so a
    calibration grid only needs the mean-only stationary step per lane —
    O(D*m) instead of O((D+m)^3) per lane-step, which makes figure-3-style
    dt grids near-free (SURVEY.md §2.2 item 4 + the round-3 steady tier).

    ``steady_caches`` is a batched :class:`~pnmol_tpu.solvers.white.
    SteadyStateCache` with leading axis E = len(dts) — stack per-dt results
    of ``converge_white_steady_state`` (one-time init cost, SDA-seeded)
    with :func:`stack_caches`. Each lane advances with ITS OWN frozen
    ``(Sl_inv, L21, err_vec)``; masking semantics match
    :func:`dt_sweep_final_states` exactly.

    Returns ``(means (E, n, d), cov_sqrtms (E, D, D), diffusion_sq (E,))``
    where the covariance factor of lane i is ``steady_caches.cov_inf[i]``
    scaled by the lane's calibration — the stationary analog of
    ``simulate_final_state`` semantics.
    """
    dts = [float(dt) for dt in dts]
    schedules = [
        pdefilter.constant_step_schedule(t0, tmax, dt) for dt in dts
    ]
    lengths = [len(d) for _, d in schedules]
    max_len = max(lengths)
    E = len(dts)
    dtype = mean0.dtype

    ts_next = np.zeros((E, max_len))
    dts_pad = np.zeros((E, max_len))
    mask = np.zeros((E, max_len), dtype=bool)
    for i, (ts, ds) in enumerate(schedules):
        ts_next[i, : lengths[i]] = ts + ds
        dts_pad[i, : lengths[i]] = ds
        ts_next[i, lengths[i]:] = ts[-1] + ds[-1]
        dts_pad[i, lengths[i]:] = ds[-1]
        mask[i, : lengths[i]] = True

    ts_next = jnp.asarray(ts_next.T, dtype=dtype)  # (L, E)
    dts_pad = jnp.asarray(dts_pad.T, dtype=dtype)
    mask_arr = jnp.asarray(mask.T)

    def single(cache_arg, steady_arg, mean, t_next, dt):
        fn = make_steady_state_white_step(
            cache=cache_arg, steady=steady_arg,
            num_derivatives=num_derivatives,
        )
        # the cov argument passes through the stationary step unchanged;
        # feed a (0,0) dummy so the lane carry stays O(n*d)
        new_mean, _, _, _, diff = fn(
            mean, jnp.zeros((0, 0), dtype=mean.dtype), t_next, dt
        )
        return new_mean, diff

    lane_step = jax.vmap(single, in_axes=(None, 0, 0, 0, 0))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        shard = NamedSharding(mesh, PartitionSpec("batch"))
    else:
        shard = None

    @jax.jit
    def sweep(cache_arg, steady_arg, mean_b):
        def body(carry, xs):
            mean, diff_sum = carry
            t_next, dt, live = xs
            new_mean, diff = lane_step(cache_arg, steady_arg, mean, t_next, dt)
            mean = jnp.where(live[:, None, None], new_mean, mean)
            diff_sum = diff_sum + jnp.where(live, diff, 0.0)
            return (mean, diff_sum), None

        if shard is not None:
            mean_b = jax.lax.with_sharding_constraint(mean_b, shard)
        diff0 = jnp.zeros((E,), dtype=dtype)
        (mean, diff_sum), _ = jax.lax.scan(
            body, (mean_b, diff0), (ts_next, dts_pad, mask_arr)
        )
        return mean, diff_sum

    mean_b = jnp.broadcast_to(mean0[None], (E,) + mean0.shape)
    mean, diff_sum = sweep(cache, steady_caches, mean_b)
    n_steps = jnp.asarray(lengths, dtype=dtype)
    diffusion = diff_sum / n_steps
    cov_scaled = steady_caches.cov_inf * jnp.sqrt(diffusion)[:, None, None]
    return mean, cov_scaled, diffusion
