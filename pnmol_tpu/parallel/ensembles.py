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

from pnmol_tpu.solvers.white import make_white_step_fn


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
