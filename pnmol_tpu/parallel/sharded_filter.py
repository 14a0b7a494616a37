"""Space-sharded single-instance filter steps (the large-N scaling path).

The collocation-point dimension is this workload's sequence-length analog
(SURVEY.md §5): at N = 1e4-1e5 points the (D, D) covariance factor no longer
fits (or computes) on one chip. Here the white-noise EK1 step runs with its
covariance factor row-sharded over the device mesh's ``"space"`` axis;
sharding constraints pin the layout and GSPMD inserts the collectives for
the QR/matmul chain over ICI.

Current status: layouts + collectives are XLA-managed (correct on any mesh,
validated against the unsharded step); the hand-scheduled distributed
pre-array QR (TSQR panels, :func:`pnmol_tpu.parallel.sharded_linalg.tsqr_r`)
is the drop-in upgrade path for the factorization itself.
"""

import jax

from jax.sharding import NamedSharding, PartitionSpec

from pnmol_tpu.solvers import white as white_module


def make_space_sharded_white_step(*, cache, num_derivatives, mesh, f=None,
                                  df=None, linear=True):
    """White-noise EK1 step with (D, D) covariance rows sharded over 'space'.

    Returns a jitted ``step(mean, cov, t_next, dt)`` whose covariance inputs/
    outputs carry a row-sharding constraint over the mesh. The cache's
    ``Ql`` should be device_put with the same sharding by the caller for
    zero-copy execution.
    """
    inner = white_module.make_white_step_fn(
        cache=cache, num_derivatives=num_derivatives, f=f, df=df, linear=linear
    )
    row_sharding = NamedSharding(mesh, PartitionSpec("space", None))
    replicated = NamedSharding(mesh, PartitionSpec())

    @jax.jit
    def step(mean, cov, t_next, dt):
        mean = jax.lax.with_sharding_constraint(mean, replicated)
        cov = jax.lax.with_sharding_constraint(cov, row_sharding)
        new_mean, new_cov, err, ref, diff = inner(mean, cov, t_next, dt)
        new_cov = jax.lax.with_sharding_constraint(new_cov, row_sharding)
        return new_mean, new_cov, err, ref, diff

    return step


def shard_cache(cache, mesh):
    """Place the step cache on the mesh: Ql row-sharded, small operands
    replicated."""
    row_sharding = NamedSharding(mesh, PartitionSpec("space", None))
    replicated = NamedSharding(mesh, PartitionSpec())

    def place(name, value):
        if name == "Ql":
            return jax.device_put(value, row_sharding)
        return jax.device_put(value, replicated)

    return type(cache)(**{k: place(k, v) for k, v in cache._asdict().items()})
