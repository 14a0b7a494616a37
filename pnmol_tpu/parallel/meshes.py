"""Device-mesh construction helpers.

Axis conventions for this framework (the PDE-filter analog of dp/tp/sp):

* ``"batch"`` — data parallel over independent solves (ensembles, figure-2/3
  hyperparameter grids).
* ``"space"`` — sharding of the collocation-point dimension (the sequence-
  parallel analog, SURVEY.md §5): Gram rows, covariance-factor panels.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices=None, batch=None, axis_names=("batch", "space")):
    """Build a 2-D ('batch', 'space') mesh over the first ``n_devices`` devices.

    ``batch`` fixes the data-parallel axis size; by default the mesh is split
    as evenly as possible with the batch axis no larger than the space axis.
    """
    devices = jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    devices = devices[:n]
    if batch is None:
        batch = 1
        for candidate in range(int(np.sqrt(n)), 0, -1):
            if n % candidate == 0:
                batch = candidate
                break
    if n % batch != 0:
        raise ValueError(f"batch={batch} must divide n_devices={n}")
    grid = np.asarray(devices).reshape(batch, n // batch)
    return Mesh(grid, axis_names)


def batch_sharding(mesh):
    return NamedSharding(mesh, PartitionSpec("batch"))


def space_sharding(mesh, rank=1):
    """Shard the leading array axis over the 'space' mesh axis."""
    spec = PartitionSpec("space", *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh):
    return NamedSharding(mesh, PartitionSpec())
