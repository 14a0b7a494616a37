"""Multi-device layer: device meshes, sharded Gram/linalg, ensemble solves.

The reference is single-process/single-device (SURVEY.md §2.2); this package
provides the TPU-native scaling equivalents: ``jax.sharding.Mesh`` helpers,
sharded Gram assembly, and pjit-able ensemble parameter sweeps.
"""

from pnmol_tpu.parallel import ensembles, meshes, sharded_filter, sharded_linalg

__all__ = ["ensembles", "meshes", "sharded_filter", "sharded_linalg"]
