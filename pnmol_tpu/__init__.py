"""pnmol_tpu — TPU-native probabilistic numerical method of lines.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
``pnmol`` package (PNMOL: Krämer, Schmidt, Hennig, AISTATS 2022). The public
surface mirrors the reference (``/root/reference/src/pnmol/__init__.py:3``):

    import pnmol_tpu
    pnmol_tpu.pde.examples.heat_1d_discretized(...)
    pnmol_tpu.white.LinearWhiteNoiseEK1(...)

but the internals are TPU-first: Kronecker-structured state-space operators,
fully jitted scan/while step loops, and (optionally) fused Pallas kernels.
"""

from pnmol_tpu import config as _config

_config.setup()

from pnmol_tpu import diffops, discretize, kernels, mesh, ops, utils
from pnmol_tpu import models
from pnmol_tpu import models as pde  # reference-compatible alias: pnmol.pde
from pnmol_tpu import odetools, parallel
from pnmol_tpu.solvers import latent, pdefilter, white

__version__ = "0.2.0"

__all__ = [
    "config",
    "diffops",
    "discretize",
    "kernels",
    "latent",
    "mesh",
    "models",
    "ops",
    "odetools",
    "parallel",
    "utils",
    "pde",
    "pdefilter",
    "white",
]
