"""Time-integration layer: PDE-filter driver and EK1 solvers."""

from pnmol_tpu.solvers import latent, pdefilter, smoothing, white

__all__ = ["latent", "pdefilter", "smoothing", "white"]
