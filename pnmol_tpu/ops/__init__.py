"""Numerical kernel layer: random variables, square-root Kalman linalg, priors.

TPU-native counterpart of the reference's ``pnmol.base`` package
(``/root/reference/src/pnmol/base/``). Everything here is pure, jit-safe, and
shape-static; the hot operations come in two flavors — a dense "oracle" form
mirroring the reference math for tests, and a structured product form used by
the solvers so that no Kronecker matrix is ever materialized in the step loop.
"""

from pnmol_tpu.ops import iwp, kalman, rv, sqrt, stacked_ssm

__all__ = ["iwp", "kalman", "rv", "sqrt", "stacked_ssm"]
