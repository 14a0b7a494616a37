"""ODE-solver utilities: step-size rules, initialization, IVP container,
and the in-house MOL baseline filter (tornadox replacement)."""

from pnmol_tpu.odetools import init, ivp, step

__all__ = ["init", "ivp", "step"]
