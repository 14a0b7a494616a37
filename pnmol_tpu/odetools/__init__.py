"""ODE-solver utilities: step-size rules, initialization, IVP container,
and the in-house MOL baseline filter (tornadox replacement)."""

from pnmol_tpu.odetools import ek1, init, ivp, reference_solver, step

__all__ = ["ek1", "init", "ivp", "reference_solver", "step"]
