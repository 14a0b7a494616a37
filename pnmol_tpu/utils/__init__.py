"""Auxiliary subsystems: profiling, checkpointing, debugging, typed configs.

The reference has none of these (SURVEY.md §5: wall-clock timing with
``time.time()``, ad-hoc NaN asserts, ``.npy`` persistence only); this package
provides the production-grade equivalents."""

from pnmol_tpu.utils import checkpoint, configs, debug, profiling, resilience

__all__ = ["checkpoint", "configs", "debug", "profiling", "resilience"]
