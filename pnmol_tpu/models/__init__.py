"""PDE problem layer: base classes, mixins, and example recipes.

Capability parity with ``/root/reference/src/pnmol/pde/``. Importable both as
``pnmol_tpu.models`` (this build's layout) and ``pnmol_tpu.pde`` (reference-
compatible alias).
"""

from pnmol_tpu.models import examples, mixins, problems

__all__ = ["examples", "mixins", "problems"]
