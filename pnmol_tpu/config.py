"""Global numerics configuration for pnmol_tpu.

The reference implementation forces float64 globally at import time
(``/root/reference/src/pnmol/__init__.py:8-11``). On TPU, float64 is emulated
and slow, so this build makes precision a *policy*:

- By default, x64 is enabled (CPU-oracle parity; the rtol-1e-8 reproduction
  gate in BASELINE.md requires it).
- Setting the environment variable ``PNMOL_TPU_X32=1`` *before importing*
  ``pnmol_tpu`` leaves JAX in float32 mode: all internal constructors then
  produce f32 arrays, which is the fast path on the TPU MXU.

Use :func:`default_dtype` in library code instead of hard-coding a dtype.
"""

import os

import jax
import jax.numpy as jnp

_X64_DISABLED = os.environ.get("PNMOL_TPU_X32", "0") == "1"


def setup() -> None:
    """Apply the precision policy. Called once from ``pnmol_tpu.__init__``."""
    if not _X64_DISABLED:
        jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_dtype():
    """The dtype library constructors should use."""
    return jnp.float64 if x64_enabled() else jnp.float32
