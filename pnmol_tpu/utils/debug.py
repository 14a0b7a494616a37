"""NaN policing and state validation at layer boundaries.

The reference patches NaNs ad hoc (SURVEY.md §5: a smoke-test assert, a
hand-coded Matern fix). Here: explicit finite-checks usable inside and
outside jit, and a context manager enabling JAX's global debug-NaN mode.
"""

import contextlib

import jax
import jax.numpy as jnp


def assert_finite(tree, name="pytree"):
    """Host-side check (outside jit): raise if any leaf has NaN/Inf."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = jnp.asarray(leaf)
        if not bool(jnp.all(jnp.isfinite(arr))):
            key = jax.tree_util.keystr(path)
            raise FloatingPointError(f"Non-finite values in {name}{key}")


def checkify_finite(x, name="array"):
    """Jit-compatible check: returns x, aborting with jax.debug if non-finite."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))

    def report(b):
        jax.debug.print("WARNING: non-finite values detected in " + name + ": {b}", b=b)

    jax.lax.cond(bad, lambda: report(bad), lambda: None)
    return x


@contextlib.contextmanager
def debug_nans(enable=True):
    """Enable jax_debug_nans within a scope (errors at the producing op)."""
    previous = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", previous)


def validate_solution(sol):
    """Finite-check a PDESolution (means + covariance factors)."""
    assert_finite({"mean": sol.mean, "cov_sqrtm": sol.cov_sqrtm}, "solution")
    return sol


def dump_live_arrays(tag="", top=25, min_mb=1.0):
    """Print the largest live device arrays (size-sorted), gated by
    ``PNMOL_DEBUG_LIVE=1``.

    The tool that localizes ResourceExhausted at large N: XLA's OOM
    message lists the failing allocation, not what is already resident
    (docs/SCALE.md "N=1e4 single-chip" — the walls were always dead
    buffers someone still referenced).
    """
    import os

    if os.environ.get("PNMOL_DEBUG_LIVE") != "1":
        return
    rows = []
    total = 0
    for arr in jax.live_arrays():
        try:
            nbytes = arr.size * arr.dtype.itemsize
        except Exception:
            continue
        total += nbytes
        if nbytes >= min_mb * 1e6:
            rows.append((nbytes, tuple(arr.shape), str(arr.dtype)))
    rows.sort(reverse=True)
    print(f"[live_arrays:{tag}] total={total/1e9:.2f} GB, "
          f"{len(rows)} arrays >= {min_mb} MB", flush=True)
    for nbytes, shape, dtype in rows[:top]:
        print(f"  {nbytes/1e9:7.3f} GB  {dtype:10s} {shape}", flush=True)
