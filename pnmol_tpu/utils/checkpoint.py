"""Checkpoint / resume of filter states (absent in the reference, SURVEY.md §5).

Persists :class:`pnmol_tpu.solvers.pdefilter.PDEFilterState` (t, mean,
covariance factor, diffusion statistics) plus arbitrary auxiliary pytrees.
Uses orbax-checkpoint when available (sharded-array aware, async-capable);
falls back to a plain ``.npz`` representation otherwise — both behind the
same two-function API, so long runs can stop and resume anywhere.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is expected in this image
    _HAVE_ORBAX = False

from pnmol_tpu.ops import rv
from pnmol_tpu.solvers import pdefilter


def _state_to_tree(state: pdefilter.PDEFilterState) -> dict:
    return {
        "t": state.t,
        "mean": state.y.mean,
        "cov_sqrtm": state.y.cov_sqrtm,
        "diffusion_squared_local": state.diffusion_squared_local,
    }


def _tree_to_state(tree: dict) -> pdefilter.PDEFilterState:
    return pdefilter.PDEFilterState(
        t=jnp.asarray(tree["t"]),
        y=rv.MultivariateNormal(
            mean=jnp.asarray(tree["mean"]), cov_sqrtm=jnp.asarray(tree["cov_sqrtm"])
        ),
        error_estimate=None,
        reference_state=None,
        diffusion_squared_local=jnp.asarray(tree["diffusion_squared_local"]),
    )


def save_state(path, state: pdefilter.PDEFilterState, extra: dict | None = None):
    """Write a filter state (and optional auxiliary arrays) to ``path``."""
    path = pathlib.Path(path)
    tree = _state_to_tree(state)
    if extra:
        tree = {**tree, **{f"extra_{k}": v for k, v in extra.items()}}
    if _HAVE_ORBAX:
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            path.resolve(), {k: np.asarray(v) for k, v in tree.items()}, force=True
        )
    else:
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(path.with_suffix(".npz"), **{k: np.asarray(v) for k, v in tree.items()})


def load_state(path):
    """Read back ``(state, extra_dict)`` written by :func:`save_state`."""
    path = pathlib.Path(path)
    if _HAVE_ORBAX and path.exists() and path.is_dir():
        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(path.resolve())
    else:
        with np.load(path.with_suffix(".npz")) as data:
            tree = {k: data[k] for k in data.files}
    extra = {
        k[len("extra_") :]: jnp.asarray(v)
        for k, v in tree.items()
        if k.startswith("extra_")
    }
    core = {k: v for k, v in tree.items() if not k.startswith("extra_")}
    return _tree_to_state(core), extra
