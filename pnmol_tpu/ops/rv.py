"""Gaussian random-variable containers.

Capability parity with ``/root/reference/src/pnmol/base/rv.py:9-14``: a
mean + covariance-Cholesky pair that is a JAX pytree (NamedTuples register
automatically), so it can flow through ``jit``/``scan``/``vmap`` untouched.
The full covariance is never stored — only reconstructed on demand.
"""

from typing import NamedTuple

import jax.numpy as jnp


class MultivariateNormal(NamedTuple):
    """Multivariate normal with square-root (Cholesky) covariance storage."""

    mean: jnp.ndarray
    cov_sqrtm: jnp.ndarray

    @property
    def cov(self) -> jnp.ndarray:
        return self.cov_sqrtm @ self.cov_sqrtm.T
