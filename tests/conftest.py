"""Test configuration: CPU backend, x64, 8 virtual devices for sharding tests.

The container's site hook force-registers the remote TPU ("axon") platform and
programmatically overrides JAX_PLATFORMS, so the env var alone is not enough —
the backend must be pinned via jax.config before any computation runs
(SURVEY.md §4: multi-device tests run on a virtual CPU mesh).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
