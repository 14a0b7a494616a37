"""Multi-host runtime seam (SURVEY.md §2.2 item 1).

The reference is single-process/single-device; the TPU-native scale path
(v5p pods) runs one process per host with ``jax.distributed`` providing the
cross-host runtime. This module is that seam:

* :func:`init_distributed` — idempotent wrapper around
  ``jax.distributed.initialize`` with environment-driven defaults
  (``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` / ``PROCESS_ID``); on TPU
  pods the arguments are auto-detected by JAX and the call collapses to
  ``jax.distributed.initialize()``.
* :func:`global_mesh` — the (batch, space) mesh of
  :func:`pnmol_tpu.parallel.meshes.make_mesh` built over *global* devices,
  so every sharded component in this package (sharded Gram/collocation,
  blocked QR, space-sharded steps, ensembles) transparently spans hosts:
  GSPMD lowers the same programs with ICI collectives intra-host and DCN
  collectives across hosts.
* :func:`two_process_cpu_dryrun` — code-complete validation on a rig
  without a pod: spawns two local processes, each with 2 virtual CPU
  devices, initializes the distributed runtime between them, builds the
  4-device global mesh and runs a psum plus a space-sharded white-filter
  step over it.
"""

import os
import socket
import subprocess
import sys

_INITIALIZED = False


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None, local_device_ids=None):
    """Initialize the cross-host runtime (idempotent).

    Arguments default to the ``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` /
    ``PROCESS_ID`` environment variables; with none given (and none set),
    JAX's own auto-detection runs — the right behavior on Cloud TPU pods.
    Single-process runs (num_processes == 1 or nothing configured) are a
    no-op so library code can call this unconditionally.
    """
    import jax

    global _INITIALIZED
    if _INITIALIZED:
        return True  # idempotent: repeated calls are no-ops

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False  # nothing configured: single-process mode
    if num_processes == 1:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True
    return True


def global_mesh(batch=None):
    """(batch, space) mesh over all *global* devices (every host's chips)."""
    from pnmol_tpu.parallel import meshes

    return meshes.make_mesh(batch=batch)


_WORKER_CODE = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_enable_x64", True)

from pnmol_tpu.parallel import distributed

started = distributed.init_distributed()
assert started, "distributed runtime did not start"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())  # 2 hosts x 2 devices

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec

import pnmol_tpu
from pnmol_tpu.odetools import step as step_module
from pnmol_tpu.parallel import sharded_filter
from pnmol_tpu.parallel.meshes import make_mesh

mesh = distributed.global_mesh(batch=1)
assert mesh.devices.size == 4

# cross-process collective sanity: a psum over the global mesh
from jax import shard_map
ones = jnp.ones((4,))
total = jax.jit(
    shard_map(
        lambda x: jax.lax.psum(x, "space"),
        mesh=mesh,
        in_specs=PartitionSpec("space"),
        out_specs=PartitionSpec(),
        check_vma=False,
    )
)(ones)
assert float(total[0]) == 4.0, total

# a space-sharded filter step over the 2-host mesh
heat = pnmol_tpu.pde.examples.heat_1d_discretized(dx=1.0 / 15, tmax=1.0)
solver = pnmol_tpu.white.LinearWhiteNoiseEK1(
    steprule=step_module.Constant(0.05),
    spatial_kernel=pnmol_tpu.kernels.Matern52() + pnmol_tpu.kernels.WhiteNoise(),
)
state = solver.initialize(heat)
cache = sharded_filter.shard_cache(solver._cache, mesh, distributed_qr=True)
step = sharded_filter.make_space_sharded_white_step(
    cache=cache, num_derivatives=2, mesh=mesh, linear=True,
    distributed_qr=True, panel_size=16,
)
with mesh:
    out = step(state.y.mean, state.y.cov_sqrtm,
               jnp.asarray(0.05), jnp.asarray(0.05))
    jax.block_until_ready(out)
import numpy as np
local = np.asarray(jax.device_get(out[0]))
assert not np.any(np.isnan(local))
print(f"worker {jax.process_index()}: 2-host dryrun OK, mean shape {local.shape}",
      flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def two_process_cpu_dryrun(timeout=600):
    """Validate the multi-host seam with two local CPU processes.

    Each worker pins 2 virtual CPU devices, joins the distributed runtime,
    and runs a cross-process psum plus a distributed-QR filter step over the
    global 4-device mesh. Raises on any worker failure; returns the workers'
    stdout for inspection.
    """
    port = _free_port()
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            PYTHONPATH=here + os.pathsep + env.get("PYTHONPATH", ""),
        )
        env.pop("PNMOL_TPU_X32", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER_CODE],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    failed = []
    for pid, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
            failed.append((pid, "timeout", out))
            continue
        outputs.append(out)
        if proc.returncode != 0:
            failed.append((pid, proc.returncode, out))
    if failed:
        details = "\n---\n".join(
            f"worker {pid} ({rc}):\n{out[-3000:]}" for pid, rc, out in failed
        )
        raise RuntimeError(f"two-process dryrun failed:\n{details}")
    return outputs
