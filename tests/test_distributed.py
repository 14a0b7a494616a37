"""Multi-host runtime seam: 2-process CPU validation (SURVEY.md §2.2 item 1).

A real pod is one process per host; here two local processes with 2 virtual
CPU devices each join a jax.distributed runtime and drive a cross-process
psum plus a distributed-QR space-sharded filter step over the global
4-device mesh.
"""

import os

import pytest

from pnmol_tpu.parallel import distributed


def test_init_distributed_is_noop_without_configuration(monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.init_distributed() is False


def test_init_distributed_single_process_noop(monkeypatch):
    monkeypatch.setenv("NUM_PROCESSES", "1")
    assert distributed.init_distributed() is False


def test_two_process_cpu_dryrun():
    outs = distributed.two_process_cpu_dryrun()
    assert len(outs) == 2
    assert all("dryrun OK" in o for o in outs)
