"""Multi-host bootstrap: ``jax.distributed.initialize`` wiring + the
process-spanning mesh (SURVEY.md §5 "Distributed communication backend":
``jax.distributed.initialize`` + XLA collectives over ICI/DCN).

The reference is single-process (requirements.txt pins no comm backend);
this module is the entry a real pod slice runs unmodified:

* On TPU pods, ``initialize_from_env()`` with no variables set calls
  ``jax.distributed.initialize()`` bare — JAX auto-detects the coordinator
  from the TPU metadata — whenever the environment advertises multi-host
  TPU topology.
* Elsewhere (CPU/GPU clusters, or forcing explicit wiring), set
  ``GFNSPAI_COORDINATOR`` (host:port), ``GFNSPAI_NUM_PROCS`` and
  ``GFNSPAI_PROC_ID`` (JAX's standard ``JAX_COORDINATOR_ADDRESS`` /
  ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` are honored too).

After initialization every ``jax.devices()`` call returns the GLOBAL
device list, so ``make_mesh``/``shard_map`` and everything built on them
(parallel.dp, parallel.solvers, parallel.sampler) work unchanged — mesh
axes simply span processes.  ``global_mesh`` additionally lays hosts out
contiguously along ``rows`` so halo ``ppermute`` neighbors are intra-host
(ICI) wherever possible and only the two boundary exchanges per host cross
DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def multihost_env(environ=None) -> Optional[dict]:
    """Parse the bootstrap variables; None when not configured.  Accepts
    both the GFNSPAI_* names and JAX's standard ones."""
    env = os.environ if environ is None else environ
    coord = env.get("GFNSPAI_COORDINATOR") or env.get("JAX_COORDINATOR_ADDRESS")
    nproc = env.get("GFNSPAI_NUM_PROCS") or env.get("JAX_NUM_PROCESSES")
    pid = env.get("GFNSPAI_PROC_ID") or env.get("JAX_PROCESS_ID")
    if coord is None and nproc is None and pid is None:
        return None
    if coord is None or nproc is None or pid is None:
        raise ValueError(
            "multi-host bootstrap needs all three of GFNSPAI_COORDINATOR, "
            f"GFNSPAI_NUM_PROCS, GFNSPAI_PROC_ID (got coord={coord!r}, "
            f"num={nproc!r}, id={pid!r})")
    nproc_i, pid_i = int(nproc), int(pid)
    if not 0 <= pid_i < nproc_i:
        raise ValueError(f"process id {pid_i} outside [0, {nproc_i})")
    return {"coordinator_address": coord, "num_processes": nproc_i,
            "process_id": pid_i}


def initialize_from_env(environ=None) -> bool:
    """Call ``jax.distributed.initialize`` from environment variables.

    Returns True when a multi-process runtime was initialized, False for
    the single-process no-op.  Must run BEFORE first backend use."""
    cfg = multihost_env(environ)
    if cfg is not None:
        jax.distributed.initialize(**cfg)
        return True
    # bare auto-detect covers real TPU pods (the metadata server supplies
    # the coordinator); skip on single-host setups where it would block
    if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def global_mesh(dp: int = 1, rows: int = 1) -> Mesh:
    """Mesh over ALL processes' devices, hosts contiguous along ``rows``.

    Device order: process-major (jax.devices() already groups by process),
    reshaped (dp, rows) so that consecutive ``rows`` coordinates stay on
    one host as long as rows ≥ local device count — the halo ``ppermute``
    then rides ICI except at host boundaries.  Falls back to ``make_mesh``
    semantics single-process."""
    devices = jax.devices()
    need = dp * rows
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for mesh (dp={dp}, rows={rows}), have "
            f"{len(devices)} across {jax.process_count()} process(es)")
    if dp > 1 and jax.process_count() > 1:
        # hosts along rows: group each process's devices contiguously in
        # the rows dimension, replicating the dp split across processes
        per = len(devices) // jax.process_count()
        if rows % per == 0 and dp <= jax.process_count():
            arr = np.asarray(devices[:need]).reshape(dp, rows)
            return Mesh(arr, ("dp", "rows"))
    arr = np.asarray(devices[:need]).reshape(dp, rows)
    return Mesh(arr, ("dp", "rows"))


def process_summary() -> dict:
    """One-line observability record for run logs."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "backend": jax.default_backend(),
    }
