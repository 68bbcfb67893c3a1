"""Multi-host runtime: jax.distributed + hybrid ICI/DCN meshes.

The TPU-native replacement for the reference's only distribution mechanism,
the ggml-rpc TCP offload backend (SURVEY.md §2.8): instead of shipping
tensors/graphs to remote machines, every host runs the SAME SPMD program —
jax.distributed wires the processes, the mesh places `tp` inside a host
(ICI collectives) and `dp` across hosts (DCN), and GSPMD inserts the
all-reduce/all-gather traffic. Continuous-batching request state stays
host-local per dp shard (the server scheduler is per-host; requests are
routed by any front-end LB).

Single-host and multi-host use the same entry points; everything here
degrades to the local device list when jax.distributed is not initialized.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). Returns True if multi-process."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 or not coordinator:
        return False
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("JAX_PROCESS_ID", "0")))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_multihost_mesh(n_tp: int | None = None) -> Mesh:
    """(dp, tp) mesh: tp spans the devices of one host (ICI), dp spans
    hosts (DCN). On a single host this degrades to (1, n_local) or a
    (dp, tp) split of the local devices."""
    devices = jax.devices()
    n_hosts = max(jax.process_count(), 1)
    per_host = len(devices) // n_hosts
    n_tp = n_tp or per_host
    assert per_host % n_tp == 0, (per_host, n_tp)
    dp = n_hosts * (per_host // n_tp)
    # order devices host-major so tp groups stay inside one host's ICI
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.array(devs).reshape(dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


def scaling_report(mesh: Mesh) -> dict:
    """Topology summary for logs/metrics (the multi-host observability the
    reference's rpc path lacks)."""
    return {
        "n_processes": jax.process_count(),
        "n_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "mesh_shape": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "platform": jax.devices()[0].platform,
    }
