#!/usr/bin/env python
"""Multi-host smoke worker: one process of an N-process jax.distributed
job on the CPU backend (gloo collectives).

Run by tests/test_multihost.py (and usable manually) to prove the
`parallel/distributed.py` path the reference covers with ggml-rpc
(/root/reference/ggml/src/ggml-rpc/ggml-rpc.cpp:92-112) actually works
with process_count > 1: host-major device ordering, (dp, tp) mesh with
tp confined to one host's devices, and a cross-host collective.

Usage: multihost_worker.py <coordinator> <num_processes> <process_id>
Requires JAX_PLATFORMS=cpu and xla_force_host_platform_device_count in
XLA_FLAGS to be set in the environment BEFORE python starts.
"""
from __future__ import annotations

import json
import os
import sys

# self-contained: runnable without an installed omni_tpu package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")

    from omni_tpu.parallel.distributed import (init_distributed,
                                               make_multihost_mesh,
                                               scaling_report)

    assert init_distributed(coordinator, nproc, pid), "init returned False"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()

    n_local = len(jax.local_devices())
    mesh = make_multihost_mesh(n_tp=n_local)
    rep = scaling_report(mesh)
    assert rep["n_processes"] == nproc, rep
    assert rep["mesh_shape"] == {"dp": nproc, "tp": n_local}, rep

    # tp groups must stay inside one host (ICI, not DCN)
    for row in mesh.devices:
        procs = {d.process_index for d in row}
        assert len(procs) == 1, f"tp group spans hosts: {procs}"
    # dp axis must span hosts
    col_procs = {d.process_index for d in mesh.devices[:, 0]}
    assert len(col_procs) == nproc, f"dp axis does not span hosts: {col_procs}"

    # one real cross-host collective: psum over both axes of a
    # device_put-sharded array == global sum
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = nproc * n_local
    x = np.arange(n_dev * 4, dtype=np.float32).reshape(n_dev, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P(("dp", "tp"), None)))

    @jax.jit
    def total(v):
        return v.sum()

    got = float(total(xs))
    want = float(x.sum())
    assert got == want, (got, want)

    # shard_map psum across the dp (DCN) axis
    from jax.experimental.shard_map import shard_map

    y = jax.device_put(np.ones((nproc, n_local), np.float32),
                       NamedSharding(mesh, P("dp", "tp")))
    f = shard_map(lambda v: jax.lax.psum(v, "dp"), mesh=mesh,
                  in_specs=P("dp", "tp"), out_specs=P(None, "tp"))
    z = np.asarray(jax.jit(f)(y))
    assert (z == nproc).all(), z

    print(json.dumps({"ok": True, "pid": pid, "n_devices": n_dev,
                      "collective_sum": got}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
