"""Real multi-process jax.distributed smoke (2 CPU processes, gloo).

The reference's multi-node story is the ggml-rpc TCP backend
(/root/reference/ggml/src/ggml-rpc/ggml-rpc.cpp:92-112, exercised only
manually). SURVEY §4.9 demands the TPU build do better: this test spawns
two REAL processes, wires them with jax.distributed, and asserts the
(dp=hosts, tp=local) mesh topology plus cross-host collectives.
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
WORKER = ROOT / "scripts" / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke():
    nproc, per_host = 2, 2
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_host}")
    # don't inherit the single-process test config
    for k in ("JAX_COORDINATOR", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        env.pop(k, None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coordinator, str(nproc), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True, cwd=str(ROOT))
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    for i, out in enumerate(outs):
        rec = json.loads(out.strip().splitlines()[-1])
        assert rec["ok"] and rec["pid"] == i
        assert rec["n_devices"] == nproc * per_host


def test_scaling_bench_harness():
    """The ≥85%-at-2-hosts north-star metric has a measurement harness;
    on the virtual CPU mesh it reports a correctness-grade number."""
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "scaling_bench.py"),
         "--cpu", "--devices", "2", "--steps", "16", "--layers", "2"],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(ROOT))
    assert p.returncode == 0, p.stderr[-2000:]
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert rec["n"] == 2 and rec["correctness_grade"] is True
    assert 0.0 < rec["scaling_efficiency"] <= 1.2
