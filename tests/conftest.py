"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device code paths without TPU hardware (mirrors
the reference's CPU-as-oracle strategy, see SURVEY.md §4)."""

import os
import sys

# Force an 8-device CPU platform even when the environment preselects a TPU
# plugin (the axon plugin rewrites JAX_PLATFORMS during import, so plain env
# vars are not enough): import jax first, then override config before any
# backend initialization. Tests are the CPU oracle; the real chip is
# exercised by bench.py and scripts/tpu_smoke.py.
import jax  # noqa: E402

os.environ["JAX_PLATFORMS"] = "cpu"
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_GGUF_PY = "/root/reference/gguf-py"


@pytest.fixture(scope="session")
def oracle():
    """The reference repo's numpy GGUF codec, used as a bit-exactness oracle
    (imported from the read-only mount; skipped if unavailable)."""
    if not os.path.isdir(REFERENCE_GGUF_PY):
        pytest.skip("reference gguf-py not available")
    if REFERENCE_GGUF_PY not in sys.path:
        sys.path.insert(0, REFERENCE_GGUF_PY)
    import gguf.quants as oracle_quants

    return oracle_quants


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
