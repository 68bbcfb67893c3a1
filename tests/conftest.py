"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device code paths without TPU hardware (mirrors
the reference's CPU-as-oracle strategy, see SURVEY.md §4)."""

import os
import sys

# Must be set before jax is imported anywhere. Force CPU even when the
# environment preselects the TPU platform: tests are the CPU oracle; the
# real chip is exercised by bench.py and scripts/tpu_smoke.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

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
