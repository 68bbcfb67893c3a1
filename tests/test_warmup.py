"""Cold-start shipping: cache-dir selection + omni-warmup CLI smoke
(reference analog: mmap-and-serve startup, src/llama-model-loader.cpp —
on TPU the cold cost is XLA compilation, shipped as persistent-cache
entries in omni_tpu/_warmcache)."""

import os

from omni_tpu import _choose_cache_dir


def test_choose_cache_dir_prefers_populated_seed(tmp_path):
    seed = tmp_path / "seed"
    local = tmp_path / "local"
    # no seed dir -> local
    assert _choose_cache_dir(str(seed), str(local)) == str(local)
    # empty seed dir -> local
    seed.mkdir()
    assert _choose_cache_dir(str(seed), str(local)) == str(local)
    # populated, writable seed -> seed itself
    (seed / "jit_step-abc-cache").write_bytes(b"x" * 32)
    assert _choose_cache_dir(str(seed), str(local)) == str(seed)


def test_choose_cache_dir_materializes_readonly_seed(tmp_path, monkeypatch):
    seed = tmp_path / "seed"
    local = tmp_path / "local"
    seed.mkdir()
    (seed / "jit_step-abc-cache").write_bytes(b"payload")
    (seed / "README.md").write_text("doc")
    # chmod is ineffective under root (os.access always True); simulate the
    # read-only install by patching the writability probe
    real_access = os.access
    monkeypatch.setattr(
        os, "access",
        lambda p, mode: False if str(p) == str(seed) and mode == os.W_OK
        else real_access(p, mode))
    got = _choose_cache_dir(str(seed), str(local))
    assert got == str(local)
    assert (local / "jit_step-abc-cache").read_bytes() == b"payload"
    assert not (local / "README.md").exists()


def test_warmup_cli_smoke(tmp_path):
    """omni-warmup on a tiny real GGUF populates the given cache dir with
    the serving executables (prefill buckets + decode scan)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from omni_tpu.cli.warmup import main
    from omni_tpu.core import GGMLType
    from omni_tpu.testing import write_tiny_qwen3

    path = tmp_path / "m.gguf"
    # deliberately unusual vocab/width: in a shared pytest process the
    # common tiny shapes are often already jitted, and an in-process hit
    # writes no persistent-cache entry
    write_tiny_qwen3(path, n_layers=1, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=72, n_vocab=307, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    cache = tmp_path / "cache"
    rc = main(["-m", str(path), "-c", "256", "--n-prefill", "16",
               "--cache-dir", str(cache)])
    assert rc == 0
    entries = [f for f in os.listdir(cache) if f.endswith("-cache")]
    assert entries, "warmup produced no cache entries"
