"""Every console entry point parses --help (imports + arg wiring intact)."""

import pytest


@pytest.mark.parametrize("mod,main", [
    ("omni_tpu.cli.omni_cli", "main"),
    ("omni_tpu.cli.bench", "main"),
    ("omni_tpu.cli.quantize", "main"),
    ("omni_tpu.cli.perplexity", "main"),
    ("omni_tpu.cli.imatrix", "main"),
    ("omni_tpu.cli.gguf_split", "main"),
    ("omni_tpu.cli.cvector", "main"),
    ("omni_tpu.server.main", "main"),
])
def test_cli_help(mod, main):
    import importlib

    fn = getattr(importlib.import_module(mod), main)
    with pytest.raises(SystemExit) as e:
        fn(["--help"])
    assert e.value.code == 0


def test_make_tiny_model(tmp_path):
    import sys

    sys.path.insert(0, "tools")
    import make_tiny_model

    out = tmp_path / "m.gguf"
    make_tiny_model.main([str(out), "--arch", "llama", "--qtype", "Q4_K"])
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3

    r = GGUFReader(out)
    cfg = qwen3.Qwen3Config.from_gguf(r.kv)
    assert cfg.rope_neox is False
