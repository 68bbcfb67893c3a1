"""BERT encoder arch (embeddings/rerank; reference llm_build_bert +
build_pooling): HF-oracle parity for hidden states, padded-bucket
invariance, mean/cls pooling, and the cross-encoder RANK head."""
import numpy as np
import pytest

from omni_tpu.core.gguf import GGUFReader
from omni_tpu.models import bert

torch = pytest.importorskip("torch")


def _tiny_cfg(**kw):
    from transformers import BertConfig
    base = dict(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_act="gelu", layer_norm_eps=1e-12,
        attn_implementation="eager")
    base.update(kw)
    return BertConfig(**base)


def _convert(model, hcfg, tmp_path, name):
    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.dtypes import GGMLType
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / f"{name}.gguf"
    # f32 storage isolates engine-logic errors from f16 rounding
    convert_llm(sd, hcfg.to_dict(), path, arch="bert", qtype=GGMLType.F32)
    reader = GGUFReader(path)
    return bert.BertConfig.from_gguf(reader.kv), bert.load_params(reader)


def test_bert_hidden_states_match_transformers(tmp_path):
    from transformers import BertModel

    torch.manual_seed(0)
    hcfg = _tiny_cfg()
    model = BertModel(hcfg).eval()
    cfg, params = _convert(model, hcfg, tmp_path, "bert")
    assert cfg.pooling == bert.POOL_CLS

    toks = np.array([2, 9, 31, 7, 40, 3], np.int32)
    tt = np.array([0, 0, 0, 1, 1, 1], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64)),
                    token_type_ids=torch.tensor(tt[None].astype(np.int64)),
                    ).last_hidden_state[0].numpy()

    import jax.numpy as jnp
    ours = np.asarray(bert.forward(
        params, cfg, jnp.asarray(toks), jnp.ones(len(toks), bool),
        jnp.asarray(tt)))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_bert_padded_bucket_invariance(tmp_path):
    """encode() pads to a power-of-two bucket; the validity mask must make
    padding invisible (same embedding as the exact-length run)."""
    from transformers import BertModel
    import jax.numpy as jnp

    torch.manual_seed(1)
    hcfg = _tiny_cfg()
    model = BertModel(hcfg).eval()
    cfg, params = _convert(model, hcfg, tmp_path, "bertpad")
    toks = np.array([2, 9, 31, 7, 3], np.int32)

    exact = np.asarray(bert.pool(
        params, cfg,
        bert.forward(params, cfg, jnp.asarray(toks),
                     jnp.ones(len(toks), bool)),
        jnp.ones(len(toks), bool)))
    exact = exact / np.linalg.norm(exact)
    padded = bert.encode(params, cfg, toks)
    np.testing.assert_allclose(padded, exact, atol=1e-5)
    assert abs(np.linalg.norm(padded) - 1.0) < 1e-5


def test_bert_mean_pooling(tmp_path):
    from transformers import BertModel
    import jax.numpy as jnp

    torch.manual_seed(2)
    hcfg = _tiny_cfg(pooling_type=1)  # MEAN
    model = BertModel(hcfg).eval()
    cfg, params = _convert(model, hcfg, tmp_path, "bertmean")
    assert cfg.pooling == bert.POOL_MEAN

    toks = np.array([2, 9, 31, 3], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))
                    ).last_hidden_state[0].numpy().mean(0)
    ref = ref / np.linalg.norm(ref)
    ours = bert.encode(params, cfg, toks)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_bert_rank_head_matches_sequence_classifier(tmp_path):
    """Cross-encoder rerank: BertForSequenceClassification(num_labels=1)
    logit == our RANK pooling through cls (pooler tanh) + cls.output."""
    from transformers import BertForSequenceClassification

    torch.manual_seed(3)
    hcfg = _tiny_cfg(num_labels=1)
    model = BertForSequenceClassification(hcfg).eval()
    cfg, params = _convert(model, hcfg, tmp_path, "bertrank")
    assert cfg.pooling == bert.POOL_RANK

    toks = np.array([2, 9, 31, 7, 40, 3], np.int32)
    tt = np.array([0, 0, 0, 1, 1, 1], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64)),
                    token_type_ids=torch.tensor(tt[None].astype(np.int64)),
                    ).logits[0].numpy()
    score = bert.encode(params, cfg, toks, token_types=tt, normalize=False)
    np.testing.assert_allclose(np.atleast_1d(score), ref, atol=2e-3)


def test_bert_server_embeddings_and_rerank(tmp_path):
    """omni-server on an encoder GGUF: /v1/embeddings and /rerank route
    through the BERT encoder; generation endpoints 400 (encoder-only)."""
    import json
    import threading
    import urllib.request
    import urllib.error

    from transformers import BertForSequenceClassification

    from omni_tpu.server.main import ServerState, serve
    from omni_tpu.tokenizer import build_tokenizer
    from omni_tpu.tokenizer.bpe import bytes_to_unicode
    from omni_tpu.tokenizer.vocab import TYPE_CONTROL, TYPE_NORMAL
    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.models import bert as bert_mod

    torch.manual_seed(4)
    hcfg = _tiny_cfg(num_labels=1, vocab_size=300)
    model = BertForSequenceClassification(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    alphabet = [bytes_to_unicode()[b] for b in range(256)]
    toks = alphabet + ["<|endoftext|>"] + [f"<pad{i}>" for i in range(43)]
    tokenizer_kv = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.pre": "qwen2",
        "tokenizer.ggml.tokens": toks,
        "tokenizer.ggml.token_type": ([TYPE_NORMAL] * 256
                                      + [TYPE_CONTROL] * 44),
        "tokenizer.ggml.merges": ["Ġ t", "h e"],
        "tokenizer.ggml.eos_token_id": 256,
    }
    path = tmp_path / "bsrv.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="bert",
                tokenizer_kv=tokenizer_kv)

    reader = GGUFReader(path)
    assert reader.kv["general.architecture"] == "bert"
    encoder = (bert_mod.BertConfig.from_gguf(reader.kv),
               bert_mod.load_params(reader))
    tok = build_tokenizer(reader.kv)
    state = ServerState(None, tok, encoder=encoder)
    httpd = serve(state, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(route, obj):
        req = urllib.request.Request(base + route, json.dumps(obj).encode(),
                                     {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    try:
        r = post("/v1/embeddings", {"input": ["hello", "world"]})
        assert len(r["data"]) == 2
        v0 = np.array(r["data"][0]["embedding"])
        assert abs(np.linalg.norm(v0) - 1.0) < 1e-4

        r = post("/rerank", {"query": "hi", "documents": ["a", "b", "c"]})
        assert len(r["results"]) == 3
        scores = [x["relevance_score"] for x in r["results"]]
        assert scores == sorted(scores, reverse=True)

        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/v1/completions", {"prompt": "hi", "n_predict": 2})
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
