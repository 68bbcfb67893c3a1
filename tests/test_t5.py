"""T5 encoder-decoder tests (llm_build_t5_enc/dec + the relative-position
bucket law): HF-oracle parity for both FFN variants through the real
converter, greedy generation, and the bucket function vs HF's."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import t5

torch = pytest.importorskip("torch")


def _build(tmp_path, gated: bool, tied: bool):
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    torch.manual_seed(0)
    hcfg = HFT5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=128, decoder_start_token_id=0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=tied)
    model = T5ForConditionalGeneration(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / f"t5_{gated}_{tied}.gguf"
    convert_llm(sd, hcfg.to_dict(), str(path), arch="t5")
    reader = GGUFReader(str(path))
    cfg = t5.T5Config.from_gguf(reader.kv)
    params = t5.load_params(reader, cfg)
    return model, cfg, params


def test_rel_bucket_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    q = np.arange(12)
    for bidir in (True, False):
        want = T5Attention._relative_position_bucket(
            torch.tensor(q[None, :].T - q[None, :]).T
            if False else torch.tensor(q[:, None] * 0 + q[None, :]
                                       - q[:, None]),
            bidirectional=bidir, num_buckets=8, max_distance=128).numpy()
        got = np.asarray(t5.rel_bucket(jnp.asarray(q), jnp.asarray(q), 8,
                                       bidir))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("gated", [False, True], ids=["relu", "gated-gelu"])
@pytest.mark.parametrize("tied", [True, False], ids=["tied", "untied"])
def test_t5_logits_match_transformers(tmp_path, gated, tied):
    model, cfg, params = _build(tmp_path, gated, tied)
    assert cfg.d_kv == 8 and cfg.n_buckets == 8
    assert (params["dec_layers"][0].get("ffn_gate") is not None) == gated

    enc = np.array([3, 11, 7, 29, 13], np.int64)
    dec = np.array([0, 5, 9, 2], np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(enc[None]),
                    decoder_input_ids=torch.tensor(dec[None])
                    ).logits[0].numpy()

    enc_out = t5.encode(params, cfg, jnp.asarray(enc, jnp.int32))
    logits = t5.decode(params, cfg, jnp.asarray(dec, jnp.int32), enc_out)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)


def test_t5_greedy_generate_matches_hf(tmp_path):
    model, cfg, params = _build(tmp_path, gated=True, tied=True)
    enc = np.array([3, 11, 7, 29], np.int64)
    with torch.no_grad():
        want = model.generate(
            torch.tensor(enc[None]), max_new_tokens=6, do_sample=False,
            num_beams=1).numpy()[0]
    got = t5.generate_greedy(params, cfg, jnp.asarray(enc, jnp.int32), 6)
    # HF prepends decoder_start and may stop at EOS
    want = [int(x) for x in want[1:]]
    assert got[:len(want)] == want or got == want[:len(got)]
