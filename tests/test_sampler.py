"""Sampler chain unit tests (analog of the reference's tests/test-sampling.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.runtime.sampler import (
    SamplerParams,
    apply_min_p,
    apply_penalties,
    apply_top_k,
    apply_top_p,
    apply_typical,
    sample,
    update_prev_tokens,
)


def test_top_k():
    logits = jnp.asarray([1.0, 5.0, 3.0, 4.0, 2.0])
    out = np.asarray(apply_top_k(logits, 2))
    assert np.isfinite(out[[1, 3]]).all()
    assert np.isinf(out[[0, 2, 4]]).all() and (out[[0, 2, 4]] < 0).all()


def test_top_p_keeps_minimal_prefix():
    logits = jnp.log(jnp.asarray([0.5, 0.3, 0.1, 0.05, 0.05]))
    out = np.asarray(apply_top_p(logits, 0.75))
    # 0.5 + 0.3 = 0.8 > 0.75 -> keep first two (boundary token included)
    assert np.isfinite(out[:2]).all()
    assert (out[2:] < -1e20).all()


def test_min_p():
    logits = jnp.log(jnp.asarray([0.6, 0.3, 0.05, 0.05]))
    out = np.asarray(apply_min_p(logits, 0.2))  # cutoff = 0.6*0.2 = 0.12
    assert np.isfinite(out[:2]).all()
    assert (out[2:] < -1e20).all()


def test_penalties_reduce_repeated_token():
    logits = jnp.asarray([2.0, 2.0, -1.0])
    prev = jnp.asarray([0, 0, 2, -1], jnp.int32)
    p = SamplerParams(penalty_repeat=2.0, penalty_last_n=4)
    out = np.asarray(apply_penalties(logits, prev, p))
    assert out[0] == pytest.approx(1.0)  # positive: divided
    assert out[1] == pytest.approx(2.0)  # untouched
    assert out[2] == pytest.approx(-2.0)  # negative: multiplied


def test_penalty_padding_does_not_wrap():
    """Regression: -1 ring padding must not penalize the LAST vocab entry."""
    logits = jnp.asarray([1.0, 1.0, 1.0, 4.0])
    prev = jnp.full((8,), -1, jnp.int32)
    p = SamplerParams(penalty_repeat=10.0, penalty_last_n=8)
    out = np.asarray(apply_penalties(logits, prev, p))
    np.testing.assert_allclose(out, np.asarray(logits))


def test_typical_keeps_mass():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal(64), jnp.float32)
    out = np.asarray(apply_typical(logits, 0.5))
    assert np.isfinite(out).sum() >= 1
    assert np.isfinite(out).sum() < 64


def test_greedy_deterministic():
    logits = jnp.asarray([0.1, 3.0, 0.2])
    key = jax.random.PRNGKey(0)
    p = SamplerParams(greedy=True)
    assert int(sample(logits, key, p)) == 1


def test_dist_respects_filtering():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.linspace(3, -3, 50), jnp.float32)
    p = SamplerParams(temp=1.0, top_k=2, top_p=1.0, min_p=0.0)
    draws = {int(sample(logits, jax.random.fold_in(key, i), p)) for i in range(30)}
    assert draws <= {0, 1}


def test_update_prev_tokens_ring():
    prev = jnp.asarray([-1, -1, 5], jnp.int32)
    out = np.asarray(update_prev_tokens(prev, jnp.int32(7)))
    np.testing.assert_array_equal(out, [-1, 5, 7])


def test_sample_in_jit():
    p = SamplerParams(temp=0.7, top_k=10)

    @jax.jit
    def f(logits, key, prev):
        return sample(logits, key, p, prev)

    logits = jnp.asarray(np.random.default_rng(1).standard_normal(256), jnp.float32)
    tok = f(logits, jax.random.PRNGKey(3), jnp.full((64,), -1, jnp.int32))
    assert 0 <= int(tok) < 256


# ---------------------------------------------------------------------------
# logit bias / DRY / mirostat (reference llama-sampling.cpp counterparts)
# ---------------------------------------------------------------------------

def test_logit_bias():
    from omni_tpu.runtime.sampler import apply_logit_bias

    logits = jnp.zeros(8, jnp.float32)
    out = np.asarray(apply_logit_bias(logits, ((2, 5.0), (3, -np.inf))))
    assert out[2] == 5.0 and out[3] == -np.inf and out[0] == 0.0


def test_allowed_mask():
    from omni_tpu.runtime.sampler import apply_allowed_mask

    logits = jnp.ones(6, jnp.float32)
    allowed = jnp.asarray([1, 4, -1, -1], jnp.int32)
    out = np.asarray(apply_allowed_mask(logits, allowed))
    assert np.isfinite(out[[1, 4]]).all()
    assert np.isneginf(out[[0, 2, 3, 5]]).all()


def test_dry_penalizes_repeat_continuation():
    from omni_tpu.runtime.sampler import apply_dry

    p = SamplerParams(dry_multiplier=1.0, dry_base=2.0, dry_allowed_length=2,
                      penalty_last_n=16)
    # context ... A B C A B  -> continuing with C extends "A B C", penalize C
    A, B, C = 10, 11, 12
    prev = np.full(16, -1, np.int32)
    prev[-5:] = [A, B, C, A, B]
    logits = jnp.zeros(32, jnp.float32)
    out = np.asarray(apply_dry(logits, jnp.asarray(prev), p))
    assert out[C] < 0.0  # penalized
    assert out[5] == 0.0  # unrelated token untouched


def test_dry_respects_allowed_length():
    from omni_tpu.runtime.sampler import apply_dry

    p = SamplerParams(dry_multiplier=1.0, dry_base=2.0, dry_allowed_length=4,
                      penalty_last_n=16)
    A, B, C = 10, 11, 12
    prev = np.full(16, -1, np.int32)
    prev[-5:] = [A, B, C, A, B]  # match length 2 < allowed 4
    out = np.asarray(apply_dry(jnp.zeros(32, jnp.float32), jnp.asarray(prev), p))
    np.testing.assert_array_equal(out, np.zeros(32))


def test_dry_breaker_resets_match():
    from omni_tpu.runtime.sampler import apply_dry

    p = SamplerParams(dry_multiplier=1.0, dry_base=2.0, dry_allowed_length=2,
                      dry_breakers=(99,), penalty_last_n=16)
    A, B, C = 10, 11, 12
    prev = np.full(16, -1, np.int32)
    prev[-6:] = [A, 99, C, A, 99, C]  # breaker kills the n-gram match
    out = np.asarray(apply_dry(jnp.zeros(32, jnp.float32), jnp.asarray(prev), p))
    np.testing.assert_array_equal(out, np.zeros(32))


def test_mirostat_v2_tracks_tau():
    from omni_tpu.runtime.sampler import mirostat_init, sample

    p = SamplerParams(mirostat=2, mirostat_tau=3.0, mirostat_eta=0.2, temp=1.0)
    mu = mirostat_init(p)
    assert float(mu) == 6.0
    logits = jnp.asarray(np.random.default_rng(0).standard_normal(128), jnp.float32)
    key = jax.random.PRNGKey(0)
    for i in range(20):
        tok, mu = sample(logits, jax.random.fold_in(key, i), p,
                         jnp.full((4,), -1, jnp.int32), mu=mu)
        assert 0 <= int(tok) < 128
    assert np.isfinite(float(mu))


def test_mirostat_v1_runs_in_jit():
    from omni_tpu.runtime.sampler import mirostat_init, sample

    p = SamplerParams(mirostat=1, temp=1.0)
    mu = mirostat_init(p)

    @jax.jit
    def f(logits, key, mu):
        return sample(logits, key, p, None, mu=mu)

    logits = jnp.asarray(np.random.default_rng(2).standard_normal(512), jnp.float32)
    tok, mu2 = f(logits, jax.random.PRNGKey(1), mu)
    assert 0 <= int(tok) < 512
    assert np.isfinite(float(mu2))


def test_grammar_constrained_sampling_end_to_end():
    """Grammar mask + sampler chain: only grammar-legal tokens drawn."""
    from omni_tpu.grammar import Grammar, VocabTrie, parse_gbnf
    from omni_tpu.runtime.sampler import apply_allowed_mask

    vocab = {0: "yes", 1: "no", 2: "maybe", 3: "y", 4: "es"}
    g = parse_gbnf('root ::= "yes" | "no"')
    trie = VocabTrie(vocab.items())
    p = SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0)
    key = jax.random.PRNGKey(0)
    text = ""
    for i in range(4):
        allowed = g.allowed_tokens(trie)
        if not allowed:
            break
        logits = jnp.zeros(5, jnp.float32)
        masked = apply_allowed_mask(
            logits, jnp.asarray(allowed, jnp.int32))
        tok = int(sample(masked, jax.random.fold_in(key, i), p))
        assert tok in allowed
        g.accept(vocab[tok])
        text += vocab[tok]
        if g.exhausted:
            break
    assert text in ("yes", "no", "yes".strip())


class TestInfillSampler:
    """llama_sampler_infill semantics (llama-sampling.cpp:2408-2560)."""

    @staticmethod
    def _lg(pairs, n_vocab=32):
        import numpy as np
        lg = np.full(n_vocab, -50.0, np.float32)
        for tid, logit in pairs:
            lg[tid] = logit
        return lg

    def test_eog_dominance_keeps_only_eog(self):
        import numpy as np
        from omni_tpu.runtime.sampler import apply_infill_host

        # EOG (id 0) holds substantial mass -> 3*p_eog*n > p_txt trips
        lg = self._lg([(0, 5.0), (1, 4.0), (2, 3.0)])
        ids, probs = apply_infill_host(lg, {0}, lambda i: f"t{i}", top_k=8)
        assert list(ids) == [0]
        assert probs[0] == 1.0

    def test_prefix_merge_combines_mass(self):
        import numpy as np
        from omni_tpu.runtime.sampler import apply_infill_host

        texts = {1: "fo", 2: "foo", 3: "bar"}
        # no EOG mass in the set; "fo" is a prefix of "foo" -> merged into
        # the higher-p candidate; both above the 0.2 threshold
        lg = self._lg([(1, 5.0), (2, 4.8), (3, 4.9)])
        ids, probs = apply_infill_host(lg, {31}, lambda i: texts.get(i, "z"),
                                       top_k=4)
        m = dict(zip(ids.tolist(), probs.tolist()))
        assert 2 not in m  # lower-p "foo" merged into "fo"
        assert m[1] > m[3]  # merged mass exceeds bar's

    def test_threshold_collapses_to_eog(self):
        import numpy as np
        from omni_tpu.runtime.sampler import apply_infill_host

        # many tiny non-EOG candidates, none reaching p=0.2, no EOG mass in
        # the top-k -> collapse to the single EOG token
        lg = self._lg([(i, 1.0) for i in range(1, 9)])
        ids, probs = apply_infill_host(lg, {0}, lambda i: f"w{i}", top_k=8)
        assert list(ids) == [0] and probs[0] == 1.0
