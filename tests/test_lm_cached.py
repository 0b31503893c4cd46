"""CachedLM (KV-cached incremental decode) vs full CharTransformerLM."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_chinese_ocr_samples_tpu.lm.cached import CachedLM
from handwritten_chinese_ocr_samples_tpu.lm.model import CharTransformerLM

V = 20


@pytest.fixture(scope="module")
def lm():
    model = CharTransformerLM(vocab_size=V, d_model=32, n_layers=2,
                              n_heads=2, d_ff=64, max_len=64)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 8), jnp.int32), train=False)
    return model, variables["params"]


def test_step_matches_full_forward(lm):
    model, params = lm
    cached = CachedLM(model, params)
    rng = np.random.default_rng(0)
    B, L = 3, 7
    tokens = jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32))

    full = model.apply({"params": params}, tokens, train=False)  # (B, L, V)

    cache = cached.init_cache(B, 16)
    outs = []
    for t in range(L):
        logits, cache = cached.step(cache, tokens[:, t])
        outs.append(logits)
    got = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


def test_step_write_mask(lm):
    model, params = lm
    cached = CachedLM(model, params)
    B = 2
    cache = cached.init_cache(B, 16)
    toks = jnp.asarray([1, 2], jnp.int32)
    _, cache = cached.step(cache, toks)
    # only element 0 advances
    _, cache2 = cached.step(cache, jnp.asarray([3, 9], jnp.int32),
                            write_mask=jnp.asarray([True, False]))
    assert cache2.lengths.tolist() == [2, 1]
    np.testing.assert_array_equal(np.asarray(cache2.k[:, 1]),
                                  np.asarray(cache.k[:, 1]))


def test_gather_reorders(lm):
    model, params = lm
    cached = CachedLM(model, params)
    cache = cached.init_cache(2, 8)
    _, cache = cached.step(cache, jnp.asarray([1, 2], jnp.int32))
    g = CachedLM.gather(cache, jnp.asarray([1, 0]))
    np.testing.assert_array_equal(np.asarray(g.k[:, 0]),
                                  np.asarray(cache.k[:, 1]))


def test_peek_matches_full_scoring(lm):
    """peek(prefix-cache, suffix) == sum positional log-probs of the suffix
    from a full forward over prefix+suffix, and leaves the cache untouched."""
    model, params = lm
    cached = CachedLM(model, params)
    rng = np.random.default_rng(1)
    B, Lp, S = 2, 4, 4
    prefix = jnp.asarray(rng.integers(0, V, (B, Lp)).astype(np.int32))
    suffix = jnp.asarray(rng.integers(0, V, (B, S)).astype(np.int32))
    suffix_len = jnp.asarray([S, 2], jnp.int32)

    cache = cached.init_cache(B, 16)
    logits = None
    for t in range(Lp):
        logits, cache = cached.step(cache, prefix[:, t])
    next_logp = jax.nn.log_softmax(logits, axis=-1)

    got = cached.peek_logprobs(cache, next_logp, suffix, suffix_len)

    # oracle: full forward over [prefix, suffix]
    toks = jnp.concatenate([prefix, suffix], axis=1)
    full = model.apply({"params": params}, toks, train=False)
    logp = jax.nn.log_softmax(full, axis=-1)
    want = []
    for b in range(B):
        s = 0.0
        for j in range(int(suffix_len[b])):
            pos = Lp - 1 + j  # logits at pos predict token pos+1
            s += float(logp[b, pos, toks[b, pos + 1]])
        want.append(s)
    np.testing.assert_allclose(np.asarray(got), np.array(want),
                               atol=1e-4, rtol=1e-4)

    # cache unchanged
    assert cache.lengths.tolist() == [Lp, Lp]


def test_bf16_step_close_to_f32(lm):
    """bf16 compute dtype: same argmax trajectory, logits close to f32
    (LN / attention-score / logits paths stay f32 internally)."""
    model, params = lm
    f32 = CachedLM(model, params)
    b16 = CachedLM(model, params, dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    rng = np.random.default_rng(3)
    B, L = 2, 6
    tokens = jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32))
    c32, c16 = f32.init_cache(B, 16), b16.init_cache(B, 16)
    assert c16.k.dtype == jnp.bfloat16
    for t in range(L):
        lo32, c32 = f32.step(c32, tokens[:, t])
        lo16, c16 = b16.step(c16, tokens[:, t])
        assert lo16.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(lo16), np.asarray(lo32),
                                   atol=0.15, rtol=0.05)
        np.testing.assert_array_equal(
            np.argmax(np.asarray(lo16), -1), np.argmax(np.asarray(lo32), -1))


def test_int8_quant_close_to_float(lm):
    """quant_int8=True: step logits track the float path closely (per-channel
    weight scales + dynamic activation scale keep the quant noise small) and
    the next-token ARGMAX agrees — the property LM-fused decode relies on."""
    model, params = lm
    fp = CachedLM(model, params)
    q8 = CachedLM(model, params, quant_int8=True)
    rng = np.random.default_rng(2)
    B, L = 4, 9
    tokens = jnp.asarray(rng.integers(0, V, (B, L)).astype(np.int32))

    cache_f = fp.init_cache(B, 16)
    cache_q = q8.init_cache(B, 16)
    agree, total = 0, 0
    for t in range(L):
        lf, cache_f = fp.step(cache_f, tokens[:, t])
        lq, cache_q = q8.step(cache_q, tokens[:, t])
        pf = jax.nn.log_softmax(lf, axis=-1)
        pq = jax.nn.log_softmax(lq, axis=-1)
        # log-prob error well under typical LM score margins
        assert float(jnp.max(jnp.abs(pf - pq))) < 0.15
        agree += int((jnp.argmax(lf, -1) == jnp.argmax(lq, -1)).sum())
        total += B
    assert agree / total >= 0.9


def test_int8_quant_peek(lm):
    """Quantized peek stays within LM-score tolerance of the float peek."""
    model, params = lm
    fp = CachedLM(model, params)
    q8 = CachedLM(model, params, quant_int8=True)
    rng = np.random.default_rng(3)
    B, Lp, S = 2, 5, 4
    prefix = jnp.asarray(rng.integers(0, V, (B, Lp)).astype(np.int32))
    suffix = jnp.asarray(rng.integers(0, V, (B, S)).astype(np.int32))
    suffix_len = jnp.asarray([S, 3], jnp.int32)

    def run(c):
        cache = c.init_cache(B, 16)
        logits = None
        for t in range(Lp):
            logits, cache = c.step(cache, prefix[:, t])
        next_logp = jax.nn.log_softmax(logits, axis=-1)
        return c.peek_logprobs(cache, next_logp, suffix, suffix_len)

    got_f = np.asarray(run(fp))
    got_q = np.asarray(run(q8))
    np.testing.assert_allclose(got_q, got_f, atol=0.5)
