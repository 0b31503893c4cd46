"""LM-fused on-device beam search vs the host decoder with the same LM."""

import numpy as np
import pytest
from scipy.special import log_softmax

import jax
import jax.numpy as jnp

from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
from handwritten_chinese_ocr_samples_tpu.decode.beam_host import (
    BeamSearchConfig, BeamSearchDecoder,
)
from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
    make_id_tables, make_lm_beam_search,
)
from handwritten_chinese_ocr_samples_tpu.decode.lm_interface import (
    JaxLMBackend,
)
from handwritten_chinese_ocr_samples_tpu.lm.cached import CachedLM
from handwritten_chinese_ocr_samples_tpu.lm.infer import LMScorer
from handwritten_chinese_ocr_samples_tpu.lm.model import CharTransformerLM
from handwritten_chinese_ocr_samples_tpu.lm.tokenizer import Tokenizer

CHARS = "abcdefgh"


@pytest.fixture(scope="module")
def setup():
    codec = CTCCodec(CHARS)
    tokenizer = Tokenizer.from_characters(CHARS)
    model = CharTransformerLM(vocab_size=tokenizer.vocab_size, d_model=32,
                              n_layers=2, n_heads=2, d_ff=64, max_len=64)
    variables = model.init({"params": jax.random.key(5)},
                           jnp.zeros((1, 8), jnp.int32), train=False)
    params = variables["params"]
    scorer = LMScorer(model, {"params": params}, tokenizer)
    clm = CachedLM(model, params)
    c2l, l2c = make_id_tables(codec, tokenizer)
    return codec, tokenizer, clm, scorer, c2l, l2c


def _make_preds(T, B, seed):
    rng = np.random.default_rng(seed)
    D = len(CHARS) + 2
    logits = rng.normal(size=(T, B, D))
    for b in range(B):
        for t in range(T):
            r = rng.random()
            if r < 0.4:
                logits[t, b, 0] += 7.0
            elif r < 0.75:
                logits[t, b, rng.integers(1, D - 1)] += 7.0
    return logits.astype(np.float32)


@pytest.mark.parametrize("use_pred", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_lm_fused_matches_host(setup, use_pred, seed):
    codec, tokenizer, clm, scorer, c2l, l2c = setup
    BM, K = 4, 5
    lm_panelty, len_bonus = 0.9, 2.5

    cfg = BeamSearchConfig(beam_size=BM, search_depth=K,
                           lm_panelty=lm_panelty, len_bonus=len_bonus,
                           use_lm_pred=use_pred, use_lm_score=True)
    host = BeamSearchDecoder(codec, JaxLMBackend(scorer), cfg)

    fn = make_lm_beam_search(
        clm, c2l, l2c, beam_size=BM, depth=K, unknown_id=codec.unknown_id,
        lm_panelty=lm_panelty, len_bonus=len_bonus, lm_ctx=64,
        use_lm_pred=use_pred)

    logits_tbd = _make_preds(T=16, B=2, seed=seed)
    logp_tbd = log_softmax(logits_tbd, axis=2)
    want = host.decode(logp_tbd, already_log=True)

    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    logp_btd = jax.nn.log_softmax(logits_btd, axis=-1)
    cand_vals, cand_idx = jax.lax.top_k(logp_btd, K)
    logz = jax.scipy.special.logsumexp(logits_btd, axis=-1)
    prefixes, lengths = fn(cand_vals, cand_idx.astype(jnp.int32),
                           logits_btd, logz)
    prefixes = np.asarray(prefixes)
    lengths = np.asarray(lengths)
    got = ["".join(codec.characters[c] for c in prefixes[b, :lengths[b]])
           for b in range(2)]
    assert got == want, (use_pred, seed)
