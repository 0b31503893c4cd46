"""Char LM: tokenizer parity vs reference, scorer math, training sanity."""

import os
import sys
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import REFERENCE_PATH, reference_available
from handwritten_chinese_ocr_samples_tpu.lm.tokenizer import Tokenizer
from handwritten_chinese_ocr_samples_tpu.lm.model import CharTransformerLM
from handwritten_chinese_ocr_samples_tpu.lm.infer import LMScorer

CHARS = "天地人你我他上中下大小多"


@pytest.fixture(scope="module")
def dict_file():
    fd, path = tempfile.mkstemp(suffix=".txt")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        for ch in CHARS:
            f.write(f"{ch} 100\n")
    yield path
    os.unlink(path)


@pytest.fixture(scope="module")
def tiny_scorer(dict_file):
    tok = Tokenizer(dict_file)
    model = CharTransformerLM(vocab_size=tok.vocab_size, d_model=32,
                              n_layers=2, n_heads=2, d_ff=64, max_len=64)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 8), jnp.int32), train=False)
    return LMScorer(model, variables, tok)


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
def test_tokenizer_parity(dict_file):
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from utils.transformer_infer import Tokenizer as RefTokenizer
    finally:
        sys.path.remove(REFERENCE_PATH)
    ref = RefTokenizer(dict_file)
    ours = Tokenizer(dict_file)
    assert ours.symbols == ref.symbols
    sentences = ["天地人", "你我", "", "天X地"]
    got = ours.tokenize(sentences, char_based=True)
    want = ref.tokenize(sentences, char_based=True)
    np.testing.assert_array_equal(got, want)
    got_f = ours.tokenize(sentences, char_based=True, fixed_len=16)
    want_f = ref.tokenize(sentences, char_based=True, fixed_len=16)
    np.testing.assert_array_equal(got_f, want_f)
    assert ours.decode([0, 1, 4, 5, 3]) == ref.decode([0, 1, 4, 5, 3])


def test_from_characters_matches_dict_file(dict_file):
    a = Tokenizer(dict_file)
    b = Tokenizer.from_characters(CHARS)
    assert a.symbols == b.symbols


def test_score_matches_manual(tiny_scorer):
    sents = ["天地人", "你我"]
    scores = tiny_scorer.score(sents, char_based=True)
    assert scores.shape == (2,)

    # manual recomputation
    tok = tiny_scorer.tokenizer
    toks = tok.tokenize(sents, char_based=True, fixed_len=32)
    logits = np.asarray(tiny_scorer.model.apply(
        tiny_scorer.variables, jnp.asarray(toks), train=False))
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    for i, s in enumerate(sents):
        want = sum(logp[i, t, toks[i, t + 1]] for t in range(len(s)))
        assert scores[i] == pytest.approx(want, rel=1e-4)


def test_next_k_words_shape_and_validity(tiny_scorer):
    out = tiny_scorer.next_k_words(["天地", "你"], k=5, char_based=True)
    assert len(out) == 2
    for cands in out:
        assert len(cands) <= 5
        for c in cands:
            assert c in CHARS


def test_lm_overfits_tiny_corpus():
    from handwritten_chinese_ocr_samples_tpu.lm.train import train_char_lm
    corpus = ["天地人你我他"] * 64
    model, params, tok = train_char_lm(
        corpus, CHARS, epochs=6, batch_size=16, max_len=32,
        lr=3e-3, warmup_steps=5, d_model=32, n_layers=2,
        log_every=10_000, dtype=jnp.float32)
    scorer = LMScorer(model, {"params": params}, tok)
    ppl = scorer.perplexity(["天地人你我他"])
    # untrained ppl ~ vocab_size (16); overfit should be far lower
    assert ppl < 4.0, ppl
    nxt = scorer.next_k_words(["天地人"], k=1, char_based=True)
    assert nxt[0][:1] == ["你"]


def test_dict_file_trailing_whitespace():
    """Trailing spaces/tabs on dictionary lines must not leak into symbols
    (hand-edited dict files commonly carry them)."""
    fd, path = tempfile.mkstemp(suffix=".txt")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        f.write("天 5 \n地 3\t\n人 1\n")
    try:
        tok = Tokenizer(path)
    finally:
        os.unlink(path)
    assert tok.symbols[4:] == ["天", "地", "人"]
    assert tok.tokenize(["天"], char_based=True)[0, 1] == 4
