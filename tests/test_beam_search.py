"""Beam-search equivalence vs the reference decoder (oracle).

The reference codec is imported at runtime and driven with a deterministic
fake LM injected where kenlm/fairseq would sit; our decoder gets the same
fake through the LMBackend interface. Transcriptions must match exactly in
both full and skip-search modes, with and without LM candidate prediction.
"""

import sys

import numpy as np
import pytest
from scipy.special import log_softmax

from tests.conftest import REFERENCE_PATH, reference_available

from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
from handwritten_chinese_ocr_samples_tpu.decode.beam_host import (
    BeamSearchConfig, BeamSearchDecoder,
)

CHARS = "abcdefghij"


class FakeLM:
    """Deterministic LM exposing both the reference's API surface
    (``next_k_words``/``score``/ngram-``score``) and our LMBackend."""

    def __init__(self, chars):
        self.chars = chars

    def _score_text(self, text: str) -> float:
        # smooth, content-dependent, deterministic
        h = 0
        for ch in text:
            h = (h * 131 + ord(ch)) % 1000003
        return -1.0 - (h % 97) / 10.0

    # --- reference transformer API (`transformer_infer.py:41-76`)
    def score(self, sentences, char_based=False, eos=False):
        if isinstance(sentences, str):  # kenlm-style single sentence
            return self._score_text(sentences.replace(" ", ""))
        return np.array([self._score_text(s) for s in sentences])

    def next_k_words(self, sentences, k, char_based=False):
        out = []
        for s in sentences:
            start = (len(s) * 7) % len(self.chars)
            out.append([self.chars[(start + i) % len(self.chars)]
                        for i in range(min(k, 3))])
        return out

    # --- our LMBackend API
    def score_batch(self, texts):
        return np.array([self._score_text(t) for t in texts])

    def topk_next(self, texts, k):
        return self.next_k_words(texts, k)


def _make_preds(T=40, B=3, seed=0, peaked=True):
    """Random posteriors with a plausible peaky structure."""
    rng = np.random.default_rng(seed)
    D = len(CHARS) + 2
    logits = rng.normal(size=(T, B, D)).astype(np.float64)
    if peaked:
        # make many frames confidently blank or confidently one char,
        # so skip-search actually exercises its fast path
        for b in range(B):
            for t in range(T):
                r = rng.random()
                if r < 0.45:
                    logits[t, b, 0] += 9.0
                elif r < 0.8:
                    logits[t, b, rng.integers(1, D - 1)] += 9.0
    return logits


def _reference_codec(use_tfm_pred, use_tfm_score, skip, lm):
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from utils.ctc_codec import ctc_codec as RefCodec
    finally:
        sys.path.remove(REFERENCE_PATH)
    ref = RefCodec(CHARS)
    ref.use_beam_search = True
    ref.skip_search = skip
    ref.use_tfm_pred = use_tfm_pred
    ref.use_tfm_score = use_tfm_score
    ref.lm_panelty = 1.5
    ref.len_bonus = 3.0
    ref.beam_size = 5
    ref.search_depth = 6
    ref.transformer = lm
    ref.ngram = lm  # kenlm-style .score(sentence, eos=False)
    return ref


def _our_decoder(use_lm_pred, skip, lm):
    codec = CTCCodec(CHARS)
    cfg = BeamSearchConfig(beam_size=5, search_depth=6, lm_panelty=1.5,
                           len_bonus=3.0, use_lm_pred=use_lm_pred,
                           use_lm_score=True, skip_search=skip)
    return BeamSearchDecoder(codec, FakeLM(CHARS), cfg)


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
@pytest.mark.parametrize("skip", [False, True])
@pytest.mark.parametrize("use_pred", [False, True])
def test_beam_equivalence_vs_reference(skip, use_pred):
    lm = FakeLM(CHARS)
    ref = _reference_codec(use_tfm_pred=use_pred, use_tfm_score=True,
                           skip=skip, lm=lm)
    ours = _our_decoder(use_lm_pred=use_pred, skip=skip, lm=lm)

    for seed in range(4):
        preds = _make_preds(seed=seed)
        want = ref.decode(preds)
        got = ours.decode(preds)
        assert got == want, (skip, use_pred, seed)


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
def test_beam_equivalence_ngram_scoring():
    """use_tfm_score=False: the reference scores via kenlm-style
    space-joined sentences — same FakeLM handles both call styles."""
    lm = FakeLM(CHARS)
    ref = _reference_codec(use_tfm_pred=False, use_tfm_score=False,
                           skip=False, lm=lm)
    ours = _our_decoder(use_lm_pred=False, skip=False, lm=lm)
    for seed in range(3):
        preds = _make_preds(seed=10 + seed)
        assert ours.decode(preds) == ref.decode(preds)


def test_beam_no_lm_reasonable():
    """Without LM, beam search should at least match greedy on easy peaky
    inputs (sanity, no oracle needed)."""
    codec = CTCCodec(CHARS)
    cfg = BeamSearchConfig(beam_size=5, search_depth=6, lm_panelty=0.0,
                           len_bonus=0.0, use_lm_pred=False,
                           use_lm_score=False)
    dec = BeamSearchDecoder(codec, None, cfg)
    preds = np.full((12, 1, len(CHARS) + 2), -10.0)
    # strong: blank a a blank b -> "ab"... build frames
    seq = [0, 1, 1, 0, 2, 2, 0, 0, 3, 0, 0, 0]
    for t, k in enumerate(seq):
        preds[t, 0, k] = 5.0
    texts = dec.decode(preds)
    assert texts == ["abc"]
