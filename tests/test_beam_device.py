"""On-device batched beam search: equivalence vs the host decoder."""

import numpy as np
import pytest
from scipy.special import log_softmax

from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
from handwritten_chinese_ocr_samples_tpu.decode.beam_host import (
    BeamSearchConfig, BeamSearchDecoder,
)
from handwritten_chinese_ocr_samples_tpu.decode.beam_device import beam_texts

CHARS = "abcdefghij"


def _host_decoder(beam_size, depth, len_bonus):
    codec = CTCCodec(CHARS)
    cfg = BeamSearchConfig(beam_size=beam_size, search_depth=depth,
                           lm_panelty=0.0, len_bonus=len_bonus,
                           use_lm_pred=False, use_lm_score=False)
    return codec, BeamSearchDecoder(codec, None, cfg)


def _make_preds(T, B, seed, peaked=True):
    rng = np.random.default_rng(seed)
    D = len(CHARS) + 2
    logits = rng.normal(size=(T, B, D))
    if peaked:
        for b in range(B):
            for t in range(T):
                r = rng.random()
                if r < 0.4:
                    logits[t, b, 0] += 7.0
                elif r < 0.75:
                    logits[t, b, rng.integers(1, D - 1)] += 7.0
    return log_softmax(logits, axis=2)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("len_bonus", [0.0, 2.0])
def test_device_matches_host(seed, len_bonus):
    codec, host = _host_decoder(beam_size=5, depth=6, len_bonus=len_bonus)
    logp = _make_preds(T=30, B=3, seed=seed)
    want = host.decode(logp, already_log=True)
    got = beam_texts(codec, logp.transpose(1, 0, 2).astype(np.float32),
                     beam_size=5, depth=6, len_bonus=len_bonus)
    assert got == want


def test_device_matches_host_unpeaked():
    """Dense ambiguous posteriors stress the merge path."""
    codec, host = _host_decoder(beam_size=8, depth=8, len_bonus=0.5)
    logp = _make_preds(T=20, B=2, seed=9, peaked=False)
    want = host.decode(logp, already_log=True)
    got = beam_texts(codec, logp.transpose(1, 0, 2).astype(np.float32),
                     beam_size=8, depth=8, len_bonus=0.5)
    assert got == want


def test_device_all_blank():
    codec, _ = _host_decoder(5, 5, 0.0)
    D = len(CHARS) + 2
    logp = np.full((2, 15, D), -12.0, dtype=np.float32)
    logp[:, :, 0] = -0.01  # everything blank
    texts = beam_texts(codec, logp, beam_size=5, depth=5)
    assert texts == ["", ""]


def test_device_merge_case():
    """Mass split across repeated frames of the same char exercises the
    pb/pnb merge rules; device and host must agree."""
    codec, host = _host_decoder(4, 4, 0.0)
    D = len(CHARS) + 2
    probs = np.full((1, 3, D), 1e-9, dtype=np.float32)
    probs[0, 0, 1], probs[0, 0, 0] = 0.6, 0.4   # a dominant
    probs[0, 1, 1], probs[0, 1, 0] = 0.4, 0.6   # blank dominant
    probs[0, 2, 1], probs[0, 2, 0] = 0.45, 0.55
    logp = np.log(probs)
    got = beam_texts(codec, logp, beam_size=4, depth=4)
    want = host.decode(logp.transpose(1, 0, 2), already_log=True)
    assert got == want
    assert got[0] in ("a", "aa")
