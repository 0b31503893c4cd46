"""Gated broad fuzz: plain (no-LM) device beam search vs the host oracle
(set HCTR_SLOW_TESTS=1 to run).

Complements ``test_beam_device.py``'s fixed seeds the same way
``test_fuzz_lm_beam.py`` covers the LM-fused decoder: every draw
randomizes beam/depth, len_bonus, merge backend (sort vs dense),
vocabulary size, line length, and posterior peakiness, and asserts exact
transcription equality against ``BeamSearchDecoder`` (itself
oracle-equal to the reference ``ctc_codec.py``). CPU-deterministic, so
equality is exact.
"""

import os

import numpy as np
import pytest
from scipy.special import log_softmax

import jax.numpy as jnp

from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
from handwritten_chinese_ocr_samples_tpu.decode.beam_device import (
    beam_search_device,
)
from handwritten_chinese_ocr_samples_tpu.decode.beam_host import (
    BeamSearchConfig, BeamSearchDecoder,
)

pytestmark = pytest.mark.skipif(
    os.environ.get("HCTR_SLOW_TESTS") != "1",
    reason="set HCTR_SLOW_TESTS=1 to run the broad plain-beam fuzz")

ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _random_posteriors(rng, T, B, D):
    """Mix of blanks, confident chars, multi-way ambiguous frames,
    repeats, and fully dense (unpeaked) lines."""
    logits = rng.normal(size=(T, B, D)).astype(np.float32) * 0.5
    for b in range(B):
        r = rng.random()
        if r < 0.1:
            logits[:, b, 0] += 9.0           # empty line: all blank
            continue
        if r < 0.25:
            continue                          # dense: stress the merge
        p_char = rng.uniform(0.15, 0.6)
        last = -1
        for t in range(T):
            if rng.random() < p_char:
                if rng.random() < 0.3:
                    ids = rng.choice(np.arange(1, D), size=int(
                        rng.integers(2, min(5, D))), replace=False)
                    logits[t, b, ids] += 8.0 + rng.normal(
                        size=len(ids)) * 0.6
                else:
                    c = (last if (last > 0 and rng.random() < 0.25)
                         else int(rng.integers(1, D)))
                    logits[t, b, c] += 9.0
                    last = c
            else:
                logits[t, b, 0] += 9.0
    return logits


def test_fuzz_matches_host():
    rng = np.random.default_rng(4321)
    for trial in range(40):
        n_chars = int(rng.integers(3, len(ALPHABET) + 1))
        codec = CTCCodec(ALPHABET[:n_chars])
        D = n_chars + 2
        BM = int(rng.integers(2, 9))
        K = int(rng.integers(2, min(9, D + 1)))
        T = int(rng.integers(5, 60))
        B = int(rng.integers(1, 6))
        lb = round(float(rng.uniform(0.0, 3.0)), 2)
        dense = bool(rng.random() < 0.5)

        cfg = BeamSearchConfig(
            beam_size=BM, search_depth=K, lm_panelty=0.0, len_bonus=lb,
            use_lm_pred=False, use_lm_score=False)
        host = BeamSearchDecoder(codec, None, cfg)

        logp_tbd = log_softmax(_random_posteriors(rng, T, B, D), axis=2)
        want = host.decode(logp_tbd, already_log=True)

        prefixes, lengths = beam_search_device(
            jnp.asarray(logp_tbd.transpose(1, 0, 2)),
            beam_size=BM, depth=K, unknown_id=codec.unknown_id,
            blank_id=codec.blank_id, len_bonus=lb, dense_merge=dense)
        got = codec.compact_to_texts(np.asarray(prefixes),
                                     np.asarray(lengths))
        assert got == want, dict(trial=trial, BM=BM, K=K, T=T, B=B,
                                 n_chars=n_chars, lb=lb, dense=dense,
                                 got=got, want=want)
