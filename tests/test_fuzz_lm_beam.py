"""Gated broad fuzz: device LM-fused skip decode vs the host oracle
(set HCTR_SLOW_TESTS=1 to run).

The fast suites lock a handful of seeds and crafted lines; this sweep
randomizes every knob at once — beam/depth, run_max, group size,
lm_panelty/len_bonus, ladder rungs, dense merge, use_lm_pred, posterior
peakiness and line lengths — and asserts exact transcription equality
against ``BeamSearchDecoder`` (itself oracle-equal to the reference
``ctc_codec.py``) on every draw. CPU-deterministic, so equality is exact
(no bf16 tie-flips; the TPU-side variant question is covered by
``tools/ab_lm_beam.py``'s gate).
"""

import os

import numpy as np
import pytest
from scipy.special import log_softmax

import jax
import jax.numpy as jnp

from handwritten_chinese_ocr_samples_tpu.decode.beam_host import (
    BeamSearchConfig, BeamSearchDecoder,
)
from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
    make_lm_beam_search,
)
from handwritten_chinese_ocr_samples_tpu.decode.lm_interface import (
    JaxLMBackend,
)
from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
    topk_logsoftmax_xla,
)

from tests.test_beam_skip_device import CHARS, PRUNE, setup  # noqa: F401

pytestmark = pytest.mark.skipif(
    os.environ.get("HCTR_SLOW_TESTS") != "1",
    reason="set HCTR_SLOW_TESTS=1 to run the broad LM-beam fuzz")


def _random_posteriors(rng, T, B, D):
    """Lines with random char density/ambiguity — blanks, confident
    chars, 2-3-way ambiguous frames, repeats, and empty lines."""
    logits = rng.normal(size=(T, B, D)).astype(np.float32) * 0.3
    for b in range(B):
        if rng.random() < 0.1:
            logits[:, b, 0] += 12.0          # empty line: all blank
            continue
        p_char = rng.uniform(0.1, 0.5)
        last = -1
        for t in range(T):
            if rng.random() < p_char:
                if rng.random() < 0.25:
                    ids = rng.choice(np.arange(1, D), size=int(
                        rng.integers(2, 4)), replace=False)
                    logits[t, b, ids] += 11.0 + rng.normal(
                        size=len(ids)) * 0.4
                else:
                    c = (last if (last > 0 and rng.random() < 0.2)
                         else int(rng.integers(1, D)))
                    logits[t, b, c] += 12.0
                    last = c
            else:
                logits[t, b, 0] += 12.0
    return logits


def test_fuzz_matches_host(setup):  # noqa: F811
    codec, clm, scorer, c2l, l2c = setup
    rng = np.random.default_rng(1234)
    D = len(CHARS) + 2
    for trial in range(20):
        BM = int(rng.integers(2, 6))
        K = int(rng.integers(3, 8))
        T = int(rng.integers(8, 40))
        B = int(rng.integers(1, 5))
        group = int(rng.choice([1, 2, 4]))
        if B % group:
            group = 1
        use_pred = bool(rng.random() < 0.5)
        run_max = int(rng.integers(1, 6))
        lp = round(float(rng.uniform(0.2, 2.0)), 2)
        lb = round(float(rng.uniform(0.0, 3.0)), 2)
        ladder = int(rng.choice([0, 8, 16]))
        dense = bool(rng.random() < 0.3)

        cfg = BeamSearchConfig(
            beam_size=BM, search_depth=K, lm_panelty=lp, len_bonus=lb,
            use_lm_pred=use_pred, use_lm_score=True, skip_search=True,
            prune_log_prob=PRUNE)
        host = BeamSearchDecoder(codec, JaxLMBackend(scorer), cfg)

        logits_tbd = _random_posteriors(rng, T, B, D)
        want = host.decode(log_softmax(logits_tbd, axis=2),
                           already_log=True)

        logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
        cv, ci, blank_lp, n_above = topk_logsoftmax_xla(
            logits_btd, k=K, prune=PRUNE)
        logz = jax.scipy.special.logsumexp(
            logits_btd.astype(jnp.float32), axis=-1)
        fn = make_lm_beam_search(
            clm, c2l, l2c, beam_size=BM, depth=K,
            unknown_id=codec.unknown_id, lm_panelty=lp, len_bonus=lb,
            lm_ctx=64, use_lm_pred=use_pred, skip_search=True,
            prune=PRUNE, group_size=group, run_max=run_max,
            dense_merge=dense,
            ctx_ladder=((2, ladder) if ladder else None))
        prefixes, lengths = fn(cv, ci, logits_btd, logz, blank_lp,
                               n_above)
        got = codec.compact_to_texts(prefixes, lengths)
        assert got == want, dict(
            trial=trial, BM=BM, K=K, T=T, B=B, group=group,
            use_pred=use_pred, run_max=run_max, lp=lp, lb=lb,
            ladder=ladder, dense=dense, got=got, want=want)
