"""Device skip-search (LM-fused) vs host skip decoder equivalence."""

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
from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
    topk_logsoftmax_xla,
)

CHARS = "abcdefgh"
PRUNE = float(np.log(0.001))


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
    return codec, clm, scorer, c2l, l2c


def _peaky_preds(T, B, seed):
    """Posteriors with many single-survivor frames (exercise the fast path)
    and a few genuinely ambiguous ones; survivor count stays <= depth."""
    rng = np.random.default_rng(seed)
    D = len(CHARS) + 2
    logits = rng.normal(size=(T, B, D)) * 0.2
    for b in range(B):
        for t in range(T):
            r = rng.random()
            if r < 0.45:
                logits[t, b, 0] += 12.0      # confident blank
            elif r < 0.8:
                logits[t, b, rng.integers(1, D - 1)] += 12.0  # confident char
            else:
                # ambiguous: exactly two survivors share the mass
                ids = rng.choice(np.arange(D - 1), size=2, replace=False)
                logits[t, b, ids] += 12.0
    return logits.astype(np.float32)


@pytest.mark.parametrize("use_pred", [False, True])
@pytest.mark.parametrize("seed", [0, 1])
def test_skip_device_matches_host(setup, use_pred, seed):
    codec, clm, scorer, c2l, l2c = setup
    BM, K = 4, 6
    cfg = BeamSearchConfig(beam_size=BM, search_depth=K, lm_panelty=0.7,
                           len_bonus=1.5, use_lm_pred=use_pred,
                           use_lm_score=True, skip_search=True,
                           prune_log_prob=PRUNE)
    host = BeamSearchDecoder(codec, JaxLMBackend(scorer), cfg)

    fn = make_lm_beam_search(
        clm, c2l, l2c, beam_size=BM, depth=K, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, lm_ctx=64, use_lm_pred=use_pred,
        skip_search=True, prune=PRUNE)

    logits_tbd = _peaky_preds(T=16, B=2, seed=seed)
    logp_tbd = log_softmax(logits_tbd, axis=2)
    want = host.decode(logp_tbd, already_log=True)

    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, blank_lp, n_above = topk_logsoftmax_xla(logits_btd, k=K,
                                                    prune=PRUNE)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)
    prefixes, lengths = fn(cv, ci, logits_btd, logz, blank_lp, n_above)
    got = codec.compact_to_texts(prefixes, lengths)
    assert got == want, (use_pred, seed)


@pytest.mark.parametrize("group", [2, 4])
def test_skip_device_grouped_matches_host(setup, group):
    """Grouped (vmapped) skip decode == host oracle == ungrouped."""
    codec, clm, scorer, c2l, l2c = setup
    BM, K = 4, 6
    cfg = BeamSearchConfig(beam_size=BM, search_depth=K, lm_panelty=0.7,
                           len_bonus=1.5, use_lm_pred=True,
                           use_lm_score=True, skip_search=True,
                           prune_log_prob=PRUNE)
    host = BeamSearchDecoder(codec, JaxLMBackend(scorer), cfg)

    fn = make_lm_beam_search(
        clm, c2l, l2c, beam_size=BM, depth=K, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, lm_ctx=64, use_lm_pred=True,
        skip_search=True, prune=PRUNE, group_size=group)

    logits_tbd = _peaky_preds(T=16, B=4, seed=7)
    logp_tbd = log_softmax(logits_tbd, axis=2)
    want = host.decode(logp_tbd, already_log=True)

    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, blank_lp, n_above = topk_logsoftmax_xla(logits_btd, k=K,
                                                    prune=PRUNE)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)
    prefixes, lengths = fn(cv, ci, logits_btd, logz, blank_lp, n_above)
    got = codec.compact_to_texts(prefixes, lengths)
    assert got == want, group


def test_skip_device_kept_budget_exact_when_sufficient(setup):
    """A budget >= the true kept-frame count gives identical output."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        count_kept_frames,
    )
    codec, clm, scorer, c2l, l2c = setup
    BM, K = 4, 6
    logits_tbd = _peaky_preds(T=24, B=2, seed=11)
    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, blank_lp, n_above = topk_logsoftmax_xla(logits_btd, k=K,
                                                    prune=PRUNE)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)

    kept = count_kept_frames(ci, n_above, unknown_id=codec.unknown_id)
    budget = int(kept.max())
    assert 0 < budget < 24   # compaction actually drops frames here

    outs = []
    for kb in (None, budget):
        fn = make_lm_beam_search(
            clm, c2l, l2c, beam_size=BM, depth=K,
            unknown_id=codec.unknown_id, lm_panelty=0.7, len_bonus=1.5,
            lm_ctx=64, use_lm_pred=True, skip_search=True, prune=PRUNE,
            kept_budget=kb)
        prefixes, lengths = fn(cv, ci, logits_btd, logz, blank_lp, n_above)
        outs.append(codec.compact_to_texts(prefixes, lengths))
    assert outs[0] == outs[1]


def test_skip_device_seg_budget_and_run_max(setup):
    """A segment budget >= the true segment count gives identical output,
    and a tiny run_max (forcing run-overflow segments) is still exact."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        count_segments,
    )
    codec, clm, scorer, c2l, l2c = setup
    BM, K = 4, 6
    logits_tbd = _peaky_preds(T=24, B=2, seed=11)
    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, blank_lp, n_above = topk_logsoftmax_xla(logits_btd, k=K,
                                                    prune=PRUNE)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)

    segs = count_segments(ci, n_above, unknown_id=codec.unknown_id,
                          run_max=2)
    sb = int(segs.max())
    assert sb > 0

    outs = []
    for kwargs in ({}, {"seg_budget": sb, "run_max": 2},
                   {"run_max": 1}):
        fn = make_lm_beam_search(
            clm, c2l, l2c, beam_size=BM, depth=K,
            unknown_id=codec.unknown_id, lm_panelty=0.7, len_bonus=1.5,
            lm_ctx=64, use_lm_pred=True, skip_search=True, prune=PRUNE,
            **kwargs)
        prefixes, lengths = fn(cv, ci, logits_btd, logz, blank_lp, n_above)
        outs.append(codec.compact_to_texts(prefixes, lengths))
    assert outs[0] == outs[1] == outs[2]


def test_skip_host_sanity_survivor_counts(setup):
    """The synthetic generator really produces single-survivor frames."""
    logits = _peaky_preds(T=32, B=1, seed=3)
    _, _, _, n_above = topk_logsoftmax_xla(
        jnp.asarray(logits.transpose(1, 0, 2)), k=6, prune=PRUNE)
    n = np.asarray(n_above)[0]
    assert (n == 1).sum() > 8      # fast-path frames exist
    assert (n > 1).sum() > 2       # ambiguous frames exist
    assert (n <= 6).all()          # survivors fit in depth


def test_skip_device_peek_rows_compaction_exact(setup):
    """A peek-row budget from ``count_peek_rows`` decodes identically to
    the uncompacted search (and to the host oracle), grouped or not; an
    undersized budget reports overflow instead of silently mis-scoring."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        count_peek_rows,
    )
    codec, clm, scorer, c2l, l2c = setup
    BM, K = 4, 6
    cfg = BeamSearchConfig(beam_size=BM, search_depth=K, lm_panelty=0.7,
                           len_bonus=1.5, use_lm_pred=True,
                           use_lm_score=True, skip_search=True,
                           prune_log_prob=PRUNE)
    host = BeamSearchDecoder(codec, JaxLMBackend(scorer), cfg)

    logits_tbd = _peaky_preds(T=24, B=4, seed=13)
    want = host.decode(log_softmax(logits_tbd, axis=2), already_log=True)
    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, blank_lp, n_above = topk_logsoftmax_xla(logits_btd, k=K,
                                                    prune=PRUNE)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)

    pr = count_peek_rows(n_above, depth=K, use_lm_pred=True)
    assert pr < 2 * K      # compaction actually drops rows here

    for group in (1, 2):
        fn = make_lm_beam_search(
            clm, c2l, l2c, beam_size=BM, depth=K,
            unknown_id=codec.unknown_id, lm_panelty=0.7, len_bonus=1.5,
            lm_ctx=64, use_lm_pred=True, skip_search=True, prune=PRUNE,
            group_size=group, peek_rows=pr, return_overflow=True)
        prefixes, lengths, ovf = fn(cv, ci, logits_btd, logz, blank_lp,
                                    n_above)
        assert codec.compact_to_texts(prefixes, lengths) == want, group
        assert not bool(np.asarray(ovf).any())

    # a compacted budget below the static bound must not be buildable
    # without the overflow flag (it could silently mis-score)
    with pytest.raises(ValueError, match="return_overflow"):
        make_lm_beam_search(
            clm, c2l, l2c, beam_size=BM, depth=K,
            unknown_id=codec.unknown_id, lm_panelty=0.7, len_bonus=1.5,
            lm_ctx=64, use_lm_pred=True, skip_search=True, prune=PRUNE,
            peek_rows=pr)

    # undersized budget: the overflow flag must fire
    fn_small = make_lm_beam_search(
        clm, c2l, l2c, beam_size=BM, depth=K,
        unknown_id=codec.unknown_id, lm_panelty=0.7, len_bonus=1.5,
        lm_ctx=64, use_lm_pred=True, skip_search=True, prune=PRUNE,
        peek_rows=1, return_overflow=True)
    _, _, ovf = fn_small(cv, ci, logits_btd, logz, blank_lp, n_above)
    assert bool(np.asarray(ovf).any())


def test_skip_device_ctx_ladder_exact(setup):
    """Decoding the first ``count_ladder_segments`` segments on a small
    KV cache then climbing to the full depth is bit-identical to a
    full-depth decode (and the host oracle); an unsound ladder (first
    rung too shallow for the data) flags overflow instead of silently
    dropping cache writes."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        count_ladder_segments, count_segments,
    )
    codec, clm, scorer, c2l, l2c = setup
    BM, K = 4, 6
    cfg = BeamSearchConfig(beam_size=BM, search_depth=K, lm_panelty=0.7,
                           len_bonus=1.5, use_lm_pred=True,
                           use_lm_score=True, skip_search=True,
                           prune_log_prob=PRUNE)
    host = BeamSearchDecoder(codec, JaxLMBackend(scorer), cfg)

    logits_tbd = _peaky_preds(T=32, B=4, seed=21)
    want = host.decode(log_softmax(logits_tbd, axis=2), already_log=True)
    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, blank_lp, n_above = topk_logsoftmax_xla(logits_btd, k=K,
                                                    prune=PRUNE)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)

    segs = int(count_segments(ci, n_above,
                              unknown_id=codec.unknown_id).max())
    for ctx1 in (8, 12, 16, 24, 32):
        k1 = count_ladder_segments(ci, n_above, ctx1=ctx1,
                                   unknown_id=codec.unknown_id)
        if k1 >= 1:
            break
    assert k1 >= 1               # the data lets at least one segment ladder
    assert ctx1 < 64             # and the first rung is genuinely smaller
    base = dict(beam_size=BM, depth=K, unknown_id=codec.unknown_id,
                lm_panelty=0.7, len_bonus=1.5, lm_ctx=64,
                use_lm_pred=True, skip_search=True, prune=PRUNE,
                seg_budget=segs + 1, return_overflow=True)
    ladders = [(1, (min(k1, segs), ctx1)), (2, (1, ctx1))]
    ctx2 = ctx1 * 2
    if ctx2 < 64:
        k2 = count_ladder_segments(ci, n_above, ctx1=ctx2,
                                   unknown_id=codec.unknown_id)
        # a genuine second rung must stay strictly increasing AFTER the
        # clamp to the segment count
        if min(k2, segs) > min(k1, segs) and k1 < segs:
            ladders.append((1, [(k1, ctx1), (min(k2, segs), ctx2)]))
    for group, ladder in ladders:
        fn = make_lm_beam_search(clm, c2l, l2c, group_size=group,
                                 ctx_ladder=ladder, **base)
        prefixes, lengths, ovf = fn(cv, ci, logits_btd, logz, blank_lp,
                                    n_above)
        assert not bool(np.asarray(ovf).any())
        assert codec.compact_to_texts(prefixes, lengths) == want, ladder

    # unsound first rung: too shallow for the committed tokens -> flagged
    fn_bad = make_lm_beam_search(clm, c2l, l2c, group_size=1,
                                 ctx_ladder=(segs, 2), **base)
    _, _, ovf = fn_bad(cv, ci, logits_btd, logz, blank_lp, n_above)
    assert bool(np.asarray(ovf).any())

    # invalid ladders are rejected at build time
    with pytest.raises(ValueError, match="ctx_ladder"):
        make_lm_beam_search(clm, c2l, l2c, group_size=1,
                            ctx_ladder=(2, 64), **base)   # ctx1 == lm_ctx
    with pytest.raises(ValueError, match="skip_search"):
        make_lm_beam_search(
            clm, c2l, l2c, beam_size=BM, depth=K,
            unknown_id=codec.unknown_id, lm_panelty=0.7, len_bonus=1.5,
            lm_ctx=64, use_lm_pred=True, skip_search=False,
            ctx_ladder=(2, 8))


def test_skip_device_fused_commit_exact(setup):
    """Deferring the run phase's cache write into the post-merge reorder
    pass (fused_commit) decodes identically to the two-pass flow —
    grouped, ungrouped, and combined with the context ladder — and
    matches the host oracle. (Equality is at decode level: the flash
    combine regroups the softmax reduction, so low-order float bits of
    scores may differ.)"""
    codec, clm, scorer, c2l, l2c = setup
    BM, K = 4, 6
    cfg = BeamSearchConfig(beam_size=BM, search_depth=K, lm_panelty=0.7,
                           len_bonus=1.5, use_lm_pred=True,
                           use_lm_score=True, skip_search=True,
                           prune_log_prob=PRUNE)
    host = BeamSearchDecoder(codec, JaxLMBackend(scorer), cfg)

    logits_tbd = _peaky_preds(T=32, B=4, seed=27)
    want = host.decode(log_softmax(logits_tbd, axis=2), already_log=True)
    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, blank_lp, n_above = topk_logsoftmax_xla(logits_btd, k=K,
                                                    prune=PRUNE)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)

    base = dict(beam_size=BM, depth=K, unknown_id=codec.unknown_id,
                lm_panelty=0.7, len_bonus=1.5, lm_ctx=64,
                use_lm_pred=True, skip_search=True, prune=PRUNE,
                return_overflow=True)
    for group, ladder, dense in ((1, None, False), (2, None, False),
                                 (1, (2, 16), False), (1, None, True),
                                 (2, None, True)):
        fn = make_lm_beam_search(clm, c2l, l2c, group_size=group,
                                 fused_commit=True, ctx_ladder=ladder,
                                 dense_merge=dense, **base)
        prefixes, lengths, ovf = fn(cv, ci, logits_btd, logz, blank_lp,
                                    n_above)
        assert not bool(np.asarray(ovf).any())
        assert codec.compact_to_texts(prefixes, lengths) == want, \
            (group, ladder, dense)

    # crafted line: a confident char RUN directly before an ambiguous
    # frame, so the deferred run k/v are genuinely attended by the peek
    # (with random peaky data an ambiguous frame could always follow an
    # empty run, leaving the extra-kv path trivially masked)
    rng = np.random.default_rng(3)
    D = len(CHARS) + 2
    lt = rng.normal(size=(24, 1, D)).astype(np.float32) * 0.2
    lt[:, 0, 0] += 12.0                        # confident blank baseline
    for i, t in enumerate((4, 6, 8, 10)):      # blank-separated cf run
        lt[t, 0, 0] -= 12.0
        lt[t, 0, 1 + i] += 12.0
    lt[12, 0, 0] -= 12.0                       # ambiguous: two near-equal
    lt[12, 0, 5] += 11.3
    lt[12, 0, 6] += 11.0
    want2 = host.decode(log_softmax(lt, axis=2), already_log=True)
    lbtd = jnp.asarray(lt.transpose(1, 0, 2))
    cv2_, ci2, bl2, na2 = topk_logsoftmax_xla(lbtd, k=K, prune=PRUNE)
    lz2 = jax.scipy.special.logsumexp(lbtd.astype(jnp.float32), axis=-1)
    assert int(np.asarray(na2)[0, 12]) > 1     # the frame IS ambiguous
    for fused in (False, True):
        fn = make_lm_beam_search(clm, c2l, l2c, group_size=1,
                                 fused_commit=fused, **base)
        p2, l2_, ovf2 = fn(cv2_, ci2, lbtd, lz2, bl2, na2)
        assert not bool(np.asarray(ovf2).any())
        assert codec.compact_to_texts(p2, l2_) == want2, fused

    with pytest.raises(ValueError, match="fused_commit"):
        make_lm_beam_search(
            clm, c2l, l2c, beam_size=BM, depth=K,
            unknown_id=codec.unknown_id, lm_panelty=0.7, len_bonus=1.5,
            lm_ctx=64, use_lm_pred=True, skip_search=False,
            fused_commit=True)


def test_plain_device_beam_matches_host():
    """The no-LM device beam search (both merge lowerings) transcribes
    identically to the host prefix decoder — the host side is itself
    oracle-equal to the reference codec (test_beam_search.py)."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_device import (
        beam_search_from_topk,
    )
    from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
        topk_logsoftmax_xla,
    )
    codec = CTCCodec(CHARS)
    cfg = BeamSearchConfig(beam_size=4, search_depth=5, lm_panelty=0.0,
                           len_bonus=0.0, use_lm_pred=False,
                           use_lm_score=False)
    host = BeamSearchDecoder(codec, None, cfg)
    for seed in (0, 7, 21):
        lt = _peaky_preds(T=24, B=3, seed=seed)
        want = host.decode(log_softmax(lt, axis=2), already_log=True)
        lbtd = jnp.asarray(lt.transpose(1, 0, 2))
        cv, ci, _, _ = topk_logsoftmax_xla(lbtd, k=5)
        for dense in (False, True):
            p, l = beam_search_from_topk(cv, ci, beam_size=4,
                                         unknown_id=codec.unknown_id,
                                         dense_merge=dense)
            got = codec.compact_to_texts(p, l)
            assert got == want, (seed, dense)


def test_full_search_peek_rows_noop(setup):
    """Full (non-skip) search has no pruned candidates: a peek budget of
    K + M is a no-op and must decode identically to the default."""
    codec, clm, scorer, c2l, l2c = setup
    BM, K = 4, 6
    logits_tbd = _peaky_preds(T=16, B=2, seed=5)
    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, _, _ = topk_logsoftmax_xla(logits_btd, k=K, prune=PRUNE)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)

    outs = []
    for pr in (None, 2 * K):
        fn = make_lm_beam_search(
            clm, c2l, l2c, beam_size=BM, depth=K,
            unknown_id=codec.unknown_id, lm_panelty=0.7, len_bonus=1.5,
            lm_ctx=64, use_lm_pred=True, skip_search=False,
            peek_rows=pr)
        prefixes, lengths = fn(cv, ci, logits_btd, logz)
        outs.append(codec.compact_to_texts(prefixes, lengths))
    assert outs[0] == outs[1]
