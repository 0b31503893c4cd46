"""KV-cache overflow guard + data-calibrated LM-beam driver.

Covers VERDICT r2 items: the device search must not silently drop LM
context when committed tokens reach ``lm_ctx`` (`beam_lm_device` overflow
flag), and the product surface (``decode.adaptive.AdaptiveLMBeam``) must
either escalate (auto mode) or raise (pinned knobs) — never truncate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_chinese_ocr_samples_tpu.decode import adaptive
from handwritten_chinese_ocr_samples_tpu.decode.adaptive import (
    AdaptiveLMBeam, pick_group_size,
)
from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
    make_lm_beam_search,
)
from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
    topk_logsoftmax_xla,
)

from tests.test_beam_skip_device import (  # noqa: F401
    CHARS, PRUNE, _peaky_preds, setup,
)


def _dense_char_line(T, n_chars, seed=0):
    """One line emitting ``n_chars`` confident characters (blank-separated)."""
    rng = np.random.default_rng(seed)
    D = len(CHARS) + 2
    logits = rng.normal(size=(T, 1, D)) * 0.2
    logits[:, 0, 0] += 12.0                       # default: confident blank
    pos = np.linspace(1, T - 2, n_chars).astype(int)
    for t in pos:
        logits[t, 0, 0] -= 12.0
        logits[t, 0, 1 + int(rng.integers(0, len(CHARS)))] += 12.0
    return logits.astype(np.float32)


def _prep(logits_tbd, K=6):
    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, blank_lp, n_above = topk_logsoftmax_xla(logits_btd, k=K,
                                                    prune=PRUNE)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)
    return cv, ci, logits_btd, logz, blank_lp, n_above


def test_overflow_flag_fires_at_small_ctx(setup):  # noqa: F811
    codec, clm, scorer, c2l, l2c = setup
    args = _prep(_dense_char_line(T=40, n_chars=12, seed=2))
    out = {}
    for ctx in (8, 64):
        fn = make_lm_beam_search(
            clm, c2l, l2c, beam_size=4, depth=6,
            unknown_id=codec.unknown_id, lm_panelty=0.7, len_bonus=1.5,
            lm_ctx=ctx, use_lm_pred=True, skip_search=True, prune=PRUNE,
            return_overflow=True)
        _, _, ovf = fn(*args)
        out[ctx] = bool(np.asarray(ovf).any())
    assert out[8] is True      # 12 chars + <s> cannot fit in 8 slots
    assert out[64] is False


def test_adaptive_pinned_ctx_too_small_raises(setup):  # noqa: F811
    codec, clm, scorer, c2l, l2c = setup
    beam = AdaptiveLMBeam(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, skip_search=True, lm_ctx=8)
    args = _prep(_dense_char_line(T=40, n_chars=12, seed=2))
    with pytest.raises(RuntimeError, match="lm-ctx"):
        beam.decode(*args)


def test_adaptive_auto_escalates_on_overflow(setup, monkeypatch):  # noqa: F811
    """Force the initial auto ctx to be exactly the greedy char count so the
    <s> token overflows it; the driver must escalate and re-decode, landing
    on the same transcription as a direct run at the big context."""
    codec, clm, scorer, c2l, l2c = setup
    monkeypatch.setattr(adaptive, "STABLE_CTX", (12, 64))
    monkeypatch.setattr(adaptive, "CTX_MARGIN", 0)

    args = _prep(_dense_char_line(T=40, n_chars=12, seed=5))
    beam = AdaptiveLMBeam(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, skip_search=True)
    prefixes, lengths = beam.decode(*args)
    got = codec.compact_to_texts(prefixes, lengths)
    assert beam._ctx == 64   # escalated past the overflowing 12

    fn = make_lm_beam_search(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, lm_ctx=64, use_lm_pred=True,
        skip_search=True, prune=PRUNE)
    want = codec.compact_to_texts(*fn(*args))
    assert got == want


@pytest.mark.parametrize("skip", [True, False])
def test_adaptive_auto_matches_direct(setup, skip):  # noqa: F811
    codec, clm, scorer, c2l, l2c = setup
    args = _prep(_peaky_preds(T=16, B=4, seed=3).astype(np.float32))
    beam = AdaptiveLMBeam(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, skip_search=skip)
    prefixes, lengths = beam.decode(*args)
    got = codec.compact_to_texts(prefixes, lengths)

    fn = make_lm_beam_search(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, lm_ctx=beam._ctx, use_lm_pred=True,
        skip_search=skip, prune=PRUNE)
    want = codec.compact_to_texts(*(fn(*args) if skip else fn(*args[:4])))
    assert got == want


def test_adaptive_ctx_ladder_matches_plain(setup):  # noqa: F811
    """With ``ctx_ladder`` the driver sizes a sound first rung from the
    device-side bound and decodes identically to the plain driver."""
    codec, clm, scorer, c2l, l2c = setup
    args = _prep(_dense_char_line(T=160, n_chars=40, seed=9))
    kw = dict(beam_size=4, depth=6, unknown_id=codec.unknown_id,
              lm_panelty=0.7, len_bonus=1.5, skip_search=True,
              run_max=1)
    plain = AdaptiveLMBeam(clm, c2l, l2c, ctx_ladder=0, **kw)
    want = codec.compact_to_texts(*plain.decode(*args))

    laddered = AdaptiveLMBeam(clm, c2l, l2c, ctx_ladder=16, **kw)
    got = codec.compact_to_texts(*laddered.decode(*args))
    assert laddered._ladder_k >= 8      # the ladder actually engaged
    assert got == want

    # a rung >= the chosen ctx must quietly disable the ladder
    off = AdaptiveLMBeam(clm, c2l, l2c, ctx_ladder=4096, **kw)
    got_off = codec.compact_to_texts(*off.decode(*args))
    assert off._ladder_k == 0
    assert got_off == want


def test_adaptive_pinned_seg_budget_too_small_raises(setup):  # noqa: F811
    codec, clm, scorer, c2l, l2c = setup
    args = _prep(_peaky_preds(T=16, B=2, seed=1).astype(np.float32))
    beam = AdaptiveLMBeam(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, skip_search=True, seg_budget=1)
    with pytest.raises(RuntimeError, match="seg-budget"):
        beam.decode(*args)


def test_count_segments_matches_scheduler_simulation():
    """The vectorized counter must equal a direct simulation of the device
    segment scheduler (`beam_lm_device` sched scan) frame by frame."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        count_segments)
    rng = np.random.default_rng(0)
    D, unknown_id = 8, 7
    for trial in range(30):
        T = int(rng.integers(4, 60))
        run_max = int(rng.integers(1, 5))
        arg = rng.integers(0, D, (1, T))
        n_above = np.where(rng.random((1, T)) < 0.7, 1,
                           rng.integers(2, 5, (1, T)))
        ci = np.zeros((1, T, 3), np.int64)
        ci[:, :, 0] = arg

        got = count_segments(ci, n_above, unknown_id=unknown_id,
                             run_max=run_max)[0]

        # direct simulation of the sched scan
        prev = np.concatenate([[-1], arg[0, :-1]])
        keep = (arg[0] != 0) & (arg[0] != unknown_id) & (arg[0] != prev)
        end = min((int(np.max(np.where(keep, np.arange(T), -1))) + 4
                   if keep.any() else 0), T)
        seg = pos = 0
        trailing = False
        for t in range(end):
            fast = n_above[0, t] == 1
            cf = fast and arg[0, t] != 0 and arg[0, t] < unknown_id
            if cf:
                if pos >= run_max:
                    seg += 1
                    pos = 0
                pos += 1
                trailing = True
            elif not fast:
                seg += 1
                pos = 0
                trailing = False
        want = seg + (1 if trailing else 0)
        assert got == want, (trial, T, run_max)


def test_count_stats_matches_host_helpers():
    """The device-side knob-sizing maxima (``make_count_stats``) must equal
    the host reference helpers on random batches, including all-ambiguous
    and empty (all-blank) lines."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        count_segments, make_count_stats)
    rng = np.random.default_rng(7)
    D, unknown_id = 8, 7
    for trial in range(12):
        B = int(rng.integers(1, 5))
        T = int(rng.integers(4, 60))
        run_max = int(rng.integers(1, 5))
        arg = rng.integers(0, D, (B, T))
        if trial == 0:
            arg[0] = 0                        # empty line: all blank
        n_above = np.where(rng.random((B, T)) < 0.7, 1,
                           rng.integers(2, 5, (B, T))).astype(np.int32)
        if trial == 1:
            n_above[:] = 3                    # every frame ambiguous
        ci = np.zeros((B, T, 3), np.int64)
        ci[:, :, 0] = arg

        stats = make_count_stats(unknown_id=unknown_id, run_max=run_max)
        got = [int(x) for x in stats(jnp.asarray(ci), jnp.asarray(n_above))]

        prev = np.concatenate([np.full((B, 1), -1, arg.dtype),
                               arg[:, :-1]], axis=1)
        keep = (arg != 0) & (arg != unknown_id) & (arg != prev)
        last = np.max(np.where(keep, np.arange(T)[None, :], -1), axis=1)
        end = np.where(last >= 0, np.minimum(last + 4, T), 0)
        segs = count_segments(ci, n_above, unknown_id=unknown_id,
                              run_max=run_max)
        want = [int(keep.sum(axis=1).max()), int(end.max()),
                int(segs.max()), int(n_above.max())]
        assert got == want, (trial, B, T, run_max, got, want)

        # full-search mode passes n_above=None: chars/end must still match
        got_none = [int(x) for x in stats(jnp.asarray(ci), None)]
        assert got_none[:2] == want[:2]


def test_count_ladder_matches_host_helper():
    """The device ladder sizing (``make_count_ladder``) must equal the
    host ``count_ladder_segments`` bound on random batches, across rung
    depths, run_max values, and the no-constraint (short-line) case."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        count_ladder_segments, make_count_ladder)
    rng = np.random.default_rng(11)
    D, unknown_id = 8, 7
    for trial in range(12):
        B = int(rng.integers(1, 5))
        T = int(rng.integers(4, 60))
        run_max = int(rng.integers(1, 5))
        arg = rng.integers(0, D, (B, T))
        if trial == 0:
            arg[0] = 0                        # empty line: all blank
        n_above = np.where(rng.random((B, T)) < 0.7, 1,
                           rng.integers(2, 5, (B, T))).astype(np.int32)
        ci = np.zeros((B, T, 3), np.int64)
        ci[:, :, 0] = arg

        ladder = make_count_ladder(unknown_id=unknown_id, run_max=run_max)
        for ctx1 in (2, 4, 8, 1000):          # 1000: nothing constrains
            got = int(ladder(jnp.asarray(ci), jnp.asarray(n_above), ctx1))
            want = count_ladder_segments(ci, n_above, ctx1=ctx1,
                                         unknown_id=unknown_id,
                                         run_max=run_max)
            assert got == want, (trial, B, T, run_max, ctx1, got, want)


def _ctx_only_beam(max_len, **kw):
    """AdaptiveLMBeam with a stub LM — enough for the ctx-sizing logic,
    which only reads ``clm.model.max_len``."""
    import types
    clm = types.SimpleNamespace(model=types.SimpleNamespace(max_len=max_len))
    return AdaptiveLMBeam(clm, None, None, unknown_id=9, lm_panelty=1.0,
                          len_bonus=1.0, **kw)


def test_pinned_ctx_above_max_len_rejected():
    """lm_ctx past the LM's trained max_len would silently reuse the last
    positional embedding — must raise at construction, not decode wrong."""
    with pytest.raises(ValueError, match="max_len"):
        _ctx_only_beam(512, lm_ctx=1024)


def test_auto_ctx_falls_back_to_max_len():
    beam = _ctx_only_beam(512)
    # 495 + CTX_MARGIN(24) overshoots 512, but the line itself fits:
    # auto mode must use max_len, not reject the input
    assert beam._auto_ctx(495) == 512
    with pytest.raises(ValueError):
        beam._auto_ctx(511)                # 511 chars + <s> truly can't fit


def test_escalated_ctx_reaches_max_len():
    beam = _ctx_only_beam(600)
    beam._ctx = 512                        # past the last STABLE_CTX entry
    assert beam._escalated_ctx() == 600
    beam._ctx = 600
    with pytest.raises(RuntimeError):
        beam._escalated_ctx()


def test_pick_group_size():
    assert pick_group_size(32, 8) == 8
    assert pick_group_size(32, 16) == 8     # 16 is a known-faulty shape
    assert pick_group_size(32, 32) == 32
    assert pick_group_size(4, 8) == 4
    assert pick_group_size(6, 4) == 3       # largest divisor of 6 <= 4
    assert pick_group_size(1, 8) == 1
    assert pick_group_size(7, 4) == 1


def test_count_sizing_matches_parts():
    """The fused one-fetch sizing program (``make_count_sizing``) must
    equal ``make_count_stats`` + ``make_count_ladder`` element-wise."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        make_count_ladder, make_count_sizing, make_count_stats)
    rng = np.random.default_rng(13)
    D, unknown_id = 8, 7
    for trial in range(8):
        B = int(rng.integers(1, 5))
        T = int(rng.integers(4, 60))
        run_max = int(rng.integers(1, 5))
        ctx1 = int(rng.integers(1, 24))
        ci = np.zeros((B, T, 3), np.int64)
        ci[:, :, 0] = rng.integers(0, D, (B, T))
        n_above = np.where(rng.random((B, T)) < 0.7, 1,
                           rng.integers(2, 5, (B, T))).astype(np.int32)
        stats = make_count_stats(unknown_id=unknown_id, run_max=run_max)
        ladder = make_count_ladder(unknown_id=unknown_id, run_max=run_max)
        sizing = make_count_sizing(unknown_id=unknown_id, run_max=run_max)
        want = [int(x) for x in stats(jnp.asarray(ci),
                                      jnp.asarray(n_above))]
        want.append(int(ladder(jnp.asarray(ci), jnp.asarray(n_above),
                               ctx1)))
        got = [int(x) for x in sizing(jnp.asarray(ci), jnp.asarray(n_above),
                                      ctx1)]
        assert got == want, (trial, B, T, run_max, ctx1)


def test_decode_async_interleaved_matches_sync(setup):  # noqa: F811
    """Two batches dispatched before either result() (the pipelined
    pattern of run_benchmark/bench.py) decode exactly like sequential
    ``decode`` calls, including the deferred overflow check."""
    codec, clm, scorer, c2l, l2c = setup
    batch_a = _prep(_peaky_preds(T=16, B=4, seed=3).astype(np.float32))
    batch_b = _prep(_dense_char_line(T=40, n_chars=9, seed=5))

    kw = dict(beam_size=4, depth=6, unknown_id=codec.unknown_id,
              lm_panelty=0.7, len_bonus=1.5, skip_search=True)
    sync = AdaptiveLMBeam(clm, c2l, l2c, **kw)
    want_a = codec.compact_to_texts(*sync.decode(*batch_a))
    want_b = codec.compact_to_texts(*sync.decode(*batch_b))

    pipe = AdaptiveLMBeam(clm, c2l, l2c, **kw)
    pa = pipe.decode_async(*batch_a)
    pb = pipe.decode_async(*batch_b)       # dispatched before pa.result()
    got_a = codec.compact_to_texts(*pa.result())
    got_b = codec.compact_to_texts(*pb.result())
    assert got_a == want_a and got_b == want_b


def test_decode_async_escalates_on_overflow(setup, monkeypatch):  # noqa: F811
    """result() performs the overflow escalation the sync path used to."""
    codec, clm, scorer, c2l, l2c = setup
    monkeypatch.setattr(adaptive, "STABLE_CTX", (8, 16, 64))
    monkeypatch.setattr(adaptive, "CTX_MARGIN", 0)
    args = _prep(_dense_char_line(T=40, n_chars=12, seed=2))
    beam = AdaptiveLMBeam(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, skip_search=True, ctx_ladder=0)
    # lie about the greedy count so the first pick (8) overflows
    monkeypatch.setattr(beam, "_auto_ctx", lambda chars_max: 8)
    pending = beam.decode_async(*args)
    assert beam._ctx == 8
    prefixes, lengths = pending.result()   # escalates inside result()
    assert beam._ctx > 8
    texts = codec.compact_to_texts(prefixes, lengths)
    assert all(len(t) == 12 for t in texts)


def test_adaptive_int8_lm_decode_agrees(setup):  # noqa: F811
    """--lm-int8: the fused decode with a quantized LM agrees with the float
    LM on confidently-peaked posteriors (quant noise ~0.1 logp is far below
    the peaks' margins; genuine near-ties may flip, so the gate is
    most-lines-identical, mirroring the ab_lm_beam product gate)."""
    from handwritten_chinese_ocr_samples_tpu.lm.cached import CachedLM

    codec, clm, scorer, c2l, l2c = setup
    clm_q = CachedLM(clm.model, clm.p, quant_int8=True)
    args = _prep(_peaky_preds(T=16, B=8, seed=11).astype(np.float32))
    kw = dict(beam_size=4, depth=6, unknown_id=codec.unknown_id,
              lm_panelty=0.7, len_bonus=1.5, skip_search=True)
    want = codec.compact_to_texts(
        *AdaptiveLMBeam(clm, c2l, l2c, **kw).decode(*args))
    got = codec.compact_to_texts(
        *AdaptiveLMBeam(clm_q, c2l, l2c, **kw).decode(*args))
    same = sum(g == w for g, w in zip(got, want))
    assert same >= 6, (got, want)


def _soft_preds(T, B, seed):
    """Posteriors with SOFT runner-ups: every char frame carries a second
    class at ~0.005 probability — above the reference prune 0.001
    (ambiguous) but below a calibrated 0.05 (fast). Models the round-4
    trained checkpoint's regime of ~3 ambiguous frames per character."""
    rng = np.random.default_rng(seed)
    D = len(CHARS) + 2
    logits = rng.normal(size=(T, B, D)) * 0.05
    for b in range(B):
        for t in range(T):
            if rng.random() < 0.5:
                logits[t, b, 0] += 12.0
            else:
                c = rng.integers(1, D - 1)
                logits[t, b, c] += 12.0
                # runner-up ~0.005 of the mass
                r = rng.integers(1, D - 1)
                if r != c:
                    logits[t, b, r] += 12.0 + np.log(0.005)
    return logits.astype(np.float32)


@pytest.mark.parametrize("prune_p", [0.001, 0.05])
def test_adaptive_prune_knob_matches_host(setup, prune_p):  # noqa: F811
    """The --prune serving knob (VERDICT r4 #2: calibrate the ambiguity
    threshold for soft posteriors) threads end-to-end: AdaptiveLMBeam and
    the host oracle agree at the SAME non-default prune, and the tighter
    prune provably shrinks the segment count the adaptive driver sizes."""
    from scipy.special import log_softmax

    from handwritten_chinese_ocr_samples_tpu.decode.beam_host import (
        BeamSearchConfig, BeamSearchDecoder)
    from handwritten_chinese_ocr_samples_tpu.decode.lm_interface import (
        JaxLMBackend)
    from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
        topk_logsoftmax_xla)

    codec, clm, scorer, c2l, l2c = setup
    prune_lp = float(np.log(prune_p))
    logits_tbd = _soft_preds(T=20, B=4, seed=3)
    cfg = BeamSearchConfig(beam_size=4, search_depth=6, lm_panelty=0.7,
                           len_bonus=1.5, use_lm_pred=True,
                           use_lm_score=True, skip_search=True,
                           prune_log_prob=prune_lp)
    host = BeamSearchDecoder(codec, JaxLMBackend(scorer), cfg)
    want = host.decode(log_softmax(logits_tbd, axis=2), already_log=True)

    beam = AdaptiveLMBeam(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, skip_search=True, prune=prune_lp)
    logits_btd = jnp.asarray(logits_tbd.transpose(1, 0, 2))
    cv, ci, blank_lp, n_above = topk_logsoftmax_xla(logits_btd, k=6,
                                                    prune=prune_lp)
    logz = jax.scipy.special.logsumexp(
        logits_btd.astype(jnp.float32), axis=-1)
    got = codec.compact_to_texts(
        *beam.decode(cv, ci, logits_btd, logz, blank_lp, n_above))
    assert got == want, prune_p
    # the calibrated prune turns soft frames back into fast frames: the
    # raw per-line segment counts (what the auto budget sizes from,
    # before its floor of 16) must shrink vs the reference threshold
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        count_segments)
    segs = int(count_segments(ci, n_above,
                              unknown_id=codec.unknown_id).max())
    if prune_p == 0.05:
        assert segs <= 6, segs       # ~1 segment per char run
    else:
        assert segs >= 9, segs       # every soft runner-up pays a segment
