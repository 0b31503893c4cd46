"""LM-fused CTC beam search, fully on device (KV-cached transformer).

Reproduces the reference's full context beam search with transformer
prediction AND scoring (`ctc_codec.py:183-285` with ``use_tfm_pred`` +
``use_tfm_score``) as one XLA program per batch item group:

  * visual candidates: per-frame top-K CTC classes (from
    ``ops.topk_logsoftmax``); linguistic candidates: top-M next characters
    from each beam's LM distribution (`ctc_codec.py:215-227`), whose CTC
    posterior is gathered from the raw logits (`ctc_codec.py:236,242`);
  * prefix extension with pb/pnb logaddexp merge via the same hash-sort
    machinery as ``beam_device``;
  * scoring ``pt = lm_score(prefix + suffix) * lm_panelty +
    len(prefix) * len_bonus`` (`ctc_codec.py:267-274`): the prefix part is
    maintained incrementally; the suffix part (next <=4 greedy chars,
    re-scored every frame because the suffix changes with t) comes from a
    grouped teacher-forced *peek* — one causal forward over each
    continuation, attending the parent beam's KV cache plus transient
    scratch. Nothing is ever re-scored from scratch, unlike the
    reference's per-(beam, frame) full transformer calls
    (`transformer_infer.py:41-60`);
  * committing a selected extension is free: the peek already produced the
    extension token's per-layer k/v and its next-token distribution, so
    the "LM step" is a cache gather + masked write (no extra forward).

The characters live in two id spaces: CTC class ids (blank 0, chars 1..N,
unknown N+1) and LM token ids (specials 0..3, chars 4..). ``codec2lm`` /
``lm2codec`` lookup tables translate between them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..lm.cached import CachedLM, LMCache
from .beam_device import (_hash_extend, _logaddexp,
                          _segment_logaddexp_sorted, NEG_INF,
                          _H1_SEED, _H2_SEED)


def make_id_tables(codec, tokenizer):
    """codec<->LM id lookup tables (int32 numpy; -1 = no mapping)."""
    D = codec.num_classes
    V = tokenizer.vocab_size
    codec2lm = np.full((D,), tokenizer.unk_index, dtype=np.int32)
    lm2codec = np.full((V,), -1, dtype=np.int32)
    for ch, cid in codec.dict.items():
        if ch in ("<blank>", "<unknown>"):
            continue
        lid = tokenizer.indices.get(ch)
        if lid is not None:
            codec2lm[cid] = lid
            lm2codec[lid] = cid
    return codec2lm, lm2codec


def _run_write(base, n_com, Lc, k_tok, v_tok):
    """One-hot multi-token run write: position t of beam b receives run
    token r iff ``t - base[b] == r < n_com[b]`` — a (B, L, RM) one-hot
    contraction (RM tiny), streaming-friendly on TPU where per-row
    dynamic scatter serializes. ``k_tok/v_tok (layers, B, RM, H, Dh)``
    already in the cache dtype. Returns ``(k_rows, v_rows,
    written (B, L))``; positions past ``Lc`` simply never match."""
    RM = k_tok.shape[2]
    t_ids = jnp.arange(Lc)
    r_ids = jnp.arange(RM)[None, None, :]
    roff = t_ids[None, :, None] - base[:, None, None]
    w_oh = (roff == r_ids) & (r_ids < n_com[:, None, None])
    soh = w_oh.astype(k_tok.dtype)
    return (jnp.einsum("btr,zbrhd->zbthd", soh, k_tok),
            jnp.einsum("btr,zbrhd->zbthd", soh, v_tok),
            jnp.any(w_oh, axis=2))


class LMBeamState(NamedTuple):
    prefixes: jnp.ndarray      # (BM, L) codec ids
    lengths: jnp.ndarray       # (BM,)
    pb: jnp.ndarray            # (BM,)
    pnb: jnp.ndarray           # (BM,)
    h1: jnp.ndarray            # (BM,)
    h2: jnp.ndarray            # (BM,)
    prefix_score: jnp.ndarray  # (BM,) sum positional logP of prefix chars
    next_logp: jnp.ndarray     # (BM, V) logP of next token given prefix
    cache: LMCache             # per-beam KV cache
    ovf: jnp.ndarray           # () bool: a KV write would exceed lm_ctx


def _grouped_peek(clm: CachedLM, cache: LMCache, tokens: jnp.ndarray,
                  n_tokens: jnp.ndarray, next_logp: jnp.ndarray,
                  *, full_kv: bool = False, want_last: bool = False,
                  extra_kv=None, pos_offset=None):
    """Score token continuations grouped by parent beam.

    ``tokens (BM, R, S1)``: LM-token sequences continuing each parent's
    prefix (R rows per parent); ``n_tokens (BM, R)`` valid counts;
    ``next_logp (BM, V)`` scores each row's first token for free.
    Returns summed log-probs ``(BM, R)``. Attention context per row =
    parent's cache + the row's own tokens.

    The continuations are teacher-forced (every token is known up front),
    so all S1 positions run in ONE causal forward — no sequential decode:
    queries at position s attend the parent cache plus row tokens 0..s.

    Besides the summed scores (BM, R), returns the byproducts that make a
    separate committed LM step unnecessary: per-layer k/v for each row's
    FIRST token ``(layers, BM, R, H, Dh)`` (exactly what ``clm.step``
    would write into the cache for that token) — or for ALL S1 positions
    ``(layers, BM, R, S1, H, Dh)`` with ``full_kv=True`` — and the
    position-0 log-probs ``(BM, R, V)`` (the next-token distribution after
    prefix+first-token — the extended beam's ``next_logp``).

    ``want_last=True`` appends the log-probs at each row's LAST valid
    position ``n_tokens-1`` (BM, R, V) — the next-token distribution after
    the whole row, needed when committing a multi-token run.

    ``extra_kv=(ek, ev, en)`` injects per-beam NOT-YET-COMMITTED context:
    ``ek/ev (layers, BM, E, H, Dh)`` k/v for ``en (BM,)`` tokens that sit
    (causally) between the cache and the rows — the deferred run commit.
    Every query position attends them (masked by ``r < en``); positions
    shift by ``pos_offset (BM,)`` (= ``en``) so embeddings line up with
    where those tokens WILL live in the cache.
    """
    from ..ops.peek_attention import (combine_partials, merge_partials,
                                      peek_cache_attention,
                                      peek_cache_attention_xla)

    BM, R, S1 = tokens.shape

    total = jnp.where(
        n_tokens > 0,
        next_logp[jnp.arange(BM)[:, None], tokens[:, :, 0]],
        0.0)                                                   # (BM, R)

    # In peek mode the LAST position's entire forward is dead weight: its
    # logits would score token S1 (which doesn't exist) and no later query
    # attends its k/v — so the layers run on Sc = S1-1 positions (~20% of
    # the peek FLOPs at S1=5). want_last mode needs every position.
    Sc = S1 if (want_last or S1 == 1) else S1 - 1
    tokens_c = tokens[:, :, :Sc]

    # absolute positions: cache length (+ deferred tokens) + 0..Sc-1
    base = cache.lengths if pos_offset is None else (cache.lengths
                                                     + pos_offset)
    pos = base[:, None, None] + jnp.arange(Sc)[None, None, :]
    h = clm._embed_token(tokens_c, pos)                        # (BM, R, Sc, d)
    s_ids = jnp.arange(Sc)
    causal = s_ids[None, :] <= s_ids[:, None]  # key t visible to query s iff t<=s
    scale = float(np.sqrt(clm.d_head))
    # Cache-part attention via flash partials. Two equivalent backends:
    # an XLA formulation (default) and a Pallas kernel that keeps the
    # (BM, R, S1, H, Lmax) score tensor in VMEM. Measured on v5e at the
    # production shape (G=8..32, ctx 256) the XLA path is FASTER (6.34 vs
    # 5.59 lines/sec at G=8): the kernel's per-beam grid serializes 80-320
    # small blocks while XLA batches the whole einsum; the kernel also
    # correlates with a worker "kernel fault" at G=16 (NOTES.md). Opt in
    # with HCTR_PEEK_PALLAS=1 (larger ctx/beam shapes may flip the verdict).
    import os
    use_pallas = (jax.default_backend() == "tpu"
                  and bool(os.environ.get("HCTR_PEEK_PALLAS")))
    cache_attn = (peek_cache_attention if use_pallas
                  else peek_cache_attention_xla)

    k0s, v0s = [], []
    for li in range(clm.n_layers):
        lp = clm.p[f"layer{li}"]
        hn = clm._ln(h, lp["ln1"])
        q, k, v = clm._qkv_proj(hn, li)                    # (BM, R, Sc, H, Dh)
        k0s.append(k if full_kv else k[:, :, 0])
        v0s.append(v if full_kv else v[:, :, 0])
        qs = (q / scale).astype(q.dtype)
        # cache part: every position sees the whole (valid) prefix
        o1, m1, l1 = cache_attn(
            qs.reshape(BM, R * Sc, clm.n_heads, clm.d_head),
            cache.k[li], cache.v[li], cache.lengths)
        o1 = o1.reshape(BM, R, Sc, clm.n_heads, clm.d_head)
        m1 = m1.reshape(BM, R, Sc, clm.n_heads)
        l1 = l1.reshape(BM, R, Sc, clm.n_heads)
        if extra_kv is not None:
            # deferred-run part: E per-beam keys between cache and rows,
            # fully visible to every query, masked by r < en — plain XLA
            ek, ev, en = extra_kv
            sc3 = jnp.einsum("brshk,behk->brshe", qs, ek[li],
                             preferred_element_type=jnp.float32)
            e_ok = (jnp.arange(ek.shape[2])[None, :]
                    < en[:, None])[:, None, None, None, :]
            sc3 = jnp.where(e_ok, sc3, NEG_INF)
            m3 = jnp.max(sc3, axis=-1)
            p3 = jnp.where(e_ok, jnp.exp(sc3 - m3[..., None]), 0.0)
            l3 = jnp.sum(p3, axis=-1)
            o3 = jnp.einsum("brshe,behk->brshk", p3.astype(ev.dtype),
                            ev[li], preferred_element_type=jnp.float32)
            o1, m1, l1 = combine_partials(o1, m1, l1, o3, m3, l3)
        # own-row causal part: Sc keys — a few KB, plain XLA
        sc_own = jnp.einsum("brshk,brthk->brsht", qs, k,
                            preferred_element_type=jnp.float32)
        sc_own = jnp.where(causal[None, None, :, None, :], sc_own, NEG_INF)
        m2 = jnp.max(sc_own, axis=-1)
        p2 = jnp.where(causal[None, None, :, None, :],
                       jnp.exp(sc_own - m2[..., None]), 0.0)
        l2 = jnp.sum(p2, axis=-1)
        o2 = jnp.einsum("brsht,brthk->brshk", p2.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
        o = merge_partials(o1, m1, l1, o2, m2, l2)
        h = h + clm._attn_out(o.astype(h.dtype), lp["attn"]["out"])
        hn = clm._ln(h, lp["ln2"])
        hn = hn @ lp["ff1"]["kernel"] + lp["ff1"]["bias"]
        hn = jax.nn.relu(hn)
        hn = hn @ lp["ff2"]["kernel"] + lp["ff2"]["bias"]
        h = h + hn

    if want_last:
        # run-commit mode (small R): full log-prob rows are consumed only
        # at position 0 (contract: the distribution after prefix+token0)
        # and at each row's LAST valid position (the committed beam's new
        # next_logp) — materialize exactly those two (BM, R, 2, V) rows;
        # the in-between positions stream (target, LSE) like peek mode
        # instead of a (BM, R, S1, V) f32 log-softmax.
        from ..ops.logits_lse import target_lse as _target_lse

        emb_w = clm.p["embed"]["embedding"]
        xs = clm._ln(h, clm.p["ln_f"])                      # (BM,R,S1,d)
        x_last = jnp.take_along_axis(
            xs, jnp.clip(n_tokens - 1, 0)[:, :, None, None],
            axis=2)[:, :, 0]                                # (BM,R,d)
        x2 = jnp.stack([xs[:, :, 0], x_last], axis=2)       # (BM,R,2,d)
        logp2 = jax.nn.log_softmax(
            jnp.einsum("...d,vd->...v", x2, emb_w,
                       preferred_element_type=jnp.float32), axis=-1)
        if S1 > 1:
            tgt_r, lse_r = _target_lse(xs[:, :, :-1], emb_w,
                                       tokens[:, :, 1:])
            s_valid = (jnp.arange(1, S1)[None, None, :]
                       < n_tokens[:, :, None])
            total = total + jnp.sum(
                jnp.where(s_valid, tgt_r - lse_r, 0.0), axis=-1)
        return (total, logp2[:, :, 0], jnp.stack(k0s), jnp.stack(v0s),
                logp2[:, :, 1])

    # peek mode: h holds positions 0..Sc-1 = 0..S1-2 (the dead last
    # position was never computed), and only position 0 needs a full
    # log-softmax row (it becomes the extended beam's next_logp). For
    # s >= 1 the contribution is logit[token] - logsumexp(logits),
    # computed through ``ops.logits_lse.target_lse`` — the XLA form by
    # default; ``HCTR_LSE_PALLAS=1`` opts into a streaming flash-LSE
    # kernel that skips the (rows, V) f32 logits round-trip (measured
    # ~even e2e at production shape — see the kernel docstring).
    from ..ops.logits_lse import target_lse

    emb = clm.p["embed"]["embedding"]
    xs = clm._ln(h, clm.p["ln_f"])                       # (BM,R,Sc,d)
    logits0 = jnp.einsum("...d,vd->...v", xs[:, :, 0], emb,
                         preferred_element_type=jnp.float32)  # (BM,R,V)
    logp0 = jax.nn.log_softmax(logits0, axis=-1)            # (BM, R, V)
    if S1 > 1:
        # token 1 is scored by position 0's already-materialized row
        c0 = (jnp.take_along_axis(
                  logits0, tokens[:, :, 1][..., None], axis=-1)[..., 0]
              - jax.scipy.special.logsumexp(logits0, axis=-1))  # (BM,R)
        if Sc > 1:
            # positions 1..Sc-1 score tokens 2..S1-1
            tgt_r, lse_r = target_lse(xs[:, :, 1:], emb, tokens[:, :, 2:S1])
            contrib = jnp.concatenate([c0[..., None], tgt_r - lse_r],
                                      axis=-1)           # (BM,R,S1-1)
        else:
            contrib = c0[..., None]
        s_valid = (jnp.arange(1, S1)[None, None, :] < n_tokens[:, :, None])
        total = total + jnp.sum(jnp.where(s_valid, contrib, 0.0), axis=-1)
    return (total, logp0, jnp.stack(k0s), jnp.stack(v0s))


def make_lm_beam_search(
    clm: CachedLM,
    codec2lm: np.ndarray,
    lm2codec: np.ndarray,
    *,
    beam_size: int = 10,
    depth: int = 10,
    lm_depth: int | None = None,
    unknown_id: int,
    blank_id: int = 0,
    lm_panelty: float = 0.8,
    len_bonus: float = 4.8,
    suffix_frames: int = 4,
    lm_ctx: int = 256,
    use_lm_pred: bool = True,
    skip_search: bool = False,
    prune: float = -6.9077554,  # log(0.001), `ctc_codec.py:128`
    kept_budget: int | None = None,
    group_size: int = 1,
    seg_budget: int | None = None,
    run_max: int = 8,
    frame_budget: int | None = None,
    peek_rows: int | None = None,
    return_overflow: bool = False,
    ctx_ladder: tuple[int, int] | None = None,
    fused_commit: bool = False,
    dense_merge: bool = False,
):
    """Build a jitted LM-fused beam search.

    Returned fn signature:
        fn(cand_vals (B,T,K), cand_idx (B,T,K), logits (B,T,D),
           logz (B,T)[, blank_lp (B,T), n_above (B,T)])
          -> (prefixes (B,T), lengths (B,))

    ``skip_search=True`` reproduces the reference's pruning fast path
    (`ctc_codec.py:124-181`): frames with exactly one class above the prune
    threshold update every beam in place — no candidate enumeration, no
    merge, no LM peek; only genuinely ambiguous frames pay for the full
    search. On device this becomes **frame compaction**: runs of confident-
    blank frames collapse to one closed-form (pb, pnb) operator computed by
    a batched associative scan, and only char-emitting/ambiguous frames
    enter the sequential scan (see ``decode_one``).
    ``blank_lp``/``n_above`` come from ``ops.topk_logsoftmax``.

    ``kept_budget`` statically caps the number of scanned frames per line
    (None = T, always exact). A line whose kept-frame count exceeds the
    budget is truncated mid-line — size it from data
    (``count_kept_frames``); ~2-3x the expected character count is ample
    for trained models.

    ``group_size=G`` vmaps G batch items through one scan (``lax.map`` over
    B/G groups): the per-segment merge/peek work batches G-wide on the MXU.
    B must be divisible by G.

    In skip mode the sequential unit is a SEGMENT, not a frame: a run of
    up to ``run_max`` char-fast frames (single-survivor, in-place beam
    update — no search) closed by at most one ambiguous frame. The whole
    run costs one teacher-forced LM forward; only the ambiguous frame pays
    the full candidate peek + merge + cache reorder. ``seg_budget``
    statically caps scanned segments per line (None = kept budget, always
    enough); size it with ``count_segments`` — segments ~= ambiguous
    frames + char-fast runs longer than ``run_max``.

    ``return_overflow=True`` appends a per-line bool to the outputs: True
    when any beam's committed tokens would have written past ``lm_ctx``
    (the write is dropped on device; the flag lets the host refuse to
    silently decode with truncated LM context — see ``decode.adaptive``).

    ``peek_rows`` compacts the per-beam LM peek from ``1 + depth +
    lm_depth`` rows to ``1 + peek_rows``: candidate rows that can never be
    consumed — pruned-away visual classes (skip mode maps them to
    ``unknown``, `ctc_codec.py:144`), blanks, unmapped LM proposals — are
    sorted out of the peek table before the transformer runs. Merge rows,
    hashes and sort order are untouched, so decodes are bit-identical;
    only the peek table layout changes. EXACT when ``peek_rows >=
    min(max(n_above), depth) + lm_depth`` (``count_peek_rows``) — the
    useful-row count can never exceed that bound. None = no compaction.

    ``ctx_ladder=(segs1, ctx1)`` (skip mode only) scans the first
    ``segs1`` segments on a ``ctx1``-deep KV cache, then zero-pads the
    carry to ``lm_ctx`` and finishes at full depth. Early in the decode
    every beam has committed only a few tokens, yet the per-step cache
    reorder and the peek's cache attention both cost O(cache depth) — the
    ladder cuts that for the front of the scan. EXACT (decodes and
    overflow behavior unchanged) whenever no beam commits more than
    ``ctx1`` tokens within the first ``segs1`` segments; size the pair
    with ``count_ladder_segments`` for a sound per-batch bound (a beam
    commits at most one token per kept frame, so the bound cannot be
    beaten by any beam path). A LIST of ``(segs, ctx)`` rungs (strictly
    increasing in both) chains several depths — e.g. ``[(k64, 64),
    (k96, 96)]`` climbs 64 -> 96 -> lm_ctx; each rung's ``segs`` is its
    own ``count_ladder_segments`` bound for its ``ctx``.

    ``fused_commit=True`` (skip mode) defers the run phase's multi-token
    cache write: the ambiguous frame's peek attends the run k/v directly
    (``extra_kv``) and the post-merge reorder write commits run tokens +
    extension token in ONE full-cache pass per segment instead of two.
    Mathematically the same attention context and writes; numerically
    the flash combine regroups the softmax reduction (cache and run
    partials merge via ``combine_partials`` instead of one sum), so
    scores can differ in low-order float bits — a hypothesis pair tied
    within ~1 ULP at the beam boundary could in principle rank
    differently (decode-equal on the oracle suite).

    ``dense_merge=True`` replaces the per-step (hash, hash, index) sort +
    segmented scan with an O(rows^2) equality-matrix merge (same
    representative row, same groups; group logaddexp computed max+exp-sum
    instead of the pairwise chain — decode-equal, low-order float bits
    may differ). Sorting networks are a known soft spot on TPU; rows^2
    is ~50k VPU lanes at beam shapes.

    ``frame_budget`` (full search only) statically truncates the frame
    scan: frames at or beyond every line's ``end_step`` (last greedy char
    + ``suffix_frames``, `ctc_codec.py:198-199`) are inactive no-ops, so a
    budget >= the batch max end_step is EXACT while skipping the dead tail
    of the width axis. ``group_size`` also applies to full search: G lines
    vmap through one scan, ``lax.map`` over B/G groups — bounding live
    KV-cache HBM to G x beam_size rows instead of B x beam_size.
    """
    BM, K = beam_size, depth
    M = (lm_depth if lm_depth is not None else depth) if use_lm_pred else 0
    P = K + M if peek_rows is None else max(1, min(peek_rows, K + M))
    if P < K + M and not return_overflow:
        # A compacted peek below the static bound is only exact when the
        # data respects the ``count_peek_rows`` bound — which the device
        # can't verify without surfacing the overflow flag. Refuse to
        # build a decoder that could silently mis-score (the flag would
        # be computed and then dropped); callers either size peek_rows
        # from data AND accept the flag, or skip compaction.
        raise ValueError(
            f"peek_rows={peek_rows} is below the always-exact bound "
            f"{K + M} (depth + lm_depth); pass return_overflow=True and "
            f"check the per-line flag, or leave peek_rows=None")
    if ctx_ladder is not None:
        if not skip_search:
            raise ValueError("ctx_ladder requires skip_search=True")
        # normalize: one (segs, ctx) pair or a list of rungs
        rungs = (list(ctx_ladder) if ctx_ladder
                 and isinstance(ctx_ladder[0], (tuple, list))
                 else [tuple(ctx_ladder)])
        for i, (k_r, c_r) in enumerate(rungs):
            prev_k = rungs[i - 1][0] if i else 0
            prev_c = rungs[i - 1][1] if i else 0
            if not (prev_c < c_r < lm_ctx) or k_r <= prev_k or k_r < 1:
                raise ValueError(
                    f"ctx_ladder={ctx_ladder}: rungs must be strictly "
                    f"increasing (segments, ctx) pairs with every ctx "
                    f"< lm_ctx={lm_ctx}")
        ctx_ladder = rungs
    if fused_commit and not skip_search:
        raise ValueError("fused_commit requires skip_search=True "
                         "(there is no run phase to defer otherwise)")
    S = suffix_frames
    S1 = S + 1
    sos = 0  # tokenizer.sos_index
    codec2lm_j = jnp.asarray(codec2lm)
    lm2codec_j = jnp.asarray(lm2codec)

    def decode_one(cand_vals, cand_idx, logits, logz,
                   blank_lp=None, n_above=None):
        T = cand_vals.shape[0]
        L = T

        # ---- greedy top line, end step, per-frame suffixes
        arg = cand_idx[:, 0]
        prev = jnp.concatenate([jnp.array([-1], jnp.int32), arg[:-1]])
        keep = (arg != blank_id) & (arg != unknown_id) & (arg != prev)
        any_keep = jnp.any(keep)
        last_keep = jnp.max(jnp.where(keep, jnp.arange(T), -1))
        end_step = jnp.where(any_keep,
                             jnp.minimum(last_keep + S, T), 0)
        # compact kept chars + their frames
        kpos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        n_kept = jnp.sum(keep)
        kept_chars = jnp.zeros((T,), jnp.int32).at[
            jnp.where(keep, kpos, T)].set(arg, mode="drop")
        # rank[t] = #kept frames at position <= t
        rank = jnp.cumsum(keep.astype(jnp.int32))              # (T,)
        # suffix_j(t) = kept_chars[rank[t] + j] valid while < n_kept
        j_ids = jnp.arange(S)[None, :]
        sidx = rank[:, None] + j_ids                           # (T, S)
        suffix_codec = jnp.where(sidx < n_kept,
                                 kept_chars[jnp.clip(sidx, 0, T - 1)], 0)
        suffix_valid = jnp.sum((sidx < n_kept).astype(jnp.int32), axis=1)

        # A ladder spanning every segment would leave the cache at the
        # small rung for the whole decode (breaking the lm_ctx contract)
        # — keep only rungs that leave a full-depth final chunk.
        _budget = T if kept_budget is None else min(kept_budget, T)
        _SB = _budget if seg_budget is None else min(seg_budget, _budget)
        ladder = None
        if ctx_ladder is not None:
            ladder = [r for r in ctx_ladder if r[0] < _SB] or None

        # ---- init state: all beams share an sos-primed cache (at the
        # ladder's first-rung depth when laddering — the step/peek/reorder
        # machinery derives every shape and overflow bound from the
        # cache itself, so the same step functions serve every rung)
        cache = clm.init_cache(
            BM, lm_ctx if ladder is None else ladder[0][1])
        logits0, cache = clm.step(cache, jnp.full((BM,), sos, jnp.int32))
        next_logp0 = jax.nn.log_softmax(logits0, axis=-1)
        state = LMBeamState(
            prefixes=jnp.zeros((BM, L), jnp.int32),
            lengths=jnp.zeros((BM,), jnp.int32),
            pb=jnp.full((BM,), NEG_INF).at[0].set(0.0),
            pnb=jnp.full((BM,), NEG_INF),
            h1=jnp.full((BM,), _H1_SEED),
            h2=jnp.full((BM,), _H2_SEED),
            prefix_score=jnp.zeros((BM,), jnp.float32),
            next_logp=next_logp0,
            cache=cache,
            ovf=jnp.zeros((), bool),
        )

        def full_step(state, t, active, run_kv=None):
            """One full-search frame (`ctc_codec.py:183-285`).

            ``run_kv=(ek, ev, en)`` (fused-commit mode): the preceding
            run phase's not-yet-committed k/v — the peek attends them via
            ``extra_kv`` and the reorder write below commits them
            together with the extension token in one cache pass."""
            vis_idx = cand_idx[t]                              # (K,)
            vis_p = cand_vals[t]                               # (K,)
            if skip_search:
                # fallback candidates = surviving classes only
                # (`ctc_codec.py:144,172-178`)
                vis_idx = jnp.where(vis_p > prune, vis_idx, unknown_id)

            # ---- linguistic candidates per beam (`ctc_codec.py:215-227`)
            if M > 0:
                _, lm_top = jax.lax.top_k(state.next_logp, M)  # (BM, M)
                ling_idx = lm2codec_j[lm_top]                  # (BM, M)
                # specials/unmapped (-1) and empty prefixes -> unknown
                # (skipped); CTC posterior gathered from raw logits
                ling_idx = jnp.where(
                    (ling_idx >= 0) & (state.lengths[:, None] > 0),
                    ling_idx, unknown_id)
                ling_p = logits[t][jnp.clip(ling_idx, 0, unknown_id)] \
                    - logz[t]
                cj = jnp.concatenate(
                    [jnp.broadcast_to(vis_idx, (BM, K)), ling_idx], axis=1)
                pj = jnp.concatenate(
                    [jnp.broadcast_to(vis_p, (BM, K)), ling_p], axis=1)
            else:
                cj = jnp.broadcast_to(vis_idx, (BM, K))
                pj = jnp.broadcast_to(vis_p, (BM, K))
            C = K + M                                          # cands/beam
            bi = jnp.repeat(jnp.arange(BM), C)                 # (BM*C,)
            cj = cj.reshape(-1)
            pj = pj.reshape(-1)

            prob = _logaddexp(state.pb, state.pnb)
            tail = jnp.where(
                state.lengths > 0,
                state.prefixes[jnp.arange(BM),
                               jnp.maximum(state.lengths - 1, 0)],
                jnp.int32(-1))

            is_blank = cj == blank_id
            is_unk = cj >= unknown_id
            is_rep = cj == tail[bi]
            beam_dead = prob[bi] <= NEG_INF * 0.5

            a_ext = (~is_blank) & (~is_unk) & (~beam_dead)
            a_pb = jnp.where(is_blank & ~beam_dead, prob[bi] + pj, NEG_INF)
            a_pnb = jnp.where(
                a_ext,
                jnp.where(is_rep, state.pb[bi] + pj, prob[bi] + pj),
                NEG_INF)
            # Repeat-merge contribution to the unchanged prefix's pnb
            # (`ctc_codec.py:263-265`): one row per beam. A candidate equal
            # to the tail may occur twice (visual + LM proposal) and the
            # reference accumulates per occurrence — logaddexp of m equal
            # terms is the term + log(m).
            rep_mask = (is_rep & ~is_blank & ~is_unk).reshape(BM, C)
            rep_count = jnp.sum(rep_mask, axis=1)
            rep_p = jnp.max(jnp.where(rep_mask, pj.reshape(BM, C), NEG_INF),
                            axis=1)
            b_pnb = jnp.where(
                (rep_count > 0) & (prob > NEG_INF * 0.5),
                state.pnb + rep_p + jnp.log(jnp.maximum(rep_count, 1)),
                NEG_INF)                                        # (BM,)

            n_rows = BM * C + BM
            row_parent = jnp.concatenate([bi, jnp.arange(BM)])
            row_char = jnp.concatenate([cj, tail])
            row_is_ext = jnp.concatenate([a_ext, jnp.zeros((BM,), bool)])
            row_pb = jnp.concatenate([a_pb, jnp.full((BM,), NEG_INF)])
            row_pnb = jnp.concatenate([a_pnb, b_pnb])

            ph1, ph2 = state.h1[row_parent], state.h2[row_parent]
            eh1, eh2 = _hash_extend(ph1, ph2, row_char)
            kh1 = jnp.where(row_is_ext, eh1, ph1)
            kh2 = jnp.where(row_is_ext, eh2, ph2)
            row_len = state.lengths[row_parent] + row_is_ext.astype(jnp.int32)
            row_dead = (row_pb <= NEG_INF * 0.5) & (row_pnb <= NEG_INF * 0.5)
            kh1 = jnp.where(row_dead, jnp.int32(0x7FFFFFF0), kh1)
            kh2 = jnp.where(row_dead, jnp.arange(n_rows, dtype=jnp.int32),
                            kh2)

            # ---- LM scoring table: slot 0 = stay, 1.. = extensions
            suf_lm = codec2lm_j[suffix_codec[t]]               # (S,)
            n_suf = suffix_valid[t]
            # stay rows: tokens = suffix only
            stay_tokens = jnp.broadcast_to(suf_lm, (BM, 1, S))
            stay_tokens = jnp.concatenate(
                [stay_tokens,
                 jnp.zeros((BM, 1, 1), jnp.int32)], axis=2)    # (BM,1,S1)
            stay_n = jnp.broadcast_to(n_suf, (BM, 1))
            # ext rows: tokens = [c] + suffix
            ext_c = cj.reshape(BM, C)
            if P < C:
                # Peek-row compaction: only rows that can be consumed
                # (non-blank, non-unknown — `a_ext`) need transformer
                # scores. Sort the useful candidates to the front and run
                # the peek on the first P slots; `slot_ext` remembers where
                # each original candidate landed. Rows left out are exactly
                # the never-consumed ones whenever P >= the useful-row
                # bound (``count_peek_rows``); `peek_ovf` flags the
                # alternative loudly instead of mis-scoring.
                useful = (ext_c != blank_id) & (ext_c < unknown_id)
                order = jnp.argsort(~useful, axis=1, stable=True)
                comp_j = order[:, :P]                          # (BM, P)
                ext_c_peek = jnp.take_along_axis(ext_c, comp_j, axis=1)
                slot_ext = jnp.zeros((BM, C), jnp.int32).at[
                    jnp.arange(BM)[:, None], comp_j].set(
                        1 + jnp.arange(P, dtype=jnp.int32)[None, :])
                peek_ovf = jnp.any(jnp.sum(useful, axis=1) > P)
            else:
                ext_c_peek = ext_c
                slot_ext = 1 + jnp.broadcast_to(
                    jnp.arange(C, dtype=jnp.int32), (BM, C))
                peek_ovf = jnp.zeros((), bool)
            ext_tokens = jnp.concatenate(
                [codec2lm_j[jnp.clip(ext_c_peek, 0, unknown_id)][:, :, None],
                 jnp.broadcast_to(suf_lm, ext_c_peek.shape + (S,))], axis=2)
            ext_n = jnp.broadcast_to(1 + n_suf, ext_c_peek.shape)
            peek_tokens = jnp.concatenate([stay_tokens, ext_tokens], axis=1)
            peek_n = jnp.concatenate([stay_n, ext_n], axis=1)  # (BM, 1+P)
            peek_scores, peek_logp0, peek_k0, peek_v0 = _grouped_peek(
                clm, state.cache, peek_tokens, peek_n, state.next_logp,
                extra_kv=run_kv,
                pos_offset=None if run_kv is None else run_kv[2])
            # pt per row = (parent_prefix_score + continuation) * panelty
            #              + len * bonus
            slot = jnp.where(
                row_is_ext,
                jnp.concatenate([slot_ext.reshape(-1),
                                 jnp.zeros((BM,), jnp.int32)]),
                0)
            row_lm = (state.prefix_score[row_parent]
                      + peek_scores[row_parent, slot])
            row_pt = row_lm * lm_panelty + \
                row_len.astype(jnp.float32) * len_bonus

            # ---- merge + select
            if dense_merge:
                # O(rows^2) hash-equality merge: no sorting network. The
                # group representative is the min-index row (same row the
                # stable sort's segment start lands on); group logaddexp
                # is max + exp-sum (exact; low-order float bits can
                # differ from the sorted pairwise chain). rows^2 at beam
                # shapes is ~50k lanes of VPU work per step.
                idx_r = jnp.arange(n_rows)
                eq = (kh1[:, None] == kh1[None, :]) & \
                     (kh2[:, None] == kh2[None, :])
                is_rep = ~jnp.any(eq & (idx_r[None, :] < idx_r[:, None]),
                                  axis=1)

                def g_lse(x):
                    mx = jnp.max(jnp.where(eq, x[None, :], NEG_INF),
                                 axis=1)
                    s = jnp.sum(jnp.where(eq, jnp.exp(x[None, :]
                                                      - mx[:, None]), 0.0),
                                axis=1)
                    return jnp.where(mx <= NEG_INF * 0.5, NEG_INF,
                                     mx + jnp.log(s))

                pb_m = g_lse(row_pb)
                pnb_m = g_lse(row_pnb)
                total = _logaddexp(pb_m, pnb_m) + row_pt
                total = jnp.where(is_rep & ~row_dead, total, NEG_INF)
                par_s, chr_s, ext_s, slot_s = (row_parent, row_char,
                                               row_is_ext, slot)
            else:
                # sort only (keys, row index); payloads follow by gather —
                # the variadic 10-operand sort moved every column through
                # the sorting network and profiled ~1 ms/step
                kh1_s, kh2_s, order_s = jax.lax.sort(
                    (kh1, kh2, jnp.arange(n_rows, dtype=jnp.int32)),
                    num_keys=2)
                pb_s = row_pb[order_s]
                pnb_s = row_pnb[order_s]
                pt_s = row_pt[order_s]
                par_s = row_parent[order_s]
                chr_s = row_char[order_s]
                ext_s = row_is_ext[order_s]
                dead_s = row_dead[order_s]
                slot_s = slot[order_s]
                seg_start = jnp.concatenate(
                    [jnp.array([True]),
                     (kh1_s[1:] != kh1_s[:-1]) | (kh2_s[1:] != kh2_s[:-1])])
                # per-row values are suffix aggregates; only segment-start
                # rows (the ones consumed below) carry full segment totals
                pb_m = _segment_logaddexp_sorted(pb_s, seg_start)
                pnb_m = _segment_logaddexp_sorted(pnb_s, seg_start)
                total = _logaddexp(pb_m, pnb_m) + pt_s
                total = jnp.where(seg_start & ~dead_s, total, NEG_INF)

            top_tot, top_idx = jax.lax.top_k(total, BM)
            sel_parent = par_s[top_idx]
            sel_ext = ext_s[top_idx]
            sel_char = chr_s[top_idx]
            sel_slot = slot_s[top_idx]
            sel_alive = top_tot > NEG_INF * 0.5
            sel_pb = jnp.where(sel_alive, pb_m[top_idx], NEG_INF)
            sel_pnb = jnp.where(sel_alive, pnb_m[top_idx], NEG_INF)
            sel_do = sel_ext & sel_alive & active

            new_prefixes = state.prefixes[sel_parent]
            app_pos = jnp.minimum(state.lengths[sel_parent], L - 1)
            appended = new_prefixes.at[jnp.arange(BM), app_pos].set(
                jnp.where(sel_ext, sel_char,
                          new_prefixes[jnp.arange(BM), app_pos]))
            new_prefixes = jnp.where(sel_ext[:, None], appended,
                                     new_prefixes)
            new_lengths = state.lengths[sel_parent] + \
                sel_ext.astype(jnp.int32)
            nh1, nh2 = _hash_extend(state.h1[sel_parent],
                                    state.h2[sel_parent], sel_char)

            # ---- LM bookkeeping for the survivors
            sel_lm_tok = codec2lm_j[jnp.clip(sel_char, 0, unknown_id)]
            inc = jnp.take_along_axis(
                state.next_logp[sel_parent], sel_lm_tok[:, None],
                axis=-1)[:, 0]
            new_prefix_score = state.prefix_score[sel_parent] + \
                jnp.where(sel_ext, inc, 0.0)
            # Inactive frames reorder with the identity and write nothing,
            # so the cache passes through bit-identically — no full-cache
            # select (which would copy ~100s of MB per frame).
            reorder = jnp.where(active, sel_parent, jnp.arange(BM))
            do_step = sel_do
            # The committed LM step is free: the peek already computed the
            # extension token's per-layer k/v and its next-token
            # distribution — commit them with the fused reorder + write
            # (one-hot matmul + select epilogue, no scatter).
            k_sel = peek_k0[:, sel_parent, sel_slot]   # (layers, BM, H, Dh)
            v_sel = peek_v0[:, sel_parent, sel_slot]
            Lc = state.cache.k.shape[2]     # current rung's cache depth
            if run_kv is None:
                glen = state.cache.lengths[reorder]
                wpos = jnp.where(do_step, glen, Lc)
                new_cache = CachedLM.gather_write(
                    state.cache, reorder, k_sel.astype(clm.dtype),
                    v_sel.astype(clm.dtype), wpos)._replace(
                        lengths=jnp.where(do_step, glen + 1, glen))
            else:
                # Fused commit: ONE full-cache pass merges (a) the beam
                # reorder (one-hot matmul), (b) the deferred run tokens of
                # the new parent at positions lengths..lengths+n_com-1,
                # and (c) the extension token at lengths+n_com. Replaces
                # the separate run-write pass + gather_write pass.
                ek, ev, en = run_kv
                n_r = en[reorder]
                base = state.cache.lengths[reorder]
                glen = base + n_r
                wpos = jnp.where(do_step, glen, Lc)
                k_runw, v_runw, run_any = _run_write(
                    base, n_r, Lc, ek[:, reorder], ev[:, reorder])
                perm = CachedLM.gather(state.cache, reorder)
                ext_m = (jnp.arange(Lc)[None, :]
                         == wpos[:, None])[None, :, :, None, None]
                run_m = run_any[None, :, :, None, None]
                new_cache = LMCache(
                    k=jnp.where(ext_m, k_sel.astype(clm.dtype)[:, :, None],
                                jnp.where(run_m, k_runw, perm.k)),
                    v=jnp.where(ext_m, v_sel.astype(clm.dtype)[:, :, None],
                                jnp.where(run_m, v_runw, perm.v)),
                    lengths=jnp.where(do_step, glen + 1, glen))
            new_next_logp = jnp.where(
                do_step[:, None],
                peek_logp0[sel_parent, sel_slot],
                state.next_logp[reorder])

            new_state = LMBeamState(
                prefixes=jnp.where(active, new_prefixes, state.prefixes),
                lengths=jnp.where(active, new_lengths, state.lengths),
                pb=jnp.where(active, sel_pb, state.pb),
                pnb=jnp.where(active, sel_pnb, state.pnb),
                h1=jnp.where(active, jnp.where(sel_ext, nh1,
                                               state.h1[sel_parent]),
                             state.h1),
                h2=jnp.where(active, jnp.where(sel_ext, nh2,
                                               state.h2[sel_parent]),
                             state.h2),
                prefix_score=jnp.where(active, new_prefix_score,
                                       state.prefix_score),
                next_logp=new_next_logp,
                cache=new_cache,
                ovf=state.ovf | jnp.any(do_step & (glen >= Lc))
                | peek_ovf,
            )
            return new_state, ()

        def run_phase(state, cf_t, preA, preB):
            """Commit a run of char-fast frames (`ctc_codec.py:145-171`
            applied per frame) paying ONE teacher-forced LM forward.

            ``cf_t (RM,)``: frame indices of the run's single-survivor char
            frames in time order (-1 = empty slot). The per-frame pb/pnb/
            prefix bookkeeping is elementwise per beam (no candidate
            search) and runs as a cheap inner scan; the LM work — which
            per-frame stepping would pay once per frame — batches into one
            grouped peek over each beam's committed tokens, whose
            byproducts provide the committed k/v, the positional log-probs
            (prefix_score increments), and the end-of-run next-token
            distribution."""
            RM = cf_t.shape[0]
            tc = jnp.clip(cf_t, 0)
            slot_on = cf_t >= 0
            char_s = cand_idx[tc, 0]                     # (RM,)
            p_s = cand_vals[tc, 0]
            p0_s = blank_lp[tc]
            A_s = jnp.where(slot_on, preA[tc], 0.0)
            B_s = jnp.where(slot_on, preB[tc], NEG_INF)

            def slot(carry, xs):
                pb, pnb, tail, lengths, h1, h2, prefixes = carry
                on, ch, p, p0, a_op, b_op = xs
                # fold the blank-fast run preceding this frame
                pb = _logaddexp(a_op + pb, b_op + pnb)
                prob = _logaddexp(pb, pnb)
                alive = prob > NEG_INF * 0.5
                is_rep = ch == tail
                pb_live = pb > NEG_INF * 0.5
                ext = (~is_rep) | pb_live        # appends the char
                merge = is_rep & (~pb_live)      # folds into the tail
                n_pb = jnp.where(ext, NEG_INF,
                                 jnp.where(merge, prob + p0, pb))
                n_pnb = jnp.where(
                    ext, jnp.where(is_rep, pb + p, prob + p),
                    jnp.where(merge, pnb + p, pnb))
                upd = on & alive
                ext_u = ext & upd
                app_pos = jnp.minimum(lengths, L - 1)
                appended = prefixes.at[jnp.arange(BM), app_pos].set(
                    jnp.where(ext_u, ch,
                              prefixes[jnp.arange(BM), app_pos]))
                nh1, nh2 = _hash_extend(h1, h2, ch)
                carry = (jnp.where(upd, n_pb, pb),
                         jnp.where(upd, n_pnb, pnb),
                         jnp.where(ext_u, ch, tail),
                         lengths + ext_u.astype(jnp.int32),
                         jnp.where(ext_u, nh1, h1),
                         jnp.where(ext_u, nh2, h2),
                         jnp.where(ext_u[:, None], appended, prefixes))
                return carry, ext_u

            tail0 = jnp.where(
                state.lengths > 0,
                state.prefixes[jnp.arange(BM),
                               jnp.maximum(state.lengths - 1, 0)],
                jnp.int32(-1))
            carry0 = (state.pb, state.pnb, tail0, state.lengths,
                      state.h1, state.h2, state.prefixes)
            (pb, pnb, _t, lengths, h1, h2, prefixes), ext_us = jax.lax.scan(
                slot, carry0, (slot_on, char_s, p_s, p0_s, A_s, B_s))
            commit = ext_us.T                            # (BM, RM)

            # ---- one grouped LM forward over each beam's committed run
            tok_s = codec2lm_j[jnp.clip(char_s, 0, unknown_id)]
            order = jnp.argsort(~commit, axis=1, stable=True)  # compact
            n_com = jnp.sum(commit, axis=1).astype(jnp.int32)
            r_ids = jnp.arange(RM)[None, :]
            ctok = jnp.where(r_ids < n_com[:, None], tok_s[order], 0)
            total, _lp0, k_full, v_full, last_lp = _grouped_peek(
                clm, state.cache, ctok[:, None, :], n_com[:, None],
                state.next_logp, full_kv=True, want_last=True)
            L_ctx = state.cache.k.shape[2]
            new_state = LMBeamState(
                prefixes=prefixes, lengths=lengths, pb=pb, pnb=pnb,
                h1=h1, h2=h2,
                prefix_score=state.prefix_score + total[:, 0],
                next_logp=jnp.where(n_com[:, None] > 0, last_lp[:, 0],
                                    state.next_logp),
                cache=state.cache,     # written below or deferred
                ovf=state.ovf | jnp.any(state.cache.lengths + n_com > L_ctx),
            )
            if fused_commit:
                # Defer the multi-token cache write: the ambiguous frame's
                # peek attends these k/v directly (extra_kv) and the
                # post-merge reorder write commits them in the SAME
                # full-cache pass — one pass per segment instead of two.
                run_kv = (k_full[:, :, 0].astype(clm.dtype),
                          v_full[:, :, 0].astype(clm.dtype), n_com)
                return new_state, run_kv
            # Immediate masked multi-token write (``_run_write``) with a
            # select against the old cache.
            k_run, v_run, w_any = _run_write(
                state.cache.lengths, n_com, L_ctx,
                k_full[:, :, 0].astype(clm.dtype),
                v_full[:, :, 0].astype(clm.dtype))
            m_any = w_any[None, :, :, None, None]
            return new_state._replace(cache=LMCache(
                k=jnp.where(m_any, k_run, state.cache.k),
                v=jnp.where(m_any, v_run, state.cache.v),
                lengths=state.cache.lengths + n_com,
            ))

        if skip_search:
            # ---- frame compaction (`ctc_codec.py:124-181` semantics).
            # Classify every frame:
            #   * blank-fast (single survivor == blank): updates every beam
            #     as pb' = (pb (+) pnb) + p, pnb' = pnb — a linear operator
            #     over the (logaddexp, +) semiring. Runs of these fold into
            #     ONE closed-form operator [[A, B], [-inf, 0]] via an
            #     associative scan — they never enter the sequential scan;
            #   * no-op (survivor == unknown, or t >= end_step): identity;
            #   * kept (char-fast single survivor, or ambiguous full
            #     search): genuinely sequential — prefix/LM-cache state
            #     changes. Only these frames are scanned, which is the
            #     whole speedup: for peaky posteriors kept-frame count ~
            #     2-3x the character count, not the pixel width.
            t_ids = jnp.arange(T)
            in_range = t_ids < end_step
            survivor = cand_idx[:, 0]
            fast = n_above == 1
            blankop = fast & (survivor == blank_id) & in_range
            charfast = (fast & (survivor != blank_id)
                        & (survivor < unknown_id) & in_range)
            kept = (~fast & in_range) | charfast

            p_top = cand_vals[:, 0]
            opA = jnp.where(blankop, p_top, 0.0)
            opB = jnp.where(blankop, p_top, NEG_INF)

            def comb(x, y):
                fx, ax, bx = x
                fy, ay, by = y
                a = ay + ax
                b = _logaddexp(ay + bx, by)
                return (fx | fy,
                        jnp.where(fy, ay, a),
                        jnp.where(fy, by, b))

            # Segmented scan: kept frames are (reset, identity) elements, so
            # scanval[t] = product of blank-ops since the last kept frame.
            _, As, Bs = jax.lax.associative_scan(
                comb, (kept, opA, opB))
            preA = jnp.concatenate([jnp.zeros((1,), As.dtype), As[:-1]])
            preB = jnp.concatenate(
                [jnp.full((1,), NEG_INF, Bs.dtype), Bs[:-1]])
            tailA, tailB = As[T - 1], Bs[T - 1]

            n_kept = jnp.sum(kept)
            budget = T if kept_budget is None else min(kept_budget, T)
            # kept frames first, in time order (stable two-band sort key)
            order = jnp.argsort(jnp.where(kept, t_ids, T + t_ids))
            kept_ts = order[:budget]
            i_ids = jnp.arange(budget)
            act = i_ids < n_kept
            is_cf = charfast[kept_ts] & act
            is_amb = act & ~is_cf

            # ---- segment schedule: each segment = a run of <= RM char-
            # fast frames closed by <= 1 ambiguous frame, preserving time
            # order. Only SEGMENTS are scanned sequentially: the run pays
            # one batched LM forward (run_phase) and the ambiguous frame
            # one full search (full_step) — char-fast frames no longer
            # cost a per-frame peek or cache reorder.
            SB = budget if seg_budget is None else min(seg_budget, budget)
            RM = run_max

            def sched(carry, xs):
                seg, pos, cf_map, amb_map = carry
                t, cf, amb = xs
                overflow = cf & (pos >= RM)   # run full: open a new segment
                w_seg = jnp.where(overflow, seg + 1, seg)
                w_pos = jnp.where(overflow, 0, pos)
                cf_map = cf_map.at[jnp.where(cf, w_seg, SB), w_pos].set(
                    t, mode="drop")
                amb_map = amb_map.at[jnp.where(amb, w_seg, SB)].set(
                    t, mode="drop")
                seg = jnp.where(amb, w_seg + 1, w_seg)
                pos = jnp.where(amb, 0, jnp.where(cf, w_pos + 1, pos))
                return (seg, pos, cf_map, amb_map), ()

            (_, _, cf_map, amb_map), _ = jax.lax.scan(
                sched,
                (jnp.int32(0), jnp.int32(0),
                 jnp.full((SB, RM), -1, jnp.int32),
                 jnp.full((SB,), -1, jnp.int32)),
                (kept_ts, is_cf, is_amb))

            def seg_step(state, xs):
                cf_t, amb_t = xs
                if fused_commit:
                    state, run_kv = run_phase(state, cf_t, preA, preB)
                else:
                    state = run_phase(state, cf_t, preA, preB)
                    run_kv = None
                a_on = amb_t >= 0
                ta = jnp.clip(amb_t, 0)
                state = state._replace(
                    pb=_logaddexp(
                        jnp.where(a_on, preA[ta], 0.0) + state.pb,
                        jnp.where(a_on, preB[ta], NEG_INF) + state.pnb))
                return full_step(state, ta, a_on, run_kv=run_kv)

            if ladder is not None:
                prev = 0
                for i, (k1, ctx1) in enumerate(ladder):
                    state, _ = jax.lax.scan(
                        seg_step, state,
                        (cf_map[prev:k1], amb_map[prev:k1]))
                    # climb to the next rung: zero-pad the cache depth
                    # (all reads mask by ``lengths`` — pad rows stay dead)
                    nxt = ladder[i + 1][1] if i + 1 < len(ladder) else lm_ctx
                    grow = ((0, 0), (0, 0), (0, nxt - ctx1), (0, 0), (0, 0))
                    state = state._replace(cache=LMCache(
                        k=jnp.pad(state.cache.k, grow),
                        v=jnp.pad(state.cache.v, grow),
                        lengths=state.cache.lengths))
                    prev = k1
                state, _ = jax.lax.scan(
                    seg_step, state, (cf_map[prev:], amb_map[prev:]))
            else:
                state, _ = jax.lax.scan(seg_step, state, (cf_map, amb_map))
            # blank-fast frames after the last kept frame
            state = state._replace(
                pb=_logaddexp(tailA + state.pb, tailB + state.pnb))
        else:
            def step(state, t):
                return full_step(state, t, t < end_step)

            FB = T if frame_budget is None else min(frame_budget, T)
            state, _ = jax.lax.scan(step, state, jnp.arange(FB))
        return state.prefixes[0], state.lengths[0], state.ovf

    def _strip(out):
        return out if return_overflow else out[:2]

    def _grouped(args):
        B = args[0].shape[0]
        G = min(group_size, B)
        if G <= 1:
            # ungrouped: lax.map keeps the fast/full cond a real branch
            return _strip(jax.lax.map(lambda a: decode_one(*a), args))
        if B % G != 0:
            raise ValueError(f"batch {B} not divisible by group {G}")
        grouped = jax.tree.map(
            lambda x: x.reshape((B // G, G) + x.shape[1:]), args)
        prefixes, lengths, ovf = jax.lax.map(
            lambda a: jax.vmap(decode_one)(*a), grouped)
        return _strip((prefixes.reshape(B, prefixes.shape[-1]),
                       lengths.reshape(B), ovf.reshape(B)))

    if skip_search:
        @jax.jit
        def run(cand_vals, cand_idx, logits, logz, blank_lp, n_above):
            return _grouped((cand_vals, cand_idx, logits, logz,
                             blank_lp, n_above))
    else:
        @jax.jit
        def run(cand_vals, cand_idx, logits, logz):
            return _grouped((cand_vals, cand_idx, logits, logz))

    return run


def count_kept_frames(cand_idx: jnp.ndarray, n_above: jnp.ndarray,
                      *, unknown_id: int, blank_id: int = 0,
                      suffix_frames: int = 4) -> np.ndarray:
    """Per-line count of frames the compacted skip-search must scan
    (char-emitting single-survivor frames + ambiguous frames inside the
    search window) — use to size ``kept_budget``. Host-side helper."""
    cand_idx = np.asarray(cand_idx)
    n_above = np.asarray(n_above)
    B, T = n_above.shape
    out = np.zeros((B,), np.int64)
    for b in range(B):
        arg = cand_idx[b, :, 0]
        prev = np.concatenate([[-1], arg[:-1]])
        keep = (arg != blank_id) & (arg != unknown_id) & (arg != prev)
        end = (int(np.max(np.where(keep, np.arange(T), -1))) + suffix_frames
               if keep.any() else 0)
        end = min(end, T)
        fast = n_above[b, :end] == 1
        sv = arg[:end]
        charfast = fast & (sv != blank_id) & (sv < unknown_id)
        out[b] = int((~fast).sum() + charfast.sum())
    return out


def count_segments(cand_idx: jnp.ndarray, n_above: jnp.ndarray,
                   *, unknown_id: int, blank_id: int = 0,
                   suffix_frames: int = 4, run_max: int = 8) -> np.ndarray:
    """Per-line count of segments the segment-compacted skip-search scans
    (mirrors the device scheduler: a segment = a run of <= ``run_max``
    char-fast frames closed by <= 1 ambiguous frame) — use to size
    ``seg_budget``. Host-side helper, vectorized (it runs per batch inside
    ``decode.adaptive``): each maximal block of n consecutive char-fast
    kept frames closed by an ambiguous frame costs max(ceil(n/run_max), 1)
    segments; a trailing unclosed block costs ceil(n/run_max)."""
    cand_idx = np.asarray(cand_idx)
    n_above = np.asarray(n_above)
    B, T = n_above.shape
    out = np.zeros((B,), np.int64)
    for b in range(B):
        arg = cand_idx[b, :, 0]
        prev = np.concatenate([[-1], arg[:-1]])
        keep = (arg != blank_id) & (arg != unknown_id) & (arg != prev)
        end = (int(np.max(np.where(keep, np.arange(T), -1))) + suffix_frames
               if keep.any() else 0)
        end = min(end, T)
        fast = n_above[b, :end] == 1
        sv = arg[:end]
        charfast = fast & (sv != blank_id) & (sv < unknown_id)
        kept_cf = charfast[~fast | charfast]     # cf mask in kept order
        amb_pos = np.nonzero(~kept_cf)[0]
        block = np.diff(np.concatenate([[-1], amb_pos])) - 1  # cf before amb
        segs = int(np.maximum(np.ceil(block / run_max), 1).sum())
        tail = kept_cf.size - (amb_pos[-1] + 1 if amb_pos.size else 0)
        out[b] = segs + int(np.ceil(tail / run_max))
    return out


def count_ladder_segments(cand_idx: jnp.ndarray, n_above: jnp.ndarray,
                          *, ctx1: int, unknown_id: int, blank_id: int = 0,
                          suffix_frames: int = 4, run_max: int = 8) -> int:
    """Sound ``ctx_ladder`` first-rung length: the largest segment count k
    such that NO beam of ANY line can have committed more than ``ctx1``
    LM tokens (incl. sos) after the first k segments. A beam commits at
    most one token per kept frame, so 1 + (kept frames consumed by the
    first k segments) bounds every beam path — the ladder is then exact,
    not just likely-exact. Host-side helper; mirrors the device
    scheduler's run/segment packing (``sched`` in ``decode_one``).
    Returns 0 when even one segment could overflow ``ctx1``."""
    cand_idx = np.asarray(cand_idx)
    n_above = np.asarray(n_above)
    B, T = n_above.shape
    k_min = None
    for b in range(B):
        arg = cand_idx[b, :, 0]
        prev = np.concatenate([[-1], arg[:-1]])
        keep = (arg != blank_id) & (arg != unknown_id) & (arg != prev)
        end = (int(np.max(np.where(keep, np.arange(T), -1))) + suffix_frames
               if keep.any() else 0)
        end = min(end, T)
        fast = n_above[b, :end] == 1
        sv = arg[:end]
        charfast = fast & (sv != blank_id) & (sv < unknown_id)
        kept_cf = charfast[~fast | charfast]     # cf mask in kept order
        seg_kept, cur, pos = [], 0, 0
        for cf in kept_cf:
            if cf:
                if pos >= run_max:               # run full: new segment
                    seg_kept.append(cur)
                    cur = pos = 0
                cur += 1
                pos += 1
            else:                                # ambiguous closes it
                seg_kept.append(cur + 1)
                cur = pos = 0
        if cur:
            seg_kept.append(cur)
        toks = 1 + np.cumsum(seg_kept) if seg_kept else np.array([1])
        if toks[-1] <= ctx1:
            continue        # whole line fits in ctx1: no constraint
        k_b = int(np.searchsorted(toks, ctx1, side="right"))
        k_min = k_b if k_min is None else min(k_min, k_b)
    return (1 << 30) if k_min is None else int(k_min)


def count_peek_rows(n_above: jnp.ndarray, *, depth: int = 10,
                    lm_depth: int | None = None,
                    use_lm_pred: bool = True) -> int:
    """Safe ``peek_rows`` budget: per beam per frame, consumable peek rows
    are at most the visual classes above the prune threshold (skip mode
    maps the rest to unknown, `ctc_codec.py:144`) — capped at ``depth`` —
    plus the ``lm_depth`` LM proposals. Blanks and unmapped proposals only
    shrink the true count, so this bound can never truncate. Host-side,
    sized from the batch's ``n_above`` (``ops.topk_logsoftmax``); compute
    per batch and grow-only, like ``count_segments``."""
    m = (lm_depth if lm_depth is not None else depth) if use_lm_pred else 0
    return int(min(int(np.max(np.asarray(n_above))), depth) + m)


def make_count_ladder(*, unknown_id: int, blank_id: int = 0,
                      suffix_frames: int = 4, run_max: int = 8):
    """Jitted device twin of ``count_ladder_segments`` (one scalar out).

    The sound first-rung length is the 0-based segment id that the
    ``ctx1``-th kept frame of the densest line lands in (tokens after k
    segments <= 1 + kept frames consumed, and the ctx1-th kept frame is
    the first that could push a beam past ctx1 slots). Runs the same
    run/segment packing as the decode scheduler over every line at once;
    ``ctx1`` is a traced scalar, so one compile serves every rung.
    Equivalence with the host helper is locked by
    ``tests/test_adaptive_lm.py``."""
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def ladder(cand_idx, n_above, ctx1):
        arg = cand_idx[:, :, 0]                            # (B, T)
        B, T = arg.shape
        prev = jnp.concatenate(
            [jnp.full((B, 1), -1, arg.dtype), arg[:, :-1]], axis=1)
        keep = (arg != blank_id) & (arg != unknown_id) & (arg != prev)
        last = jnp.max(jnp.where(keep, jnp.arange(T)[None, :], -1), axis=1)
        end = jnp.where(last >= 0,
                        jnp.minimum(last + suffix_frames, T), 0)
        in_range = jnp.arange(T)[None, :] < end[:, None]
        fast = (n_above == 1) & in_range
        amb = (n_above != 1) & in_range
        cf = fast & (arg != blank_id) & (arg < unknown_id)

        big = jnp.int32(1 << 30)

        def sched(carry, xs):
            seg, pos, n, k_b = carry
            is_cf, is_amb = xs
            overflow = is_cf & (pos >= run_max)
            w_seg = jnp.where(overflow, seg + 1, seg)
            w_pos = jnp.where(overflow, 0, pos)
            kept = is_cf | is_amb
            n2 = n + kept.astype(jnp.int32)
            k_b = jnp.where(kept & (n2 == ctx1) & (k_b == big),
                            w_seg, k_b)
            seg = jnp.where(is_amb, w_seg + 1, w_seg)
            pos = jnp.where(is_amb, 0,
                            jnp.where(is_cf, w_pos + 1, pos))
            return (seg, pos, n2, k_b), ()

        init = (jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
                jnp.zeros((B,), jnp.int32), jnp.full((B,), big, jnp.int32))
        (_, _, _, k_b), _ = jax.lax.scan(
            sched, init, (cf.T, (amb & ~cf).T))
        return jnp.min(k_b)

    return ladder


def make_count_stats(*, unknown_id: int, blank_id: int = 0,
                     suffix_frames: int = 4, run_max: int = 8):
    """Jitted device-side batch maxima for ``decode.adaptive``'s knob
    sizing: (greedy chars, end step, segments, classes above prune).

    Sizing from the host helpers ships the whole ``(B, T, K)`` candidate
    tensor over the tunnel every batch (~1.5 MB, ~12 ms at b32/w1200);
    this computes the same maxima on device and fetches four scalars.
    Mirrors ``count_segments`` / ``count_peek_rows`` / the greedy-count
    logic exactly (equivalence tested in tests/test_adaptive_lm.py)."""
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def stats(cand_idx, n_above):
        arg = cand_idx[:, :, 0]                            # (B, T)
        B, T = arg.shape
        if n_above is None:      # full search: no prune counts; every frame
            n_above = jnp.ones((B, T), jnp.int32)  # "fast" (segs unused)
        prev = jnp.concatenate(
            [jnp.full((B, 1), -1, arg.dtype), arg[:, :-1]], axis=1)
        keep = (arg != blank_id) & (arg != unknown_id) & (arg != prev)
        n_chars = keep.sum(axis=1)
        last = jnp.max(jnp.where(keep, jnp.arange(T)[None, :], -1), axis=1)
        end = jnp.where(last >= 0,
                        jnp.minimum(last + suffix_frames, T), 0)
        in_range = jnp.arange(T)[None, :] < end[:, None]
        fast = (n_above == 1) & in_range
        amb = (n_above != 1) & in_range                    # ambiguous kept
        charfast = fast & (arg != blank_id) & (arg < unknown_id)
        # Segment count (device twin of ``count_segments``): char-fast
        # frames belong to the block indexed by the number of ambiguous
        # frames before them; each amb-closed block costs
        # max(ceil(n/run_max), 1), the trailing open block ceil(n/run_max).
        seg_id = jnp.cumsum(amb.astype(jnp.int32), axis=1) - amb
        # bins 0..T hold char-fast counts per block (the trailing block's
        # id can reach T when every in-range frame is ambiguous); T+1 is
        # the discard bin for non-char-fast frames
        cnt = jnp.zeros((B, T + 2), jnp.int32).at[
            jnp.arange(B)[:, None],
            jnp.where(charfast, seg_id, T + 1)].add(1, mode="drop")
        n_amb = jnp.sum(amb, axis=1)
        closed = jnp.arange(T)[None, :] < n_amb[:, None]
        cf_cnt = cnt[:, :T]
        cost = jnp.where(
            closed, jnp.maximum(-(-cf_cnt // run_max), 1), 0)
        trail = jnp.take_along_axis(cnt, n_amb[:, None], axis=1)[:, 0]
        segs = cost.sum(axis=1) + -(-trail // run_max)
        return (jnp.max(n_chars), jnp.max(end), jnp.max(segs),
                jnp.max(n_above))

    return stats


def make_count_sizing(*, unknown_id: int, blank_id: int = 0,
                      suffix_frames: int = 4, run_max: int = 8):
    """One-dispatch knob sizing: ``make_count_stats`` maxima plus the
    ``make_count_ladder`` bound, stacked into a single ``(5,)`` array.

    The adaptive driver fetches host scalars per batch; on the tunneled
    TPU each fetch is a ~26 ms round trip, so sizing via two separate
    programs (stats + ladder) pays twice. Composing the two jitted fns
    inside one jit lets XLA CSE their shared keep/end/segment analysis
    and ships one transfer. Equivalence with the parts is locked by
    ``tests/test_adaptive_lm.py::test_count_sizing_matches_parts``."""
    import functools

    stats = make_count_stats(unknown_id=unknown_id, blank_id=blank_id,
                             suffix_frames=suffix_frames, run_max=run_max)
    ladder = make_count_ladder(unknown_id=unknown_id, blank_id=blank_id,
                               suffix_frames=suffix_frames, run_max=run_max)

    @functools.partial(jax.jit, static_argnames=())
    def sizing(cand_idx, n_above, ctx1):
        chars_max, end_max, seg_max, na_max = stats(cand_idx, n_above)
        k_bound = ladder(cand_idx, n_above, ctx1)
        return jnp.stack([chars_max, end_max, seg_max, na_max,
                          k_bound.astype(chars_max.dtype)])

    return sizing
