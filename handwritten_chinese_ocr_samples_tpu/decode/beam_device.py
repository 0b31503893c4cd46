"""Batched CTC prefix beam search on device (jit + vmap + lax.scan).

The reference's beam search is a per-sample, per-timestep Python loop with
dict-keyed prefix merging (`ctc_codec.py:183-285`) — the dominant inference
bottleneck (SURVEY.md §3.3). This module reformulates it with fixed shapes so
the whole search runs inside one XLA program, vmapped over the batch:

  * beams are fixed-size arrays: prefixes ``(BM, L)``, lengths ``(BM,)``,
    blank/non-blank log-masses ``pb/pnb (BM,)``;
  * each step enumerates ``2*BM*K`` candidate rows (extend / stay), keyed by
    a rolling 64-bit prefix hash (split into two int32 lanes for TPU), and
    merges equal prefixes with a sort + segmented logaddexp — the vectorized
    equivalent of the reference's dict bucketing (`ctc_codec.py:233-265`);
  * search runs to ``last greedy char + 4`` frames, like the reference
    (`ctc_codec.py:198-199`), via per-step masking inside ``lax.scan``;
  * scoring: ``total = logaddexp(pb, pnb) + len*len_bonus`` (+ an optional
    on-device LM hook) — the ``use_lm_score=False`` configuration of the
    host decoder, against which equivalence is tested
    (`tests/test_beam_device.py`).

The LM-fused variant (KV-cached incremental transformer scoring per
extension) plugs into ``score_fn``; without it the entire decode is a single
TPU executable with only the final prefixes crossing to the host.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.float32(-1e30)  # avoids -inf - -inf = nan in masked math

# Rolling-hash multipliers (two independent 32-bit lanes ~ one 64-bit key).
_H1_MUL = np.int32(1000003)
_H2_MUL = np.int32(998244353 % 2147483647)
_H1_SEED = np.int32(17)
_H2_SEED = np.int32(29)


class BeamState(NamedTuple):
    prefixes: jnp.ndarray  # (BM, L) int32
    lengths: jnp.ndarray   # (BM,) int32
    pb: jnp.ndarray        # (BM,) f32
    pnb: jnp.ndarray       # (BM,) f32
    h1: jnp.ndarray        # (BM,) int32 rolling hash lane 1
    h2: jnp.ndarray        # (BM,) int32 rolling hash lane 2


def _hash_extend(h1, h2, c):
    c = c.astype(jnp.int32)
    return (h1 * _H1_MUL + c + jnp.int32(1),
            h2 * _H2_MUL + c * jnp.int32(2654435761 % 2147483647) + jnp.int32(7))


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    out = mx + jnp.log1p(jnp.exp(mn - mx))
    return jnp.where(mx <= NEG_INF * 0.5, NEG_INF, out)


def _segment_logaddexp_sorted(vals, seg_starts):
    """Segmented logaddexp over key-sorted rows.

    ``seg_starts`` marks the first row of each segment. Returns, per row,
    the logaddexp of the rows from that row to the end of its segment — so
    segment-START rows carry the full segment reduction (the only rows the
    callers consume). Implemented as one reverse segmented
    ``associative_scan`` (logaddexp is associative), which is far cheaper on
    TPU than scatter-based ``segment_max``/``segment_sum``.
    """
    seg_end = jnp.concatenate([seg_starts[1:], jnp.array([True])])
    f = seg_end[::-1]   # reversed: segment boundaries become scan resets
    v = vals[::-1]

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return (fa | fb, jnp.where(fb, vb, _logaddexp(va, vb)))

    _, vv = jax.lax.associative_scan(comb, (f, v))
    return vv[::-1]


@partial(jax.jit, static_argnames=("beam_size", "unknown_id", "blank_id",
                                   "dense_merge"))
def beam_search_from_topk(
    cand_vals: jnp.ndarray,       # (B, T, K) top-K log-probs, descending
    cand_idx: jnp.ndarray,        # (B, T, K) class indices
    *,
    beam_size: int = 10,
    unknown_id: int,
    blank_id: int = 0,
    len_bonus: float = 0.0,
    suffix_frames: int = 4,
    dense_merge: bool = False,
):
    """Batched prefix beam search over precomputed per-frame top-K
    candidates (the only posterior information the search consumes; pair
    with ``ops.topk_logsoftmax`` to avoid materializing the full (B, T, D)
    log-prob tensor). Returns (prefixes (B, T) int32, lengths (B,)).

    ``dense_merge=True`` swaps the per-frame multi-operand sort for an
    O(rows^2) hash-equality merge (same groups, same representative row;
    group logaddexp via max+exp-sum — decode-equal, low-order float bits
    may differ). The sort runs once per FRAME here, so it is a large
    share of the decode; rows^2 = (BM*(K+1))^2 ~ 12k VPU lanes."""
    B, T, K = cand_vals.shape
    L = T  # worst-case prefix length

    def decode_one(vals, idxs):  # (T, K) each
        # ---- greedy top line end step (`ctc_codec.py:188-199`)
        arg = idxs[:, 0]                                        # (T,)
        prev = jnp.concatenate([jnp.array([-1], jnp.int32), arg[:-1]])
        keep = (arg != blank_id) & (arg != unknown_id) & (arg != prev)
        any_keep = jnp.any(keep)
        last_keep = jnp.max(jnp.where(keep, jnp.arange(T), -1))
        end_step = jnp.where(any_keep,
                             jnp.minimum(last_keep + suffix_frames, T), 0)

        BM = beam_size
        state = BeamState(
            prefixes=jnp.zeros((BM, L), jnp.int32),
            lengths=jnp.zeros((BM,), jnp.int32),
            pb=jnp.full((BM,), NEG_INF).at[0].set(0.0),
            pnb=jnp.full((BM,), NEG_INF),
            h1=jnp.full((BM,), _H1_SEED),
            h2=jnp.full((BM,), _H2_SEED),
        )

        def step(state, t):
            active = t < end_step
            cand_p = vals[t]                                    # (K,)
            cand = idxs[t].astype(jnp.int32)                    # (K,)

            prob = _logaddexp(state.pb, state.pnb)              # (BM,)
            tail = jnp.where(
                state.lengths > 0,
                state.prefixes[jnp.arange(BM),
                               jnp.maximum(state.lengths - 1, 0)],
                jnp.int32(-1))                                  # (BM,)

            # ---- enumerate rows: 2 per (beam, cand)
            bi = jnp.repeat(jnp.arange(BM), K)                  # (BM*K,)
            cj = jnp.tile(cand, BM)                             # (BM*K,)
            pj = jnp.tile(cand_p, BM)                           # (BM*K,)

            is_blank = cj == blank_id
            is_unk = cj >= unknown_id
            is_rep = cj == tail[bi]
            beam_dead = prob[bi] <= NEG_INF * 0.5

            # Row A: the "extend" row (prefix + c), or for blank the "stay"
            # row contribution to pb.
            a_ext = (~is_blank) & (~is_unk) & (~beam_dead)
            a_pb = jnp.where(is_blank & ~beam_dead & ~is_unk,
                             prob[bi] + pj, NEG_INF)
            a_pnb = jnp.where(
                a_ext,
                jnp.where(is_rep, state.pb[bi] + pj, prob[bi] + pj),
                NEG_INF)
            a_is_ext = a_ext
            # Row B: repeat-merge contribution to the unchanged prefix's pnb
            # (`ctc_codec.py:263-265`). At most one candidate per beam can
            # equal its tail (top-K candidates are distinct), so this is one
            # row PER BEAM rather than per (beam, candidate) — the sort width
            # shrinks from 2*BM*K to BM*(K+1).
            rep_mask = (is_rep & ~is_blank & ~is_unk).reshape(BM, K)
            rep_p = jnp.sum(jnp.where(rep_mask, pj.reshape(BM, K), 0.0),
                            axis=1)
            has_rep = jnp.any(rep_mask, axis=1)
            b_pnb = jnp.where(
                has_rep & (prob > NEG_INF * 0.5),
                state.pnb + rep_p, NEG_INF)                     # (BM,)

            n_rows = BM * K + BM
            row_parent = jnp.concatenate([bi, jnp.arange(BM)])
            row_char = jnp.concatenate([cj, tail])
            row_is_ext = jnp.concatenate(
                [a_is_ext, jnp.zeros((BM,), bool)])
            row_pb = jnp.concatenate([a_pb, jnp.full((BM,), NEG_INF)])
            row_pnb = jnp.concatenate([a_pnb, b_pnb])

            # ---- keys
            ph1, ph2 = state.h1[row_parent], state.h2[row_parent]
            eh1, eh2 = _hash_extend(ph1, ph2, row_char)
            kh1 = jnp.where(row_is_ext, eh1, ph1)
            kh2 = jnp.where(row_is_ext, eh2, ph2)
            row_len = state.lengths[row_parent] + row_is_ext.astype(jnp.int32)
            row_dead = (row_pb <= NEG_INF * 0.5) & (row_pnb <= NEG_INF * 0.5)
            # dead rows get a unique sink key so they never merge
            kh1 = jnp.where(row_dead, jnp.int32(0x7FFFFFF0), kh1)
            kh2 = jnp.where(row_dead, jnp.arange(n_rows, dtype=jnp.int32),
                            kh2)

            if dense_merge:
                # O(rows^2) equality-matrix merge: no sorting network.
                # Representative = min-index row of each hash group (the
                # row the stable sort's segment start lands on).
                idx_r = jnp.arange(n_rows)
                eq = (kh1[:, None] == kh1[None, :]) & \
                     (kh2[:, None] == kh2[None, :])
                is_rep = ~jnp.any(
                    eq & (idx_r[None, :] < idx_r[:, None]), axis=1)

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
                total = _logaddexp(pb_m, pnb_m) + \
                    row_len.astype(jnp.float32) * len_bonus
                total = jnp.where(is_rep & ~row_dead, total, NEG_INF)
                par_s, chr_s, ext_s = row_parent, row_char, row_is_ext
            else:
                # ---- sort by (kh1, kh2) and merge equal keys: sort only
                # (keys, row index); payloads follow by gather (the fused
                # multi-operand sort moves every column through the
                # sorting network). Two int32 key lanes — int64 is
                # unavailable on TPU by default.
                kh1_s, kh2_s, order_s = jax.lax.sort(
                    (kh1, kh2, jnp.arange(n_rows, dtype=jnp.int32)),
                    num_keys=2)
                pb_s = row_pb[order_s]
                pnb_s = row_pnb[order_s]
                len_s = row_len[order_s]
                par_s = row_parent[order_s]
                chr_s = row_char[order_s]
                ext_s = row_is_ext[order_s]
                dead_s = row_dead[order_s]
                seg_start = jnp.concatenate(
                    [jnp.array([True]),
                     (kh1_s[1:] != kh1_s[:-1]) | (kh2_s[1:] != kh2_s[:-1])])
                # per-row values are suffix aggregates; only segment-start
                # rows (the ones consumed below) carry full segment totals
                pb_m = _segment_logaddexp_sorted(pb_s, seg_start)
                pnb_m = _segment_logaddexp_sorted(pnb_s, seg_start)

                # score only at segment starts; others suppressed
                total = _logaddexp(pb_m, pnb_m) + \
                    len_s.astype(jnp.float32) * len_bonus
                total = jnp.where(seg_start & ~dead_s, total, NEG_INF)

            # ---- select top BM segments
            top_tot, top_idx = jax.lax.top_k(total, BM)
            sel_parent = par_s[top_idx]
            sel_ext = ext_s[top_idx]
            sel_char = chr_s[top_idx]
            sel_alive = top_tot > NEG_INF * 0.5

            new_prefixes = state.prefixes[sel_parent]
            app_pos = jnp.minimum(state.lengths[sel_parent], L - 1)
            appended = new_prefixes.at[jnp.arange(BM), app_pos].set(
                jnp.where(sel_ext, sel_char,
                          new_prefixes[jnp.arange(BM), app_pos]))
            new_prefixes = jnp.where(sel_ext[:, None], appended, new_prefixes)
            new_lengths = state.lengths[sel_parent] + sel_ext.astype(jnp.int32)
            nh1, nh2 = _hash_extend(state.h1[sel_parent],
                                    state.h2[sel_parent], sel_char)
            new_h1 = jnp.where(sel_ext, nh1, state.h1[sel_parent])
            new_h2 = jnp.where(sel_ext, nh2, state.h2[sel_parent])
            new_pb = jnp.where(sel_alive, pb_m[top_idx], NEG_INF)
            new_pnb = jnp.where(sel_alive, pnb_m[top_idx], NEG_INF)

            new_state = BeamState(
                prefixes=jnp.where(active, new_prefixes, state.prefixes),
                lengths=jnp.where(active, new_lengths, state.lengths),
                pb=jnp.where(active, new_pb, state.pb),
                pnb=jnp.where(active, new_pnb, state.pnb),
                h1=jnp.where(active, new_h1, state.h1),
                h2=jnp.where(active, new_h2, state.h2),
            )
            return new_state, ()

        state, _ = jax.lax.scan(step, state, jnp.arange(T))
        # best beam = index 0 (top_k orders descending); when no step ran,
        # beam 0 is the empty prefix
        return state.prefixes[0], state.lengths[0]

    return jax.vmap(decode_one)(cand_vals, cand_idx)


@partial(jax.jit, static_argnames=("beam_size", "depth", "unknown_id",
                                   "blank_id", "dense_merge"))
def beam_search_device(
    logp: jnp.ndarray,            # (B, T, D) log-softmax
    *,
    beam_size: int = 10,
    depth: int = 10,
    unknown_id: int,
    blank_id: int = 0,
    len_bonus: float = 0.0,
    suffix_frames: int = 4,
    dense_merge: bool = False,
):
    """Full-posterior entry: XLA top-K then the fixed-shape search."""
    cand_vals, cand_idx = jax.lax.top_k(logp, depth)
    return beam_search_from_topk(
        cand_vals, cand_idx.astype(jnp.int32), beam_size=beam_size,
        unknown_id=unknown_id, blank_id=blank_id, len_bonus=len_bonus,
        suffix_frames=suffix_frames, dense_merge=dense_merge)


@partial(jax.jit, static_argnames=("beam_size", "depth", "unknown_id",
                                   "blank_id", "dense_merge"))
def beam_search_fused(
    logits: jnp.ndarray,          # (B, T, D) RAW logits
    *,
    beam_size: int = 10,
    depth: int = 10,
    unknown_id: int,
    blank_id: int = 0,
    len_bonus: float = 0.0,
    suffix_frames: int = 4,
    dense_merge: bool = False,
):
    """Production TPU entry: Pallas fused log-softmax+top-K feeds the
    search — the (B, T, D) log-prob tensor is never materialized. Pass
    ``dense_merge=dense_merge_default()`` to honor ``HCTR_DENSE_MERGE``
    (resolved OUTSIDE jit so the cache keys on the value)."""
    from ..ops.topk_logsoftmax import topk_logsoftmax
    cand_vals, cand_idx, _blank, _n = topk_logsoftmax(logits, k=depth)
    return beam_search_from_topk(
        cand_vals, cand_idx, beam_size=beam_size, unknown_id=unknown_id,
        blank_id=blank_id, len_bonus=len_bonus, suffix_frames=suffix_frames,
        dense_merge=dense_merge)


def dense_merge_default() -> bool:
    """Default for the per-frame dense merge: ON (2.5x the keys-only sort
    merge on v5e — 196.6 vs 78.5 lines/sec decode-only at b32/T=1200, and
    exact: pure data movement). ``HCTR_DENSE_MERGE=0`` opts back into the
    sort merge."""
    import os
    return os.environ.get("HCTR_DENSE_MERGE", "1") not in ("0", "")


def beam_texts(codec, logp, beam_size=10, depth=10, len_bonus=0.0):
    """Host convenience wrapper: device search -> strings."""
    prefixes, lengths = beam_search_device(
        jnp.asarray(logp), beam_size=beam_size, depth=depth,
        unknown_id=codec.unknown_id, blank_id=codec.blank_id,
        len_bonus=len_bonus)
    prefixes = np.asarray(prefixes)
    lengths = np.asarray(lengths)
    return ["".join(codec.characters[c]
                    for c in prefixes[b, : int(lengths[b])])
            for b in range(prefixes.shape[0])]
