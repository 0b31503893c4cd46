"""Data-calibrated driver for the device LM-fused beam search.

``make_lm_beam_search`` is a static XLA program: LM context length, segment
budget, and group size are compile-time constants. Picking them is a
product-surface problem — the tuned configuration (group 8, ctx >= 144,
segment budget sized from the data) is what makes the skip search fast
(NOTES.md round-2 progression, 1.4 -> 10.55 lines/sec), but hardcoding any
one value either truncates long lines or wastes compile-size on short ones.

``AdaptiveLMBeam`` closes the loop on the host:

* **LM context** auto-sizes from each batch's greedy character count,
  rounded up to a platform-stable shape (ctx 128 and group 16 hit an XLA
  codegen fault on v5e — `tools/repro_ctx128_crash.py`), and **escalates**
  when the device reports a KV-cache overflow (`beam_lm_device` overflow
  flag) — committed tokens can exceed the greedy estimate, and silently
  dropping LM context is never acceptable. Explicitly pinned contexts
  raise instead of escalating.
* **Segment budget** auto-sizes from ``count_segments`` per batch and only
  grows (rounded to multiples of 4 to bound recompiles). An explicitly
  pinned budget that a batch exceeds raises instead of truncating.
* **Group size** drops to the largest divisor of the batch that avoids the
  known-faulty shape (16).
* **Peek rows** (skip mode) auto-size from ``count_peek_rows`` per batch,
  grow-only: the ambiguous-frame LM peek runs on the provable useful-row
  bound instead of all ``depth + lm_depth`` candidates (exact; 14.65 ->
  17.5 lines/sec at the production config, NOTES.md round 3).
* **KV-context ladder** defaults ON with a 96-deep first rung
  (``ctx_ladder=112``; 0 disables): the early segments — where beams have
  committed few tokens — scan on a shallow KV cache before climbing to the
  full context. The rung length is sized per batch from a sound bound
  (``count_ladder_segments``), so it is exact; measured 17.3 -> 18.4
  lines/sec at the production config (A/B matrix, NOTES.md round 3).

One compiled program exists per (T, B, ctx, budget) tuple; the JAX
persistent compilation cache makes rebuilds cheap across processes.

Mirrors the role of the reference's per-call beam-search knobs
(`ctc_codec.py:101-122`, `test.py:130-141`) with TPU-static shapes.
"""

from __future__ import annotations

import math

import jax
import numpy as np

# ctx shapes validated stable on v5e (128 faults; see NOTES.md round 2).
STABLE_CTX = (144, 160, 192, 256, 320, 384, 448, 512)
# margin between the greedy char count and the LM context: beams commit at
# most a handful more chars than greedy on peaky posteriors, plus <s>.
CTX_MARGIN = 24
FAULTY_GROUPS = {16}


def pick_group_size(batch: int, requested: int) -> int:
    """Largest divisor of ``batch`` that is <= ``requested`` and not a
    known-faulty shape."""
    g = max(1, min(requested, batch))
    while g > 1 and (batch % g != 0 or g in FAULTY_GROUPS):
        g -= 1
    return g


class AdaptiveLMBeam:
    """Decode batches through the device LM-fused search with
    auto-calibrated static knobs and overflow escalation.

    ``lm_ctx=0`` / ``seg_budget=0`` mean auto (the product default);
    explicit values are honored exactly and errors are raised instead of
    silent truncation. ``skip_search=False`` disables the segment
    machinery (full search; budgets unused, group fixed at the batch)."""

    def __init__(self, clm, codec2lm, lm2codec, *, beam_size: int = 10,
                 depth: int = 10, unknown_id: int, lm_panelty: float,
                 len_bonus: float, use_lm_pred: bool = True,
                 skip_search: bool = True, group_size: int = 8,
                 lm_ctx: int = 0, seg_budget: int = 0, run_max: int = 8,
                 ctx_ladder: int = 112, fused_commit: bool = False,
                 dense_merge=None, mesh=None, verbose: bool = False,
                 prune: float = math.log(0.001)):
        self._clm = clm
        self._c2l = codec2lm
        self._l2c = lm2codec
        # prune: the skip-search ambiguity threshold (`ctc_codec.py:128`,
        # log(0.001) = reference-exact). A CALIBRATED tighter value (e.g.
        # log(0.01)) turns soft frames back into fast frames on less-peaky
        # posteriors — the serving knob for VERDICT r4's 148-segment
        # explosion; callers must compute n_above at the SAME threshold
        # (`topk_logsoftmax(prune=...)`).
        self._kw = dict(beam_size=beam_size, depth=depth,
                        unknown_id=unknown_id, lm_panelty=lm_panelty,
                        len_bonus=len_bonus, use_lm_pred=use_lm_pred,
                        run_max=run_max, prune=float(prune),
                        return_overflow=True)
        self.unknown_id = unknown_id
        self.skip = bool(skip_search)
        self.group_size = group_size
        self.run_max = run_max
        self._ctx_pinned = int(lm_ctx) > 0
        self._budget_pinned = int(seg_budget) > 0
        self._ctx = int(lm_ctx) if self._ctx_pinned else 0
        self._budget = int(seg_budget) if self._budget_pinned else 0
        self._max_ctx = int(clm.model.max_len)
        if self._ctx_pinned and self._ctx > self._max_ctx:
            raise ValueError(
                f"lm_ctx={self._ctx} exceeds the LM's trained max_len "
                f"{self._max_ctx} — positions past it would silently reuse "
                f"the last positional embedding; lower --lm-ctx or use 0 "
                f"(auto)")
        self._fb = 0        # full search: static frame budget (grow-only)
        self._peek = 0      # skip search: peek-row budget (grow-only)
        # KV-context ladder: first-rung depth (0 = off); the rung length
        # (segments) derives from a RUNNING MIN of the per-batch sound
        # bounds (each batch's bound is sound for it, so the min is sound
        # for all seen batches) — monotone like the other knobs, bounding
        # recompiles to a shrinking chain
        if int(ctx_ladder) < 0:
            raise ValueError(f"ctx_ladder={ctx_ladder} must be >= 0 "
                             f"(0 = off; otherwise the first-rung depth)")
        self._ladder_ctx = int(ctx_ladder)
        self._ladder_bound = 1 << 30
        self._ladder_k = 0
        self._fused = bool(fused_commit) and self.skip
        # dense per-step merge: +1.5% at production shape but a
        # regrouping variant (one near-tie line flips on the synthetic
        # A/B posteriors) — opt-in, never the default, like the Pallas
        # kernel variants. None = read HCTR_LM_DENSE_MERGE.
        if dense_merge is None:
            import os
            dense_merge = os.environ.get("HCTR_LM_DENSE_MERGE", "") == "1"
        self._dense = bool(dense_merge)
        self._fns = {}
        self._stats = None  # lazy jitted device-side knob-sizing maxima
        self._sizing = None  # lazy jitted fused stats+ladder (one fetch)
        # data-parallel decode: lines are independent, so with a mesh the
        # batch shards over its ``data`` axis (parallel.mesh.shard_batched_fn)
        self._mesh = mesh
        self._ndata = int(mesh.shape["data"]) if mesh is not None else 1
        self._verbose = verbose

    # ------------------------------------------------------------ sizing
    def _auto_ctx(self, chars_max: int) -> int:
        need = chars_max + CTX_MARGIN
        for c in STABLE_CTX:
            if c >= need and c <= self._max_ctx:
                return max(c, self._ctx)
        # margin is best-effort: a line that fits max_len (chars + <s> +
        # slack) must not be rejected just because chars + CTX_MARGIN
        # overshoots it — overflow escalation still guards the tail case
        if chars_max + 2 <= self._max_ctx:
            return max(self._max_ctx, self._ctx)
        raise ValueError(
            f"line has ~{chars_max} greedy chars; LM max_len "
            f"{self._max_ctx} cannot hold it — train/export the LM with a "
            f"longer context")

    def _escalated_ctx(self) -> int:
        for c in STABLE_CTX:
            if c > self._ctx and c <= self._max_ctx:
                return c
        if self._max_ctx > self._ctx:   # past the last stable entry
            return self._max_ctx
        raise RuntimeError(
            f"LM KV cache overflowed even at ctx={self._ctx} (LM max_len "
            f"{self._max_ctx}) — the decoded line exceeds the LM's trained "
            f"context")

    def _fn(self, T: int, B: int):
        key = (T, B, self._ctx, self._budget, self._fb, self._peek,
               self._ladder_k)
        fn = self._fns.get(key)
        if fn is None:
            from .beam_lm_device import make_lm_beam_search
            if B % self._ndata != 0:
                raise ValueError(
                    f"batch {B} not divisible by the mesh data axis "
                    f"({self._ndata}) — pad the batch or drop the mesh")
            # groups form within each device's local shard
            group = pick_group_size(B // self._ndata, self.group_size)
            if self.skip:
                fn = make_lm_beam_search(
                    self._clm, self._c2l, self._l2c, skip_search=True,
                    lm_ctx=self._ctx, seg_budget=self._budget,
                    group_size=group, peek_rows=self._peek or None,
                    ctx_ladder=((self._ladder_k, self._ladder_ctx)
                                if self._ladder_k else None),
                    fused_commit=self._fused, dense_merge=self._dense,
                    **self._kw)
            else:
                fn = make_lm_beam_search(
                    self._clm, self._c2l, self._l2c, skip_search=False,
                    lm_ctx=self._ctx, group_size=group,
                    frame_budget=self._fb or None,
                    dense_merge=self._dense, **self._kw)
            if self._mesh is not None:
                from ..parallel.mesh import shard_batched_fn
                fn = shard_batched_fn(fn, self._mesh)
            self._fns[key] = fn
            if self._verbose:
                print(f"[lm-beam] compiled T={T} B={B} ctx={self._ctx} "
                      f"group={group}"
                      + (f" seg_budget={self._budget} "
                         f"peek_rows={self._peek}" if self.skip
                         else f" (full search, frame budget {self._fb})")
                      + (f" ladder=({self._ladder_k}, {self._ladder_ctx})"
                         if self.skip and self._ladder_k else "")
                      + (f" data-sharded x{self._ndata}"
                         if self._mesh is not None else ""))
        return fn

    # ------------------------------------------------------------ decode
    def decode(self, cand_vals, cand_idx, logits, logz,
               blank_lp=None, n_above=None):
        """Device arrays in, (prefixes, lengths) out (host-checked)."""
        return self.decode_async(cand_vals, cand_idx, logits, logz,
                                 blank_lp, n_above).result()

    def decode_async(self, cand_vals, cand_idx, logits, logz,
                     blank_lp=None, n_above=None):
        """Size the knobs and dispatch the decode; returns a
        ``PendingDecode`` whose ``result()`` performs the overflow check
        (escalating/re-decoding if needed) and yields
        ``(prefixes, lengths)``. Callers can overlap host work for the
        previous batch (D2H, string conversion, CER) with this batch's
        device time by delaying ``result()`` — the same pipelining the
        greedy path uses (`bench.py`)."""
        B, T = cand_vals.shape[:2]
        # Knob sizing reads device-side scalars (make_count_stats /
        # make_count_sizing) instead of fetching the (B, T, K) candidate
        # tensor to the host (~1.5 MB / ~12 ms per batch at b32/w1200
        # over the tunnel); with the ladder on, stats + ladder bound fuse
        # into ONE program and ONE fetch (each fetch is a ~26 ms round
        # trip on the tunnel).
        ladder_raw = None
        if self.skip and self._ladder_ctx:
            if self._sizing is None:
                from .beam_lm_device import make_count_sizing
                self._sizing = make_count_sizing(
                    unknown_id=self.unknown_id, run_max=self.run_max)
            chars_max, end_max, seg_max, na_max, ladder_raw = (
                int(x) for x in jax.device_get(self._sizing(
                    cand_idx, n_above, self._ladder_ctx)))
        else:
            if self._stats is None:
                from .beam_lm_device import make_count_stats
                self._stats = make_count_stats(
                    unknown_id=self.unknown_id, run_max=self.run_max)
            chars_max, end_max, seg_max, na_max = (
                int(x) for x in jax.device_get(
                    self._stats(cand_idx, n_above)))

        if not self._ctx_pinned:
            self._ctx = self._auto_ctx(chars_max)
        elif chars_max + 2 > self._ctx:
            raise RuntimeError(
                f"lm_ctx={self._ctx} cannot hold a ~{chars_max}-char line; "
                f"raise --lm-ctx or use 0 (auto)")

        if self.skip:
            from .beam_lm_device import count_peek_rows
            # peek-row compaction budget: exact upper bound from the
            # batch's above-prune class counts (rounded to 4, grow-only)
            pr = count_peek_rows(
                np.asarray([na_max]), depth=self._kw["depth"],
                use_lm_pred=self._kw["use_lm_pred"])
            if pr > self._peek:
                self._peek = -(-pr // 4) * 4
            if self._budget_pinned:
                if seg_max > self._budget:
                    raise RuntimeError(
                        f"segment budget {self._budget} < data maximum "
                        f"{seg_max}; raise --seg-budget or use 0 (auto)")
            elif seg_max > self._budget:
                # data max + 1, rounded to 4: round-2 profiling showed the
                # scan length is a first-order cost (seg 52 vs 56 = +7%)
                self._budget = -(-max(seg_max + 1, 16) // 4) * 4
            if self._ladder_ctx and self._ladder_ctx < self._ctx:
                # running-min sound bound (fetched with the stats, one
                # transfer), quantized DOWN to multiples of 8 (shorter
                # rungs remain sound) and clamped inside the program's
                # own segment count min(budget, T) so the ladder can't be
                # silently dropped by decode_one; rungs under 8 segments
                # are not worth the extra program
                self._ladder_bound = min(self._ladder_bound, ladder_raw)
                k = min(self._ladder_bound // 8 * 8,
                        min(self._budget, int(T)) - 1)
                self._ladder_k = k if k >= 8 else 0
            else:
                self._ladder_k = 0
        else:
            # full search scans frames; truncating at the batch max
            # end_step is exact (frames past it are inactive no-ops)
            if end_max > self._fb:
                self._fb = min(-(-max(end_max, 32) // 32) * 32, int(T))

        return PendingDecode(
            self, (cand_vals, cand_idx, logits, logz, blank_lp, n_above),
            int(T), int(B))


class PendingDecode:
    """A dispatched LM-beam decode whose overflow check is deferred.

    The decode program is already running on device when this object is
    returned; ``result()`` materializes the overflow flag (the only host
    sync), escalating the LM context and re-decoding if it fired, and
    returns ``(prefixes, lengths)`` device arrays."""

    def __init__(self, beam: "AdaptiveLMBeam", args, T: int, B: int):
        self._beam = beam
        self._args = args
        self._T, self._B = T, B
        self._outs = self._dispatch()

    def _dispatch(self):
        b = self._beam
        self._ctx_at_dispatch = b._ctx
        fn = b._fn(self._T, self._B)
        cand_vals, cand_idx, logits, logz, blank_lp, n_above = self._args
        if b.skip:
            return fn(cand_vals, cand_idx, logits, logz, blank_lp, n_above)
        return fn(cand_vals, cand_idx, logits, logz)

    def result(self):
        b = self._beam
        while True:
            prefixes, lengths, ovf = self._outs
            if not bool(np.asarray(ovf).any()):
                self._args = None  # release the batch tensors
                return prefixes, lengths
            if b._ctx_pinned:
                raise RuntimeError(
                    f"LM KV cache overflowed at pinned lm_ctx={b._ctx}; "
                    f"raise --lm-ctx or use 0 (auto)")
            # another in-flight batch may have escalated the shared ctx
            # since this dispatch — retry at the current ctx before
            # escalating past it
            if b._ctx <= self._ctx_at_dispatch:
                b._ctx = b._escalated_ctx()
            if b._verbose:
                print(f"[lm-beam] KV overflow -> escalating ctx to "
                      f"{b._ctx} and re-decoding batch")
            self._outs = self._dispatch()
