"""Incremental (KV-cached) inference over ``CharTransformerLM`` weights.

The beam-search LM fusion needs, per CTC frame and per beam: the next-char
distribution given the beam's prefix, and the log-probability of a short
greedy suffix given that prefix (`ctc_codec.py:215-227,267-274`). Running the
full transformer over every prefix every frame is O(T * L) forwards; with a
KV cache it is O(1) single-token steps plus an O(suffix) *peek* that does not
commit to the cache.

This module re-implements the forward pass of ``CharTransformerLM`` directly
from its parameter tree (same weights, verified equivalent in
``tests/test_lm_cached.py``) because flax's built-in ``decode=True`` cache
keeps one scalar write index per module — but CTC beams have *per-element*
prefix lengths (a beam that extends steps its cache; a beam that stays does
not). Cache layout: per layer ``k/v (B, Lmax, H, Dh)`` plus a shared
``lengths (B,)``; all ops are batched and jittable, and the cache pytree can
be gathered along the batch axis for beam reordering.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


class LMCache(NamedTuple):
    k: jnp.ndarray        # (layers, B, Lmax, H, Dh)
    v: jnp.ndarray        # (layers, B, Lmax, H, Dh)
    lengths: jnp.ndarray  # (B,) number of tokens already consumed


class CachedLM:
    """Single-token step + suffix peek over a CharTransformerLM param tree.

    ``dtype`` overrides the compute/cache dtype (pass ``jnp.bfloat16`` for
    ~2x matmul throughput + half the KV-cache HBM on TPU; the
    precision-critical spots — LayerNorm statistics, attention score
    accumulation/softmax, final logits — always run in f32)."""

    def __init__(self, model, params, dtype=None, quant_int8: bool = False):
        self.model = model
        self.n_layers = model.n_layers
        self.n_heads = model.n_heads
        self.d_model = model.d_model
        self.d_head = model.d_model // model.n_heads
        self.dtype = dtype if dtype is not None else model.dtype
        # always materialize as jax arrays: checkpoints restore as host
        # numpy (utils.ckpt_io) and numpy arrays cannot be indexed by
        # tracers (`_embed_token`)
        params = jax.tree.map(
            lambda a: jnp.asarray(a, self.dtype)
            if a.dtype == jnp.float32 else jnp.asarray(a), params)
        self.p = params
        # int8 decode path (VERDICT r3 #2 — the recognizer convs got int8,
        # the decode-path LM did not): the weight-heavy matmuls (FF1/FF2
        # per layer + the tied-embedding logits projection, ~80% of the
        # LM's weight bytes) run s8 x s8 -> s32 on the MXU with symmetric
        # per-out-channel weight scales (static, from the checkpoint) and
        # a per-tensor dynamic activation scale (absmax of the live x —
        # no calibration pass needed; x is tiny at beam shapes so the
        # reduction is free). Same scheme as `serve/quant.py` convs.
        # Attention q*k / w*v and all LayerNorms stay bf16/f32 — the KV
        # cache and score softmax are precision-critical for decode ties.
        self.quant_int8 = bool(quant_int8)
        self._wq = {}
        if self.quant_int8:
            def _quantize(name, w, axes):
                """w -> (int8 weights, per-out-channel f32 scales);
                ``axes`` are the contraction axes of w."""
                w32 = jnp.asarray(w, jnp.float32)
                s = jnp.maximum(jnp.max(jnp.abs(w32), axis=axes,
                                        keepdims=True), 1e-8) / 127.0
                wq = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
                self._wq[name] = (wq, s.astype(jnp.float32))
            for li in range(self.n_layers):
                lp = params[f"layer{li}"]
                _quantize(f"ff1_{li}", lp["ff1"]["kernel"], (0,))
                _quantize(f"ff2_{li}", lp["ff2"]["kernel"], (0,))
            _quantize("logits", params["embed"]["embedding"], (1,))
        # fused QKV kernels: the decode peeks are dispatch-overhead-bound
        # at beam shapes (NOTES.md per-step profile), so the three
        # (d -> H, Dh) projections run as ONE einsum over a stacked
        # (d, 3, H, Dh) kernel (same contraction, one MXU dispatch)
        self._qkv = []
        for li in range(self.n_layers):
            a = params[f"layer{li}"]["attn"]
            self._qkv.append((
                jnp.stack([a["query"]["kernel"], a["key"]["kernel"],
                           a["value"]["kernel"]], axis=1),
                jnp.stack([a["query"]["bias"], a["key"]["bias"],
                           a["value"]["bias"]], axis=0)))

    # ------------------------------------------------------------ plumbing
    def init_cache(self, B: int, max_len: int) -> LMCache:
        shape = (self.n_layers, B, max_len, self.n_heads, self.d_head)
        return LMCache(
            k=jnp.zeros(shape, self.dtype),
            v=jnp.zeros(shape, self.dtype),
            lengths=jnp.zeros((B,), jnp.int32),
        )

    @staticmethod
    def gather(cache: LMCache, idx: jnp.ndarray) -> LMCache:
        """Reorder the batch axis (beam reshuffle).

        Lowered as a one-hot matmul rather than an indexed gather: the
        permutation then runs on the MXU as (B, B) x (B, L*H*Dh) per
        layer instead of XLA's scalar-indexed gather loop, which profiled
        ~20x slower at beam-search shapes (B=10, L=144-256). Exact: the
        one-hot matrix is 0/1 and bf16 holds small integers exactly.
        Set HCTR_GATHER_INDEXED=1 to fall back to the indexed lowering."""
        import os
        if os.environ.get("HCTR_GATHER_INDEXED"):
            return LMCache(k=cache.k[:, idx], v=cache.v[:, idx],
                           lengths=cache.lengths[idx])
        B = cache.k.shape[1]
        onehot = (idx[:, None] == jnp.arange(B)[None, :])
        sel = onehot.astype(cache.k.dtype)
        k = jnp.einsum("pb,lb...->lp...", sel, cache.k)
        v = jnp.einsum("pb,lb...->lp...", sel, cache.v)
        return LMCache(k=k, v=v, lengths=cache.lengths[idx])

    @staticmethod
    def gather_write(cache: LMCache, idx: jnp.ndarray, k_new: jnp.ndarray,
                     v_new: jnp.ndarray, wpos: jnp.ndarray) -> LMCache:
        """Fused beam reorder + one-token-per-row masked write.

        ``new.k[l, p, t] = k_new[l, p] if t == wpos[p] else
        cache.k[l, idx[p], t]`` (``wpos[p] >= L`` writes nothing; lengths
        are NOT updated — the caller owns them). The reorder lowers as a
        one-hot matmul with the write as a select fused into its
        epilogue: XLA's scatter lowering for per-row dynamic indices
        serializes and profiled several times slower at beam shapes.

        ``HCTR_GATHER_PALLAS=1`` opts into a pure data-movement Pallas
        kernel instead (``ops.cache_gather``: scalar-prefetched parent
        indices drive the block index_map). Measured FASTER in isolation
        (2.1 vs 3.0 ms/step at production shape) but SLOWER end-to-end
        inside the decode scan (15.5 vs 17.4 lines/sec) — the pallas
        boundary appears to cost a carry relayout per step. Kept opt-in
        pending a layout-level fix; see NOTES.md."""
        import os
        if (jax.default_backend() == "tpu"
                and os.environ.get("HCTR_GATHER_PALLAS")):
            from ..ops.cache_gather import gather_write_kv
            k, v = gather_write_kv(cache.k, cache.v, idx, k_new, v_new,
                                   wpos)
            return LMCache(k=k, v=v, lengths=cache.lengths[idx])
        return CachedLM.gather_write_xla(cache, idx, k_new, v_new, wpos)

    @staticmethod
    def gather_write_xla(cache: LMCache, idx: jnp.ndarray,
                         k_new: jnp.ndarray, v_new: jnp.ndarray,
                         wpos: jnp.ndarray) -> LMCache:
        """One-hot-matmul oracle for ``gather_write`` (same contract)."""
        B, L = cache.k.shape[1:3]
        sel = (idx[:, None] == jnp.arange(B)[None, :]).astype(cache.k.dtype)
        wmask = (jnp.arange(L)[None, :] == wpos[:, None])  # (B, L)
        m = wmask[None, :, :, None, None]
        k = jnp.where(m, k_new[:, :, None],
                      jnp.einsum("pb,lb...->lp...", sel, cache.k))
        v = jnp.where(m, v_new[:, :, None],
                      jnp.einsum("pb,lb...->lp...", sel, cache.v))
        return LMCache(k=k, v=v, lengths=cache.lengths[idx])

    # ------------------------------------------------------------- layers
    def _ln(self, x, p):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
        y = (y * p["scale"].astype(jnp.float32)
             + p["bias"].astype(jnp.float32))
        return y.astype(x.dtype)

    def _proj(self, x, p):  # flax DenseGeneral (..., d_model) -> (..., H, Dh)
        return jnp.einsum("...d,dhk->...hk", x, p["kernel"]) + p["bias"]

    def _qkv_proj(self, x, li):  # (..., d) -> 3 x (..., H, Dh), one dispatch
        kern, bias = self._qkv[li]
        out = jnp.einsum("...d,dchk->...chk", x, kern) + bias
        return out[..., 0, :, :], out[..., 1, :, :], out[..., 2, :, :]

    def _attn_out(self, x, p):  # (..., H, Dh) -> (..., d_model)
        return jnp.einsum("...hk,hkd->...d", x, p["kernel"]) + p["bias"]

    def _embed_token(self, tokens, pos):
        emb = self.p["embed"]["embedding"][tokens]
        x = emb.astype(self.dtype) * jnp.asarray(
            self.d_model ** 0.5, self.dtype)
        return x + self.p["pos_embed"][pos].astype(self.dtype)

    def _q_mm(self, x, name, eq):
        """int8 matmul: dynamic per-tensor x scale, static per-channel w
        scales. Returns f32 with dequantization fused into the epilogue."""
        wq, s = self._wq[name]
        x32 = x.astype(jnp.float32)
        s_x = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
        y = jnp.einsum(eq, xq, wq, preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * s_x

    def _ff(self, h, li):
        """FF1 -> ReLU -> FF2 (the float path is bit-identical to the
        previous inline form; the int8 path dequantizes per stage)."""
        lp = self.p[f"layer{li}"]
        if self.quant_int8:
            y = (self._q_mm(h, f"ff1_{li}", "...d,df->...f")
                 * self._wq[f"ff1_{li}"][1][0]
                 + lp["ff1"]["bias"].astype(jnp.float32))
            y = jax.nn.relu(y).astype(self.dtype)
            y = (self._q_mm(y, f"ff2_{li}", "...d,df->...f")
                 * self._wq[f"ff2_{li}"][1][0]
                 + lp["ff2"]["bias"].astype(jnp.float32))
            return y.astype(self.dtype)
        h = h @ lp["ff1"]["kernel"] + lp["ff1"]["bias"]
        h = jax.nn.relu(h)
        return h @ lp["ff2"]["kernel"] + lp["ff2"]["bias"]

    def _logits(self, x):
        x = self._ln(x, self.p["ln_f"])
        if self.quant_int8:
            wq, s = self._wq["logits"]                     # s (V, 1)
            return self._q_mm(x, "logits", "...d,vd->...v") * s[:, 0]
        return jnp.einsum("...d,vd->...v", x, self.p["embed"]["embedding"],
                          preferred_element_type=jnp.float32)

    def _block(self, li, x, k_ctx, v_ctx, ctx_mask):
        """One transformer block for a single query token per batch element.

        ``k_ctx/v_ctx (B, L, H, Dh)`` hold the attention context (cache and/or
        peek scratch); ``ctx_mask (B, L)`` marks valid positions — the current
        token's own k/v must already be included in the context.
        """
        lp = self.p[f"layer{li}"]
        h = self._ln(x, lp["ln1"])
        q = self._proj(h, lp["attn"]["query"])            # (B, H, Dh)
        scores = jnp.einsum("bhk,blhk->bhl", q, k_ctx,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(self.d_head)
        scores = jnp.where(ctx_mask[:, None, :], scores, NEG)
        w = jax.nn.softmax(scores, axis=-1).astype(v_ctx.dtype)
        o = jnp.einsum("bhl,blhk->bhk", w, v_ctx)
        x = x + self._attn_out(o, lp["attn"]["out"])

        h = self._ln(x, lp["ln2"])
        return x + self._ff(h, li)

    def _kv(self, li, x):
        lp = self.p[f"layer{li}"]
        h = self._ln(x, lp["ln1"])
        return (self._proj(h, lp["attn"]["key"]),
                self._proj(h, lp["attn"]["value"]))

    # ---------------------------------------------------------------- step
    def step(self, cache: LMCache, tokens: jnp.ndarray,
             write_mask: jnp.ndarray | None = None
             ) -> Tuple[jnp.ndarray, LMCache]:
        """Consume one token per batch element at its current position.

        Returns the next-token logits (B, V) and the updated cache. Where
        ``write_mask`` is False the element's cache/length are unchanged and
        its logits are garbage (callers mask them out).
        """
        B = tokens.shape[0]
        Lmax = cache.k.shape[2]
        if write_mask is None:
            write_mask = jnp.ones((B,), bool)
        pos = cache.lengths                                    # (B,)
        x = self._embed_token(tokens, pos)                     # (B, d)

        b_idx = jnp.arange(B)
        pos_ids = jnp.arange(Lmax)[None, :]
        # masked write via out-of-bounds drop: no full-tensor select copies
        wpos = jnp.where(write_mask, pos, Lmax)
        new_k = cache.k
        new_v = cache.v
        # attention context: committed prefix plus (only where written)
        # the current token
        ctx_mask = jnp.where(write_mask[:, None],
                             pos_ids <= pos[:, None],
                             pos_ids < pos[:, None])
        for li in range(self.n_layers):
            lp = self.p[f"layer{li}"]
            hn = self._ln(x, lp["ln1"])
            q, k_t, v_t = self._qkv_proj(hn, li)               # (B, H, Dh)
            k_li = cache.k[li].at[b_idx, wpos].set(
                k_t.astype(self.dtype), mode="drop")
            v_li = cache.v[li].at[b_idx, wpos].set(
                v_t.astype(self.dtype), mode="drop")
            new_k = new_k.at[li].set(k_li)
            new_v = new_v.at[li].set(v_li)
            scores = jnp.einsum("bhk,blhk->bhl", q, k_li,
                                preferred_element_type=jnp.float32)
            scores = scores / np.sqrt(self.d_head)
            scores = jnp.where(ctx_mask[:, None, :], scores, NEG)
            w = jax.nn.softmax(scores, axis=-1).astype(v_li.dtype)
            o = jnp.einsum("bhl,blhk->bhk", w, v_li)
            x = x + self._attn_out(o, lp["attn"]["out"])
            h2 = self._ln(x, lp["ln2"])
            x = x + self._ff(h2, li)

        logits = self._logits(x)
        new_lengths = jnp.where(write_mask, cache.lengths + 1, cache.lengths)
        return logits, LMCache(k=new_k, v=new_v, lengths=new_lengths)

    # ---------------------------------------------------------------- peek
    def peek_logprobs(self, cache: LMCache, next_logp: jnp.ndarray,
                      suffix: jnp.ndarray,
                      suffix_len: jnp.ndarray) -> jnp.ndarray:
        """Sum of log-probs of ``suffix`` given each element's cached prefix,
        WITHOUT committing anything to the cache.

        ``next_logp (B, V)``: log-softmax of the logits emitted by the last
        *committed* ``step`` (they predict the token right after the prefix) —
        it scores ``suffix[:, 0]`` for free. The remaining suffix tokens are
        processed transiently: their k/v live in local ``(B, S, H, Dh)``
        scratch buffers appended to the cache context, never written back.
        ``suffix (B, S)``, ``suffix_len (B,) <= S``.
        """
        B, S = suffix.shape
        Lmax = cache.k.shape[2]
        pos_ids = jnp.arange(Lmax)[None, :]
        cache_mask = pos_ids < cache.lengths[:, None]          # (B, Lmax)

        total = jnp.where(
            suffix_len > 0,
            jnp.take_along_axis(next_logp, suffix[:, 0:1], axis=-1)[:, 0],
            0.0)
        if S == 1:
            return total

        scratch_k = jnp.zeros(
            (self.n_layers, B, S, self.n_heads, self.d_head), self.dtype)
        scratch_v = jnp.zeros_like(scratch_k)
        s_ids = jnp.arange(S)[None, :]

        # token s sits at absolute position lengths + s
        x = self._embed_token(suffix[:, 0], cache.lengths)
        for s in range(S - 1):
            h = x
            smask = jnp.broadcast_to(s_ids <= s, (B, S))
            for li in range(self.n_layers):
                k_t, v_t = self._kv(li, h)
                scratch_k = scratch_k.at[li, :, s].set(k_t.astype(self.dtype))
                scratch_v = scratch_v.at[li, :, s].set(v_t.astype(self.dtype))
                ctx_k = jnp.concatenate([cache.k[li], scratch_k[li]], axis=1)
                ctx_v = jnp.concatenate([cache.v[li], scratch_v[li]], axis=1)
                mask = jnp.concatenate([cache_mask, smask], axis=1)
                h = self._block(li, h, ctx_k, ctx_v, mask)
            logp = jax.nn.log_softmax(self._logits(h), axis=-1)
            contrib = jnp.take_along_axis(
                logp, suffix[:, s + 1: s + 2], axis=-1)[:, 0]
            total = total + jnp.where(s + 1 < suffix_len, contrib, 0.0)
            x = self._embed_token(suffix[:, s + 1], cache.lengths + s + 1)

        return total
