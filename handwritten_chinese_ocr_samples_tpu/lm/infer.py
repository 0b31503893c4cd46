"""Batched, jitted LM inference: ``score`` and ``next_k_words``.

API parity with the reference's fairseq wrapper (`transformer_infer.py:41-76`):

  * ``score(sentences)``: sum of positional log-probs of each sentence's
    tokens — position ``t`` of the logits scores token ``t+1``; the sum runs
    over the first ``len(sentence)`` positions;
  * ``next_k_words(sentences, k)``: top-k vocabulary entries at position
    ``len(sentence)``, special symbols dropped by ``Tokenizer.decode``.

TPU-first: token batches are padded to bucketed lengths (multiple of
``len_bucket``) so each bucket compiles once; the gather/top-k run on device
and only k indices / one float per sentence cross back to the host. This
removes the reference's per-call GPU round-trip pattern (`ctc_codec.py:215`,
one ``next_k_words`` per beam per frame).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .tokenizer import Tokenizer


class LMScorer:
    def __init__(self, model, variables, tokenizer: Tokenizer,
                 len_bucket: int = 32):
        self.model = model
        # commit to device once — a host tree re-uploads per score call
        # (see eval.driver weight-residency note)
        import jax
        self.variables = jax.device_put(variables, jax.devices()[0])
        self.tokenizer = tokenizer
        self.len_bucket = len_bucket
        self._score_fn = jax.jit(self._score_impl)
        self._topk_fn = jax.jit(self._topk_impl, static_argnames=("k",))

    # ------------------------------------------------------------- device fns
    def _logits(self, variables, tokens):
        return self.model.apply(variables, tokens, train=False)

    def _score_impl(self, variables, tokens, lengths):
        logits = self._logits(variables, tokens)          # (B, L, V)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = tokens[:, 1:]                               # token t+1
        pos_scores = jnp.take_along_axis(
            logp[:, :-1], tgt[..., None], axis=-1)[..., 0]  # (B, L-1)
        # Sum positions 0..len-1 (`transformer_infer.py:54-58`).
        L = pos_scores.shape[1]
        mask = jnp.arange(L)[None, :] < lengths[:, None]
        return jnp.sum(pos_scores * mask, axis=-1)

    def _topk_impl(self, variables, tokens, lengths, *, k):
        logits = self._logits(variables, tokens)          # (B, L, V)
        at = jnp.take_along_axis(
            logits, lengths[:, None, None], axis=1)[:, 0]  # (B, V)
        _, idx = jax.lax.top_k(at, k)
        return idx

    # --------------------------------------------------------------- host api
    def _tokenize_bucketed(self, sentences: Sequence[str], char_based: bool):
        max_len = max(len(s) for s in sentences) + 2
        L = -(-max_len // self.len_bucket) * self.len_bucket
        ids = self.tokenizer.tokenize(sentences, char_based=char_based,
                                      fixed_len=L)
        return jnp.asarray(ids)

    def score(self, sentences: List[str], char_based: bool = False
              ) -> np.ndarray:
        if not sentences:
            return np.zeros((0,))
        toks = self._tokenize_bucketed(sentences, char_based)
        lengths = jnp.asarray([len(s) for s in sentences], jnp.int32)
        return np.asarray(self._score_fn(self.variables, toks, lengths))

    def next_k_words(self, sentences: List[str], k: int,
                     char_based: bool = False) -> List[List[str]]:
        if not sentences:
            return []
        toks = self._tokenize_bucketed(sentences, char_based)
        lengths = jnp.asarray([len(s) for s in sentences], jnp.int32)
        idx = np.asarray(self._topk_fn(self.variables, toks, lengths, k=k))
        return [self.tokenizer.decode(row) for row in idx]

    # ------------------------------------------------------------ perplexity
    def perplexity(self, sentences: List[str], char_based: bool = True
                   ) -> float:
        """Corpus perplexity (base e -> exp of mean NLL per token),
        comparable to the reference's fairseq eval target
        (`third-party/README.md:95`: PPL ~29)."""
        total_lp, total_tok = 0.0, 0
        for i in range(0, len(sentences), 64):
            chunk = sentences[i: i + 64]
            scores = self.score(chunk, char_based=char_based)
            total_lp += float(scores.sum())
            total_tok += sum(len(s) for s in chunk)
        return float(np.exp(-total_lp / max(total_tok, 1)))
