"""Language-model backends for CTC beam-search fusion.

The reference fuses two LM families into beam search (`ctc_codec.py:101-122`):
a KenLM character n-gram (scoring) and a fairseq transformer LM (scoring
and/or next-character prediction, `transformer_infer.py`). Here both sit
behind one small protocol so the decoder is backend-agnostic:

  * ``score_batch(texts)``    — log-probability score per text (the n-gram
    path scores space-joined characters with ``eos=False``, matching
    `ctc_codec.py:276-281`);
  * ``topk_next(texts, k)``   — k most likely next characters per text
    (`transformer_infer.py:62-76`).

Backends provided: ``KenLMBackend`` (optional import; present for API parity
with the reference), ``JaxLMBackend`` (first-party JAX char transformer, see
``lm/``), and ``NullLM`` (no LM: score 0, no candidates).
"""

from __future__ import annotations

from typing import List, Protocol, Sequence

import numpy as np


class LMBackend(Protocol):
    def score_batch(self, texts: Sequence[str]) -> np.ndarray: ...
    def topk_next(self, texts: Sequence[str], k: int) -> List[List[str]]: ...


class NullLM:
    """No language model: zero scores, no linguistic candidates."""

    def score_batch(self, texts: Sequence[str]) -> np.ndarray:
        return np.zeros((len(texts),), dtype=np.float64)

    def topk_next(self, texts: Sequence[str], k: int) -> List[List[str]]:
        return [[] for _ in texts]


class KenLMBackend:
    """N-gram scoring, space-joined characters, no EOS.

    Matches the reference's n-gram path (`ctc_codec.py:120-122,276-281`).
    Uses the kenlm C++ binding when installed; otherwise falls back to the
    first-party ARPA reader (``lm/arpa.py``), which reproduces
    ``kenlm.Model.score`` exactly (same Katz-backoff log10 math) for
    ``.arpa``/text models. The binary ``.klm`` format requires kenlm.
    """

    def __init__(self, model_path: str):
        self.path = model_path
        try:
            import kenlm  # optional dependency, as in the reference
            self.model = kenlm.Model(model_path)
        except ImportError:
            from ..lm.arpa import ArpaLM
            self.model = ArpaLM(model_path)

    def score_batch(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts),), dtype=np.float64)
        for i, t in enumerate(texts):
            out[i] = self.model.score(" ".join(t), eos=False)
        return out

    def topk_next(self, texts: Sequence[str], k: int) -> List[List[str]]:
        return [[] for _ in texts]


class JaxLMBackend:
    """First-party JAX decoder-only char LM (replaces fairseq).

    Wraps ``lm.infer.LMScorer`` — batched, jitted ``score`` /
    ``next_k_words`` on device.
    """

    def __init__(self, scorer):
        self.scorer = scorer

    def score_batch(self, texts: Sequence[str]) -> np.ndarray:
        return np.asarray(self.scorer.score(list(texts), char_based=True))

    def topk_next(self, texts: Sequence[str], k: int) -> List[List[str]]:
        return self.scorer.next_k_words(list(texts), k, char_based=True)
