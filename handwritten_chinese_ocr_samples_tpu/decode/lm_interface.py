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
    Accepts three model formats: the first-party HBLM binary (mmap,
    instant load — ``lm/hblm.py``, built with ``cli.lm_binarize``), text
    ARPA via kenlm when installed or the first-party reader
    (``lm/arpa.py``, which reproduces ``kenlm.Model.score`` exactly), and
    binary KenLM ``.klm`` when the kenlm package is present.
    """

    def __init__(self, model_path: str):
        self.path = model_path
        from ..lm.hblm import HblmLM, is_hblm
        if is_hblm(model_path):
            self.model = HblmLM(model_path)
            return
        try:
            import kenlm  # optional dependency, as in the reference
            self.model = kenlm.Model(model_path)
        except ImportError:
            from ..lm.arpa import ArpaLM
            try:
                self.model = ArpaLM(model_path)
            except (UnicodeDecodeError, ValueError) as e:
                raise ValueError(
                    f"{model_path}: neither text ARPA nor HBLM. Binary "
                    "KenLM (.klm) needs the `kenlm` package, which is not "
                    "installed — convert the ARPA with `python -m "
                    "handwritten_chinese_ocr_samples_tpu.cli.lm_binarize` "
                    "or pass the text ARPA file instead."
                ) from e

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
    ``next_k_words`` on device. The underlying model/params/tokenizer are
    exposed so device-fused decoders (``beam_lm_device``) can build a
    KV-cached runner from the same weights.
    """

    def __init__(self, scorer):
        self.scorer = scorer

    @property
    def lm_model(self):
        return self.scorer.model

    @property
    def lm_params(self):
        return self.scorer.variables["params"]

    @property
    def tokenizer(self):
        return self.scorer.tokenizer

    def score_batch(self, texts: Sequence[str]) -> np.ndarray:
        return np.asarray(self.scorer.score(list(texts), char_based=True))

    def topk_next(self, texts: Sequence[str], k: int) -> List[List[str]]:
        return self.scorer.next_k_words(list(texts), k, char_based=True)


def build_lm_backend(tfm_path: str = "", kenlm_path: str = "",
                     use_tfm: bool = False):
    """LM backend from CLI-style flags (`ctc_codec.py:101-122`), shared by
    the eval driver and the deploy CLI. Returns None when no LM is
    requested."""
    if use_tfm and tfm_path:
        from ..lm.infer import LMScorer
        from ..lm.io import load_lm
        lm_model, lm_vars, tokenizer = load_lm(tfm_path)
        return JaxLMBackend(LMScorer(lm_model, lm_vars, tokenizer))
    if kenlm_path:
        return KenLMBackend(kenlm_path)
    return None
