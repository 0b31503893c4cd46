"""Native (C++) host beam search — ctypes wrapper over libcbsdecoder.so.

The CPU serving path (the reference's OpenVINO deployment mode,
`deploy.py:66-125`) decodes each line with host-side context beam search +
n-gram LM. The Python host decoder (``beam_host.py``) is the correctness
oracle but loops per (frame, beam, candidate) in the interpreter; the C++
implementation (``native/cbs_decoder.cc``) reproduces it exactly —
transcription-equality enforced by ``tests/test_native_cbs.py`` — at
native speed, including the ARPA Katz-backoff scorer with kenlm ``score``
semantics (`ctc_codec.py:120-122,276-281`).

Covers the decode configurations whose LM lives on the host: no-LM beam
search and n-gram-scored beam search, full or skip mode. The transformer
LM path runs fused on the TPU (``beam_lm_device``), not here.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(here, "native", "libcbsdecoder.so")
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    _LIB = _bind(lib)
    return _LIB


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    """Declare the C ABI on a loaded libcbsdecoder handle (also used by the
    rebuild-verification test to bind a freshly compiled library)."""
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    lib.cbs_arpa_load.restype = ctypes.c_void_p
    lib.cbs_arpa_load.argtypes = [ctypes.c_char_p]
    lib.cbs_arpa_free.argtypes = [ctypes.c_void_p]
    lib.cbs_arpa_order.restype = ctypes.c_int
    lib.cbs_arpa_order.argtypes = [ctypes.c_void_p]
    lib.cbs_arpa_unk_id.restype = ctypes.c_int
    lib.cbs_arpa_unk_id.argtypes = [ctypes.c_void_p]
    lib.cbs_arpa_word_id.restype = ctypes.c_int
    lib.cbs_arpa_word_id.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.cbs_arpa_score_ids.restype = ctypes.c_double
    lib.cbs_arpa_score_ids.argtypes = [ctypes.c_void_p, c_i32p,
                                       ctypes.c_int, ctypes.c_int]
    lib.cbs_create.restype = ctypes.c_void_p
    lib.cbs_create.argtypes = [
        ctypes.c_void_p, c_i32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_int]
    lib.cbs_free.argtypes = [ctypes.c_void_p]
    lib.cbs_decode.restype = ctypes.c_int
    lib.cbs_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, c_i32p, ctypes.c_int]
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeArpaLM:
    """C++ ARPA model handle (kenlm ``score`` semantics, log10)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("libcbsdecoder.so not built (make -C "
                               "handwritten_chinese_ocr_samples_tpu/native)")
        self._lib = lib
        self._h = lib.cbs_arpa_load(path.encode())
        if not self._h:
            raise ValueError(f"failed to load ARPA file {path}")
        self.order = lib.cbs_arpa_order(self._h)
        self.unk_id = lib.cbs_arpa_unk_id(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cbs_arpa_free(self._h)
            self._h = None

    def word_id(self, word: str) -> int:
        """ARPA id of a known word, or the <unk> id."""
        wid = self._lib.cbs_arpa_word_id(self._h, word.encode())
        return self.unk_id if wid < 0 else wid

    def score_words(self, words: List[str], eos: bool = False) -> float:
        ids = np.array([self.word_id(w) for w in words], np.int32)
        return float(self._lib.cbs_arpa_score_ids(
            self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ids.size, int(eos)))

    def score(self, sentence: str, bos: bool = True,
              eos: bool = True) -> float:
        """Same surface as ``lm.arpa.ArpaLM.score`` (bos must be True —
        the decoder never scores without it)."""
        if not bos:
            raise NotImplementedError("native scorer always uses <s>")
        return self.score_words(sentence.split(), eos=eos)


class NativeBeamSearchDecoder:
    """Drop-in for ``BeamSearchDecoder`` on host-LM configurations.

    ``config`` is a ``beam_host.BeamSearchConfig``; ``use_lm_pred`` must be
    False (n-gram LMs propose no candidates — `lm_interface.py:65-66`) and
    the LM, when scoring is on, is an ARPA file path.
    """

    def __init__(self, codec, config, arpa_path: Optional[str] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("libcbsdecoder.so not built (make -C "
                               "handwritten_chinese_ocr_samples_tpu/native)")
        if config.use_lm_pred:
            raise ValueError("native CBS has no LM candidate proposal; "
                             "use the device LM beam for transformer LMs")
        self._lib = lib
        self.codec = codec
        self.cfg = config
        self._arpa = None
        lm_handle = None
        c2w = None
        use_score = bool(config.use_lm_score and arpa_path)
        if use_score:
            self._arpa = NativeArpaLM(arpa_path)
            lm_handle = self._arpa._h
            mapping = np.full((codec.num_classes,), self._arpa.unk_id,
                              np.int32)
            for ch, cid in codec.dict.items():
                if ch not in ("<blank>", "<unknown>"):
                    mapping[cid] = self._arpa.word_id(ch)
            c2w = mapping.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            self._c2w_keepalive = mapping
        self._h = lib.cbs_create(
            lm_handle, c2w, codec.num_classes, codec.unknown_id,
            config.beam_size, config.search_depth,
            float(config.lm_panelty), float(config.len_bonus),
            int(use_score), int(config.skip_search),
            float(config.prune_log_prob),
            int(getattr(config, "suffix_len", 4)))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.cbs_free(self._h)
            self._h = None

    def decode(self, preds: np.ndarray, already_log: bool = False
               ) -> List[str]:
        """``preds``: (T, B, D) logits or log-probs -> list of B texts."""
        T, B, D = preds.shape
        out = np.zeros((T,), np.int32)
        texts = []
        for b in range(B):
            frame = np.ascontiguousarray(preds[:, b, :], np.float32)
            n = self._lib.cbs_decode(
                self._h,
                frame.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                T, D, int(already_log),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out.size)
            texts.append("".join(self.codec.characters[i]
                                 for i in out[:n]))
        return texts


def try_native_host_decoder(codec, cfg, lm=None, kenlm_path: str = ""):
    """Native decoder for a qualifying host-beam configuration, or None.

    Qualifies when the library is built, no LM candidate proposal is
    requested, and LM scoring (if on) comes from an ARPA file the native
    reader can load — i.e. exactly the reference's n-gram serving config
    (`deploy.py:76-87` with ``-kp``) and the no-LM beam. Transformer-LM
    configurations return None (they run on device or need Python LM
    callbacks).
    """
    if not native_available() or cfg.use_lm_pred:
        return None
    path = kenlm_path or getattr(lm, "path", "")
    if cfg.use_lm_score:
        if not path:
            return None
        try:
            return NativeBeamSearchDecoder(codec, cfg, arpa_path=path)
        except (ValueError, RuntimeError):
            return None  # e.g. binary .klm — fall back to python/kenlm
    try:
        return NativeBeamSearchDecoder(codec, cfg)
    except RuntimeError:
        return None
