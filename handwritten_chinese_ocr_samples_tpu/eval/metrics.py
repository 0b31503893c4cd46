"""Evaluation metrics: edit distance, CER, running meters.

The reference computes CER with the ``editdistance`` C extension
(`main.py:21`, `test.py:275-277`): ``CER = sum(editdist(pred, truth)) /
sum(len(truth))`` and ``acc = 1 - CER`` (`main.py:516-537`). The same
Levenshtein distance is provided here by a first-party C++ extension
(``native/editdistance.cc``, loaded via ctypes) with a numpy fallback —
both return identical values (see ``tests/test_native.py``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(here, "native", "libeditdistance.so")
    if os.path.exists(so):
        try:
            lib = ctypes.CDLL(so)
            lib.edit_distance_u32.restype = ctypes.c_int64
            lib.edit_distance_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def _levenshtein_np(a: np.ndarray, b: np.ndarray) -> int:
    """Vectorized-row DP Levenshtein over codepoint arrays."""
    if a.size == 0:
        return int(b.size)
    if b.size == 0:
        return int(a.size)
    prev = np.arange(b.size + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i in range(1, a.size + 1):
        cur[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        dele = prev[1:] + 1
        np.minimum(sub, dele, out=cur[1:])
        # insertion needs a sequential pass
        c = cur
        for j in range(1, b.size + 1):
            ins = c[j - 1] + 1
            if ins < c[j]:
                c[j] = ins
        prev, cur = cur, prev
    return int(prev[b.size])


def levenshtein(a: str, b: str) -> int:
    """Edit distance between two strings (unicode-codepoint granularity)."""
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    lib = _load_native()
    if lib is not None:
        return int(lib.edit_distance_u32(
            aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), aa.size,
            bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), bb.size))
    return _levenshtein_np(aa, bb)


def cer_counts(preds: Sequence[str],
               truths: Sequence[str]) -> Tuple[int, int]:
    """Return (edit-distance sum, truth-length sum) for a batch.

    ``CER = dist_sum / len_sum`` accumulated across batches exactly like
    `test.py:275-286` / `main.py:506-516`.
    """
    dist = 0
    total = 0
    for p, t in zip(preds, truths):
        dist += levenshtein(p, t)
        total += len(t)
    return dist, total


class AverageMeter:
    """Running average meter (`main.py:561-576`)."""

    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)
