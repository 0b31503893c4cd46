"""Text <-> CTC index codec (host side, pure numpy).

Behavioral parity with the reference codec (`utils/ctc_codec.py:14-99`):
  * class space = ``['<blank>'] + chars + ['<unknown>']`` — blank index 0,
    unknown index ``len(chars) + 1`` (`ctc_codec.py:26-30`).
  * ``encode`` maps unknown characters to the unknown index
    (`ctc_codec.py:43-61`).
  * greedy decode collapses repeats and drops blank/unknown
    (`ctc_codec.py:70-99`).

The heavy per-frame argmax runs on device (see ``ops/decode.py``); this module
only performs the final index->text conversion, which is inherently host-side
string work.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Sequence, Tuple

import numpy as np


def load_chars_list(path: str) -> str:
    """Load a vocabulary file (one character per line) into a string.

    Matches the reference's chars_list read (`main.py:594-601`): newline-strip
    each line and concatenate.
    """
    chars: List[str] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            chars.append(line.strip("\n"))
    return "".join(chars)


class CTCCodec:
    """Convert between text labels and CTC index sequences.

    ``num_classes = 1 (blank) + len(chars) + 1 (unknown)``.
    """

    def __init__(self, characters: str):
        self.chars_list = list(characters)
        self.dict = {c: i + 1 for i, c in enumerate(self.chars_list)}
        self.characters = ["<blank>"] + self.chars_list + ["<unknown>"]
        self.blank_id = 0
        self.unknown_id = len(self.characters) - 1
        self.dict["<blank>"] = self.blank_id
        self.dict["<unknown>"] = self.unknown_id
        # U1 table for vectorized index->string conversion (collapsed output
        # never contains blank/unknown, so placeholders are safe there).
        self._chars_u1 = np.array(["\x00"] + self.chars_list + ["\x00"],
                                  dtype="U1")

    @property
    def num_classes(self) -> int:
        return len(self.characters)

    # ------------------------------------------------------------------ encode
    def encode(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Text labels -> concatenated index stream + per-text lengths.

        Same output contract as `ctc_codec.py:43-61` (flat int32 indices and
        int32 lengths); unknown characters map to the unknown index.
        """
        lengths = np.array([len(s) for s in texts], dtype=np.int32)
        flat = np.fromiter(
            (self.dict.get(ch, self.unknown_id) for s in texts for ch in s),
            dtype=np.int32,
            count=int(lengths.sum()),
        )
        return flat, lengths

    def encode_padded(
        self, texts: Sequence[str], max_len: int | None = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Text labels -> ``(B, L)`` padded label matrix + ``(B, L)`` paddings.

        This is the TPU-native layout consumed by ``optax.ctc_loss`` (static
        shapes; 1.0 marks padding positions).
        """
        lengths = [len(s) for s in texts]
        L = max_len if max_len is not None else max(lengths + [1])
        labels = np.zeros((len(texts), L), dtype=np.int32)
        paddings = np.ones((len(texts), L), dtype=np.float32)
        for i, s in enumerate(texts):
            n = min(len(s), L)
            labels[i, :n] = [self.dict.get(ch, self.unknown_id) for ch in s[:n]]
            paddings[i, :n] = 0.0
        return labels, paddings

    # ------------------------------------------------------------------ decode
    def indices_to_text(self, idx: np.ndarray, length: int | None = None) -> str:
        """Collapse one row of greedy argmax indices into text.

        CTC collapse rule (`ctc_codec.py:88-94`): keep position i iff the index
        is neither blank nor unknown and differs from the previous position.
        """
        idx = np.asarray(idx)
        if length is not None:
            idx = idx[:length]
        if idx.size == 0:
            return ""
        keep = (idx != self.blank_id) & (idx != self.unknown_id)
        keep[1:] &= idx[1:] != idx[:-1]
        return "".join(self.characters[i] for i in idx[keep])

    def decode_greedy_indices(
        self, preds_index: np.ndarray, lengths: Iterable[int] | None = None
    ) -> List[str]:
        """Batch of argmax index rows ``(B, T)`` -> list of texts.

        ``lengths`` optionally gives the valid (unpadded) frames per row; the
        reference always uses the full padded width (`main.py:388`,
        `ctc_codec.py:77`), which is the default here too.
        """
        preds_index = np.asarray(preds_index)
        B = preds_index.shape[0]
        if lengths is None:
            lengths = [preds_index.shape[1]] * B
        return [
            self.indices_to_text(preds_index[b], int(l))
            for b, l in zip(range(B), lengths)
        ]

    def compact_to_texts(self, chars: np.ndarray,
                         lengths: np.ndarray) -> List[str]:
        """Device-compacted ``(B, T)`` char indices + ``(B,)`` lengths ->
        strings, via one vectorized U1 gather per row (C-speed join)."""
        chars = np.asarray(chars)
        lengths = np.asarray(lengths)
        out = []
        for b in range(chars.shape[0]):
            n = int(lengths[b])
            if n == 0:
                out.append("")
                continue
            row = self._chars_u1[chars[b, :n]]
            out.append(row.view(f"U{n}")[0])
        return out

    def decode_greedy(self, preds: np.ndarray) -> List[str]:
        """Greedy decode from raw logits/log-probs ``(T, B, D)``.

        Host fallback mirroring `ctc_codec.py:70-99`; production path computes
        the argmax on device (``ops/decode.py``) and calls
        ``decode_greedy_indices``.
        """
        preds_index = np.argmax(preds, axis=2).T  # (T,B) -> (B,T)
        return self.decode_greedy_indices(preds_index)


def default_chars_path(data_dir: str) -> str:
    """The dataset-contract location of the vocabulary file.

    `<data>/chars_list.txt` (`Original_README.md:94-107`).
    """
    return os.path.join(data_dir, "chars_list.txt")
