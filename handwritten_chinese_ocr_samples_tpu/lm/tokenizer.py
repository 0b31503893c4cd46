"""fairseq-dict character tokenizer (parity with `transformer_infer.py:172-221`).

Dictionary file format: one ``<token> <count>`` per line; special symbols
``<s> <pad> </s> <unk>`` occupy indices 0..3, dictionary tokens follow from 4.
``tokenize`` prepends ``<s>`` and fills the tail (and all shorter rows) with
``</s>`` — the reference found sos-prefix + eos-fill experimentally better
(`transformer_infer.py:203-215`). ``decode`` drops indices <= 3.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


class Tokenizer:
    def __init__(self, dict_file: str):
        self.indices = {}
        self.symbols = ["<s>", "<pad>", "</s>", "<unk>"]
        self.sos_index = 0
        self.pad_index = 1
        self.eos_index = 2
        self.unk_index = 3
        with open(dict_file, "r", encoding="utf-8") as f:
            for line in f:
                try:
                    word, _count = line.rstrip().rsplit(" ", 1)
                except ValueError:
                    raise ValueError("Incorrect format, expected '<token> <cnt>'")
                self.indices[word] = len(self.symbols)
                self.symbols.append(word)

    @property
    def vocab_size(self) -> int:
        return len(self.symbols)

    @classmethod
    def from_characters(cls, characters: str) -> "Tokenizer":
        """Build without a dict file (fresh training runs)."""
        self = cls.__new__(cls)
        self.indices = {}
        self.symbols = ["<s>", "<pad>", "</s>", "<unk>"]
        self.sos_index, self.pad_index = 0, 1
        self.eos_index, self.unk_index = 2, 3
        for ch in characters:
            if ch not in self.indices:
                self.indices[ch] = len(self.symbols)
                self.symbols.append(ch)
        return self

    def save_dict(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            for sym in self.symbols[4:]:
                f.write(f"{sym} 1\n")

    def tokenize(self, sentences: Sequence[str], char_based: bool = False,
                 fixed_len: int = -1) -> np.ndarray:
        list_of_chars = [list(s) if char_based else s.split()
                         for s in sentences]
        max_len = fixed_len if fixed_len > 0 else \
            len(max(sentences, key=len)) + 1
        ids = np.full((len(sentences), max_len), fill_value=self.eos_index,
                      dtype=np.int64)
        for i, chars in enumerate(list_of_chars):
            ids[i, 0] = self.sos_index
            n = min(len(chars), max_len - 1)
            ids[i, 1: n + 1] = [
                self.indices.get(c, self.unk_index) for c in chars[:n]]
        return ids

    def decode(self, tokens: Sequence[int]) -> List[str]:
        return [self.symbols[int(x)] for x in tokens if int(x) > 3]
