"""Synthetic dataset fixtures: learnable text-line images with the dataset
contract layout (`Original_README.md:94-107`)."""

import os
from typing import Tuple

import numpy as np
from PIL import Image

CHARS = "abcdefgh"
_CHAR_W = 24


def render_line(text: str, img_h: int = 128) -> np.ndarray:
    """Each char is a distinct, learnable glyph: a vertical band whose
    intensity pattern encodes the char index."""
    w = max(_CHAR_W * len(text), _CHAR_W)
    img = np.full((img_h, w), 255, dtype=np.uint8)
    for i, ch in enumerate(text):
        k = CHARS.index(ch)
        x0 = i * _CHAR_W
        # glyph: k+1 horizontal dark stripes
        for s in range(k + 1):
            y0 = 8 + s * (img_h - 16) // 8
            img[y0: y0 + 6, x0 + 4: x0 + _CHAR_W - 4] = 30 * (k % 3)
    return img


def make_dataset(root: str, n_train: int = 16, n_val: int = 4,
                 n_test: int = 4, seed: int = 0,
                 min_len: int = 2, max_len: int = 5) -> Tuple[str, str]:
    """Create {train,val,test}/ + manifests + chars_list.txt under root."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "chars_list.txt"), "w",
              encoding="utf-8") as f:
        for ch in CHARS:
            f.write(ch + "\n")
    for phase, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        pdir = os.path.join(root, phase)
        os.makedirs(pdir, exist_ok=True)
        lines = []
        for i in range(n):
            L = int(rng.integers(min_len, max_len + 1))
            text = "".join(CHARS[int(rng.integers(len(CHARS)))]
                           for _ in range(L))
            name = f"{phase}_{i:04d}.png"
            Image.fromarray(render_line(text)).save(os.path.join(pdir, name))
            lines.append(f"{name},{text}")
        with open(os.path.join(root, f"{phase}_img_id_gt.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
    return root, CHARS
