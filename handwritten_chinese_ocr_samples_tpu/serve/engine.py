"""Fixed-shape serving engine — the TPU equivalent of the OpenVINO path.

The reference deploys via ONNX -> OpenVINO IR and a sync IECore loop
(`deploy.py:90-125`). On TPU the "IR" is an ahead-of-time compiled XLA
executable per (batch, width) bucket plus orbax weights: ``ServingEngine``
lowers + compiles the fused preprocess-normalize -> forward -> greedy-decode
function once per bucket (optionally persisted through the JAX compilation
cache), then serves with zero recompiles and only compact indices crossing
back to the host.

Preprocessing parity with `deploy.py:143-169`: grayscale load, resize to
model height, fixed width — truncate on the right if wider, else pad with
white then replicate the right edge — and normalize ``(x - 127.5) / 127.5``.
"""

from __future__ import annotations

import time
from typing import Dict, List, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def preprocess_fixed_shape(image_file: str, height: int,
                           width: int) -> np.ndarray:
    """Image file -> (1, H, W, 1) uint8, reference-parity padding."""
    src = cv2.imread(image_file)
    if src is None:
        raise FileNotFoundError(image_file)
    if src.ndim == 3:
        src = cv2.cvtColor(src, cv2.COLOR_BGR2GRAY)
    h, w = src.shape
    if h != height:
        ratio = w / h
        src = cv2.resize(src, (int(height * ratio), height),
                         interpolation=cv2.INTER_AREA)
    h, w = src.shape
    pad_img = np.ones((h, width), dtype=np.uint8) * 255
    if w >= width:
        pad_img = src[:, :width]
    else:
        pad_img[:, :w] = src
        pad_img[:, w:] = np.tile(src[:, [-1]], width - w)
    return pad_img[None, :, :, None]


class ServingEngine:
    """AOT-compiled greedy-OCR server over fixed width buckets."""

    def __init__(self, model, variables, codec,
                 widths: Sequence[int] = (512, 1024, 1600),
                 batch_sizes: Sequence[int] = (1,),
                 bf16: bool = True):
        import jax
        import jax.numpy as jnp
        from ..ops.decode import greedy_decode_device

        self.model = model
        self.variables = variables
        self.codec = codec
        self.widths = sorted(widths)
        self._compiled: Dict[Tuple[int, int], object] = {}
        self._jax = jax

        unknown_id = codec.unknown_id

        def infer(variables, x_u8):
            x = x_u8.astype(jnp.float32)
            x = (x - 127.5) / 127.5  # `deploy.py:167`
            logits = model.apply(variables, x, train=False)
            return greedy_decode_device(logits, None, unknown_id=unknown_id)

        self._infer = infer
        h = model.img_height
        for b in batch_sizes:
            for w in self.widths:
                shape = jax.ShapeDtypeStruct((b, h, w, 1), jnp.uint8)
                var_shapes = jax.tree.map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                    variables)
                self._compiled[(b, w)] = (
                    jax.jit(infer).lower(var_shapes, shape).compile())

    def bucket_for(self, width: int) -> int:
        for w in self.widths:
            if width <= w:
                return w
        return self.widths[-1]

    def infer_files(self, image_files: Sequence[str],
                    iterations: int = 1) -> Tuple[List[str], float]:
        """Serve images one by one (the reference's deploy loop,
        `deploy.py:109-125`); returns (texts, avg latency ms)."""
        jax = self._jax
        import jax.numpy as jnp

        texts: List[str] = []
        times: List[float] = []
        h = self.model.img_height
        for f in image_files:
            # choose bucket by true (pre-pad) width
            src = cv2.imread(f)
            if src is None:
                raise FileNotFoundError(f)
            if src.ndim == 3:
                src = cv2.cvtColor(src, cv2.COLOR_BGR2GRAY)
            true_w = int(h * src.shape[1] / src.shape[0])
            w = self.bucket_for(true_w)
            x = preprocess_fixed_shape(f, h, w)
            exe = self._compiled.get((1, w))
            for _ in range(iterations):
                t0 = time.time()
                chars, lengths = exe(self.variables, jnp.asarray(x))
                text = self.codec.compact_to_texts(chars, lengths)[0]
                times.append((time.time() - t0) * 1000)
            texts.append(text)
        return texts, float(np.mean(times)) if times else 0.0
