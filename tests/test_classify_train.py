"""Classification (``pred='Classification'``) training path.

The reference's ``innovation.py`` classifier (`innovation.py:235-283`) was
never wired into a CLI; here the Trainer dispatches on the model's ``pred``
attribute: CE loss + top-1 accuracy instead of CTC + CER. Tested with a tiny
stand-in classifier (the real innovation trunk is covered by
``test_innovation_parity.py``; its 38M params are too slow for a CPU train
loop).
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp
from flax import linen as nn

from handwritten_chinese_ocr_samples_tpu.train.step import (
    create_train_state, make_classify_eval_step, make_classify_train_step,
)
from handwritten_chinese_ocr_samples_tpu.train.trainer import (
    Trainer, TrainerConfig,
)

CHARS = "abcdefgh"


class TinyClassifier(nn.Module):
    """Minimal classifier with the innovation model's attribute contract."""

    num_classes: int
    img_height: int = 32
    pad_mode: str = "NormalizePAD"
    optimizer: str = "Adam"
    pred: str = "Classification"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(8, (3, 3), padding=1, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (3, 3), padding=1, name="conv2")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc")(x)


def _render_char(k: int, h: int = 32) -> np.ndarray:
    """Distinct learnable glyph per class: k+1 stripes of a per-class
    intensity (trivially separable for the tiny test model)."""
    img = np.full((h, h), 255, dtype=np.uint8)
    for s in range(k + 1):
        y0 = 2 + s * (h - 4) // 8
        img[y0: y0 + 2, 4: h - 4] = 10 + 25 * k
    return img


def make_char_dataset(root: str, n_train: int = 32, n_test: int = 8,
                      seed: int = 0, h: int = 32):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "chars_list.txt"), "w",
              encoding="utf-8") as f:
        for ch in CHARS:
            f.write(ch + "\n")
    for phase, n in (("train", n_train), ("val", n_test), ("test", n_test)):
        pdir = os.path.join(root, phase)
        os.makedirs(pdir, exist_ok=True)
        lines = []
        for i in range(n):
            k = int(rng.integers(len(CHARS)))
            name = f"{phase}_{i:04d}.png"
            Image.fromarray(_render_char(k, h)).save(
                os.path.join(pdir, name))
            lines.append(f"{name},{CHARS[k]}")
        with open(os.path.join(root, f"{phase}_img_id_gt.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
    return root


def test_classify_step_reduces_loss():
    model = TinyClassifier(num_classes=len(CHARS) + 2)
    state = create_train_state(model, jax.random.key(0),
                               input_shape=(4, 32, 32, 1), lr=0.02)
    step = make_classify_train_step(donate=False)
    rng = np.random.default_rng(0)
    labels = np.array([1, 2, 3, 4], np.int32)
    images = np.stack([_render_char(k - 1) for k in labels])[..., None]
    batch = {"images": jnp.asarray((images / 255.0 - 0.5) / 0.5,
                                   jnp.float32),
             "labels": jnp.asarray(labels)}
    del rng
    losses = []
    for _ in range(300):
        state, metrics = step(state, batch, jax.random.key(1))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5
    # train-time acc is measured under dropout; exactness is checked via the
    # deterministic eval step below
    assert float(metrics["acc"]) >= 0.5

    eval_step = make_classify_eval_step(model)
    pred = eval_step(state.params, state.batch_stats, batch["images"])
    assert list(np.asarray(pred)) == list(labels)


def test_classify_step_skips_nonfinite():
    model = TinyClassifier(num_classes=len(CHARS) + 2)
    state = create_train_state(model, jax.random.key(0),
                               input_shape=(2, 32, 32, 1))
    step = make_classify_train_step(donate=False)
    bad = {"images": jnp.full((2, 32, 32, 1), jnp.nan),
           "labels": jnp.zeros((2,), jnp.int32)}
    params_before = jax.tree.map(np.asarray, state.params)
    state, metrics = step(state, bad, jax.random.key(1))
    assert float(metrics["skipped"]) == 1.0
    jax.tree.map(np.testing.assert_array_equal, params_before,
                 jax.tree.map(np.asarray, state.params))


def test_trainer_classification_e2e(tmp_path):
    """Trainer dispatches on pred='Classification': fixed square batches,
    CE train step, top-1 accuracy eval; overfits the tiny glyph set."""
    root = make_char_dataset(str(tmp_path / "chars"), n_train=64)
    model = TinyClassifier(num_classes=len(CHARS) + 2)
    cfg = TrainerConfig(data=root, model_type="innovation", batch_size=8,
                        lr=0.02, epochs=45, print_freq=1000, val_freq=0,
                        workers=0, seed=0, out_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg, model, CHARS)
    assert trainer.pred_mode == "Classification"
    trainer.fit()
    acc = trainer.evaluate("test")
    assert acc >= 0.9, acc


def test_trainer_rejects_unknown_pred_mode(tmp_path):
    root = make_char_dataset(str(tmp_path / "chars2"), n_train=4, n_test=2)

    class WeirdModel(TinyClassifier):
        pred: str = "Segmentation"

    with pytest.raises(ValueError, match="not expected pred mode"):
        Trainer(TrainerConfig(data=root, batch_size=2),
                WeirdModel(num_classes=4), CHARS)
