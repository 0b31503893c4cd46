"""Gated end-to-end convergence check (set HCTR_SLOW_TESTS=1 to run).

Validates that the full pipeline learns: the tiny-config model overfits 32
synthetic text lines to CER 0 with exact transcriptions. Takes ~2 min on a
TPU chip, far longer on CPU — hence opt-in.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("HCTR_SLOW_TESTS") != "1",
    reason="set HCTR_SLOW_TESTS=1 to run the slow convergence check")


def test_overfit_to_zero_cer(tmp_path):
    import jax
    import jax.numpy as jnp
    from tests.util_synth import make_dataset, CHARS
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.data.bucketing import (
        AlignCollate, BucketSpec)
    from handwritten_chinese_ocr_samples_tpu.data.dataset import ImageDataset
    from handwritten_chinese_ocr_samples_tpu.data.loader import DataLoader
    from handwritten_chinese_ocr_samples_tpu.eval.metrics import cer_counts
    from handwritten_chinese_ocr_samples_tpu.models.hctr import HCTRModel
    from handwritten_chinese_ocr_samples_tpu.train.step import (
        create_train_state, make_eval_step, make_train_step)

    root = str(tmp_path)
    make_dataset(root, n_train=32, n_val=4, n_test=4, seed=1)
    codec = CTCCodec(CHARS)
    model = HCTRModel(num_classes=codec.num_classes, backbone_channels=64,
                      num_blocks=(1, 1, 1, 1), dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(0),
                               input_shape=(8, 128, 128, 1), lr=0.02)
    step = make_train_step(donate=False)
    ds = ImageDataset(root, (1, 128), "train", batch_size=8)
    loader = DataLoader(ds, 8, AlignCollate(imgH=128,
                                            bucket_spec=BucketSpec((128,))),
                        shuffle=True, seed=0, num_workers=2)
    dev = []
    for b in loader:
        labels, lpad = codec.encode_padded(b["labels"], max_len=8)
        dev.append(({"images": jnp.asarray(b["images"]),
                     "labels": jnp.asarray(labels),
                     "label_paddings": jnp.asarray(lpad),
                     "widths": jnp.asarray(b["widths"])}, b["labels"]))
    for it in range(1500):
        db, _ = dev[it % len(dev)]
        state, m = step(state, db, jax.random.key(42))
    evalf = make_eval_step(model, codec.unknown_id)
    d = t = 0
    for db, lbl in dev:
        chars, lens = evalf(state.params, state.batch_stats,
                            db["images"], db["widths"])
        preds = codec.compact_to_texts(chars, lens)
        dd, tt = cer_counts(preds, list(lbl))
        d += dd
        t += tt
    assert d / t < 0.05, f"train CER {d / t} after 1500 steps"
