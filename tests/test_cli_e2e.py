"""End-to-end CLI path: train -> checkpoint -> eval driver with greedy,
device beam, LM-fused beam, and host beam decode methods."""

import argparse
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.util_synth import make_dataset, CHARS

from handwritten_chinese_ocr_samples_tpu.models.hctr import HCTRModel
from handwritten_chinese_ocr_samples_tpu.models.registry import register_model


@register_model("hctr-tiny")
def _tiny_factory(num_classes, dtype=jnp.float32):
    return HCTRModel(num_classes=num_classes, backbone_channels=64,
                     num_blocks=(1, 1, 1, 1), dtype=dtype)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Synthetic dataset + trained tiny recognizer ckpt + tiny LM dir."""
    root = str(tmp_path_factory.mktemp("e2e"))
    make_dataset(root, n_train=8, n_val=4, n_test=4, seed=0)

    from handwritten_chinese_ocr_samples_tpu.train.trainer import (
        Trainer, TrainerConfig)
    cfg = TrainerConfig(data=root, model_type="hctr-tiny", batch_size=4,
                        epochs=1, print_freq=100, val_freq=0, workers=2,
                        seed=0, out_dir=root, bucket_step=64, max_width=256,
                        max_label_len=8)
    model = _tiny_factory(len(CHARS) + 2)
    Trainer(cfg, model, CHARS).fit()
    ckpt = os.path.join(root, "hctr-tiny_checkpoint")
    assert os.path.isdir(ckpt)

    # tiny LM trained for a few steps + saved in the LM dir layout
    from handwritten_chinese_ocr_samples_tpu.lm.train import train_char_lm
    from handwritten_chinese_ocr_samples_tpu.lm.io import load_lm, save_lm
    lm_model, lm_params, tok = train_char_lm(
        ["".join(CHARS)] * 8, CHARS, epochs=1, batch_size=4, max_len=32,
        d_model=32, n_layers=2, warmup_steps=2, log_every=10_000,
        dtype=jnp.float32)
    lm_dir = os.path.join(root, "lm")
    save_lm(lm_dir, lm_model, lm_params, tok)
    load_lm(lm_dir)  # round-trips
    return root, ckpt, lm_dir


def _args(root, ckpt, lm_dir, **over):
    base = dict(
        model_type="hctr-tiny", model_file=ckpt, input=root, batch_size=4,
        benchmark_mode=True, decode_method="greedy-search",
        skip_search=False, kenlm_path="", use_tfm_pred=False, tfm_path=lm_dir,
        use_tfm_score=False, beam_size=3, search_depth=4, lm_panelty=0.5,
        len_bonus=0.0, workers=2, test_verbose=False, print_freq=1000,
        chars_list=os.path.join(root, "chars_list.txt"), host_beam=False)
    base.update(over)
    return argparse.Namespace(**base)


def test_benchmark_greedy(artifacts):
    root, ckpt, lm_dir = artifacts
    from handwritten_chinese_ocr_samples_tpu.eval.driver import run_benchmark
    cer = run_benchmark(_args(root, ckpt, lm_dir))
    assert np.isfinite(cer) and cer >= 0.0


def test_benchmark_device_beam_no_lm(artifacts):
    root, ckpt, lm_dir = artifacts
    from handwritten_chinese_ocr_samples_tpu.eval.driver import (
        EvalSession, run_benchmark)
    args = _args(root, ckpt, lm_dir, decode_method="beam-search")
    session = EvalSession(args)
    assert session.device_beam and not session.device_lm_beam
    cer = run_benchmark(args)
    assert np.isfinite(cer) and cer >= 0.0


def test_benchmark_device_lm_beam(artifacts):
    root, ckpt, lm_dir = artifacts
    from handwritten_chinese_ocr_samples_tpu.eval.driver import (
        EvalSession, run_benchmark)
    args = _args(root, ckpt, lm_dir, decode_method="beam-search",
                 use_tfm_pred=True, use_tfm_score=True)
    session = EvalSession(args)
    assert session.device_lm_beam
    cer = run_benchmark(args)
    assert np.isfinite(cer) and cer >= 0.0


def test_benchmark_host_beam_matches_device(artifacts):
    """--host-beam forces the host decoder; transcriptions must agree with
    the device path on the same checkpoint."""
    root, ckpt, lm_dir = artifacts
    from handwritten_chinese_ocr_samples_tpu.eval.driver import EvalSession
    from handwritten_chinese_ocr_samples_tpu.data.dataset import (
        ImageDataset, )
    from handwritten_chinese_ocr_samples_tpu.data.bucketing import (
        AlignCollate, BucketSpec)

    a_dev = _args(root, ckpt, lm_dir, decode_method="beam-search")
    a_host = _args(root, ckpt, lm_dir, decode_method="beam-search",
                   host_beam=True)
    s_dev = EvalSession(a_dev)
    s_host = EvalSession(a_host)
    assert s_dev.device_beam and not s_host.device_beam

    ds = ImageDataset(root, (1, 128), "test", batch_size=4)
    collate = AlignCollate(imgH=128, bucket_spec=BucketSpec((128, 256)))
    batch = collate([ds[i] for i in range(4)])
    t_dev, _ = s_dev.decode_batch(batch["images"])
    t_host, _ = s_host.decode_batch(batch["images"])
    assert t_dev == t_host


def test_run_single_on_reference_samples(artifacts):
    """Single-image mode over the reference's sample text lines (read at
    runtime; random-ish weights, so only the pipeline is asserted)."""
    from tests.conftest import REFERENCE_PATH, reference_available
    img_dir = os.path.join(REFERENCE_PATH, "images")
    if not (reference_available() and os.path.isdir(img_dir)):
        pytest.skip("reference sample images not present")
    root, ckpt, lm_dir = artifacts
    from handwritten_chinese_ocr_samples_tpu.eval.driver import run_single
    sample = os.path.join(img_dir, "000000.jpg")
    args = _args(root, ckpt, lm_dir, input=sample, benchmark_mode=False,
                 decode_method="greedy-search", batch_size=1)
    run_single(args)  # must not raise; prints file/pred/throughput


def test_benchmark_data_parallel_matches_single(artifacts):
    """`-dp N` shards eval batches over the (virtual) device mesh and
    reproduces the single-device CER for greedy AND the LM-fused beam
    (the inference-side counterpart of the reference's train-only DDP)."""
    from handwritten_chinese_ocr_samples_tpu.eval.driver import run_benchmark
    root, ckpt, lm_dir = artifacts

    for over in (dict(),
                 dict(decode_method="beam-search", use_tfm_pred=True,
                      use_tfm_score=True, skip_search=True, lm_f32=True)):
        want = run_benchmark(_args(root, ckpt, lm_dir, **over))
        got = run_benchmark(_args(root, ckpt, lm_dir, data_parallel=4,
                                  **over))
        assert got == pytest.approx(want, abs=1e-12), over


def test_data_parallel_validation(artifacts):
    from handwritten_chinese_ocr_samples_tpu.eval.driver import EvalSession
    root, ckpt, lm_dir = artifacts
    with pytest.raises(ValueError, match="divide the batch"):
        EvalSession(_args(root, ckpt, lm_dir, data_parallel=3))
    with pytest.raises(ValueError, match="exceeds"):
        EvalSession(_args(root, ckpt, lm_dir, data_parallel=64))
