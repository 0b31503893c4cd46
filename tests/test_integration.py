"""End-to-end integration: Trainer + evaluate on a synthetic dataset, eval
driver with a saved checkpoint, serving engine round trip."""

import os

import numpy as np
import pytest

import jax

from tests.util_synth import make_dataset

from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
from handwritten_chinese_ocr_samples_tpu.models.hctr import HCTRModel
from handwritten_chinese_ocr_samples_tpu.train.trainer import (
    Trainer, TrainerConfig,
)


def tiny_model(num_classes):
    return HCTRModel(num_classes=num_classes, backbone_channels=64,
                     num_blocks=(1, 1, 1, 1))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_dataset(str(root), n_train=8, n_val=4, n_test=4, seed=0)
    return str(root)


def test_trainer_epoch_and_checkpoint(synth_root, tmp_path):
    from handwritten_chinese_ocr_samples_tpu.core.codec import load_chars_list
    chars = load_chars_list(os.path.join(synth_root, "chars_list.txt"))
    cfg = TrainerConfig(
        data=synth_root, batch_size=4, epochs=1, print_freq=1,
        val_freq=0, workers=2, seed=0, out_dir=str(tmp_path),
        bucket_step=64, max_width=256, max_label_len=8)
    model = tiny_model(len(chars) + 2)
    trainer = Trainer(cfg, model, chars)
    trainer.fit()
    assert os.path.isdir(os.path.join(str(tmp_path), "hctr_checkpoint"))
    acc = trainer.evaluate("test")
    assert -1.0 <= acc <= 1.0

    # resume restores epoch + state
    cfg2 = TrainerConfig(
        data=synth_root, batch_size=4, epochs=1, print_freq=10,
        val_freq=0, workers=2, seed=0, out_dir=str(tmp_path),
        bucket_step=64, max_width=256, max_label_len=8,
        resume=os.path.join(str(tmp_path), "hctr_checkpoint"))
    trainer2 = Trainer(cfg2, tiny_model(len(chars) + 2), chars)
    assert trainer2.start_epoch == 1
    p1 = np.asarray(jax.tree.leaves(trainer.state.params)[0])
    p2 = np.asarray(jax.tree.leaves(trainer2.state.params)[0])
    np.testing.assert_array_equal(p1, p2)


def test_serving_engine(synth_root):
    from handwritten_chinese_ocr_samples_tpu.serve.engine import ServingEngine
    from handwritten_chinese_ocr_samples_tpu.core.codec import load_chars_list

    chars = load_chars_list(os.path.join(synth_root, "chars_list.txt"))
    codec = CTCCodec(chars)
    model = tiny_model(codec.num_classes)
    import jax.numpy as jnp
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, jnp.zeros((1, 128, 64, 1)),
        train=False)
    engine = ServingEngine(model, variables, codec, widths=(128, 256))
    files = [os.path.join(synth_root, "test", f)
             for f in sorted(os.listdir(os.path.join(synth_root, "test")))][:2]
    texts, avg_ms = engine.infer_files(files, iterations=2)
    assert len(texts) == 2
    assert avg_ms >= 0.0

    # batched mode: same transcriptions, in input order, padded last batch
    all_files = [os.path.join(synth_root, "test", f)
                 for f in sorted(os.listdir(
                     os.path.join(synth_root, "test")))]
    t1, _ = engine.infer_files(all_files, iterations=1)
    t2, lps = engine.infer_files_batched(all_files, batch_size=3)
    assert t2 == t1
    assert lps > 0.0


def test_cli_parsers():
    from handwritten_chinese_ocr_samples_tpu.cli.train import (
        build_argparser as train_parser)
    from handwritten_chinese_ocr_samples_tpu.cli.test import (
        build_argparser as test_parser)
    from handwritten_chinese_ocr_samples_tpu.cli.deploy import (
        build_argparser as deploy_parser)
    from handwritten_chinese_ocr_samples_tpu.cli.export import (
        build_argparser as export_parser)

    a = train_parser().parse_args(["-m", "hctr", "-d", "/tmp/x", "-b", "16"])
    assert a.model_type == "hctr" and a.batch_size == 16
    a = test_parser().parse_args(
        ["-m", "hctr", "-f", "ckpt", "-i", "img.jpg", "-dm", "greedy-search",
         "-bm", "-bs", "5", "-lp", "1.5"])
    assert a.decode_method == "greedy-search" and a.beam_size == 5
    a = deploy_parser().parse_args(["-m", "ckpt", "-i", "img.jpg"])
    assert a.language == "hctr"
    a = export_parser().parse_args(["-f", "ckpt", "-w", "256,512"])
    assert a.widths == "256,512"
