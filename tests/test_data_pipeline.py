"""Data pipeline: preprocessing parity vs reference transforms + loader."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_PATH, reference_available
from tests.util_synth import make_dataset, render_line

from handwritten_chinese_ocr_samples_tpu.data.bucketing import (
    AlignCollate, BucketSpec, default_buckets, normalize_pad_batch,
)
from handwritten_chinese_ocr_samples_tpu.data.dataset import (
    ImageDataset, load_and_resize_image,
)
from handwritten_chinese_ocr_samples_tpu.data.loader import DataLoader


def test_buckets():
    spec = BucketSpec(default_buckets(1600, 128))
    assert spec.bucket_for(1) == 128
    assert spec.bucket_for(128) == 128
    assert spec.bucket_for(129) == 256
    assert spec.bucket_for(1600) == 1600
    assert spec.bucket_for(99999) == 1600


def test_normalize_pad_replicates_edge():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    out, widths = normalize_pad_batch([img], target_w=6)
    assert out.shape == (1, 3, 6, 1)
    assert widths[0] == 4
    want = (img[:, 3].astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out[0, :, 4, 0], want)
    np.testing.assert_allclose(out[0, :, 5, 0], want)


def test_dataset_and_loader(tmp_path):
    root, chars = make_dataset(str(tmp_path), n_train=10, n_test=4)
    ds = ImageDataset(root, (1, 128), "train", batch_size=4)
    assert len(ds) == 8  # truncated to batch multiple
    img, label = ds[0]
    assert img.shape[0] == 128
    assert set(label) <= set(chars)

    collate = AlignCollate(imgH=128, PAD="NormalizePAD",
                           bucket_spec=BucketSpec((64, 128, 256)))
    loader = DataLoader(ds, 4, collate, shuffle=True, seed=1,
                        group_by_width=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["images"].shape[0] == 4
        assert b["images"].shape[3] == 1
        assert b["images"].shape[2] in (64, 128, 256)
        assert len(b["labels"]) == 4


def test_loader_sharding(tmp_path):
    root, _ = make_dataset(str(tmp_path), n_train=16)
    ds = ImageDataset(root, (1, 128), "train", batch_size=2)
    collate = AlignCollate(imgH=128, bucket_spec=BucketSpec((256,)))
    all_batches = len(list(DataLoader(ds, 2, collate, num_workers=1)))
    shard0 = len(list(DataLoader(ds, 2, collate, num_workers=1,
                                 shard_id=0, num_shards=2)))
    shard1 = len(list(DataLoader(ds, 2, collate, num_workers=1,
                                 shard_id=1, num_shards=2)))
    assert shard0 + shard1 == all_batches


def _shim_torchvision(torch):
    """Minimal ToTensor shim — torchvision isn't installed in this image;
    only the bits the reference transforms use are emulated."""
    import types

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
            return t.float().div(255) if arr.dtype == np.uint8 else t.float()

    tv = types.ModuleType("torchvision")
    tf = types.ModuleType("torchvision.transforms")
    tf.ToTensor = ToTensor
    tv.transforms = tf
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tf)


def _import_reference_dataset():
    torch = pytest.importorskip("torch")
    _shim_torchvision(torch)
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from utils.dataset import AlignCollate as RefCollate
        from utils.dataset import ImageDataset as RefDataset
    finally:
        sys.path.remove(REFERENCE_PATH)
    return RefCollate, RefDataset


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
def test_preprocessing_parity_vs_reference(tmp_path):
    """Bit-identical resize + NormalizePAD + AlignCollate vs the torch
    reference transforms on the same synthetic images."""
    RefCollate, RefDataset = _import_reference_dataset()

    root, _ = make_dataset(str(tmp_path), n_train=6, seed=3)

    ref_ds = RefDataset(root, (1, 128), "train", batch_size=3)
    our_ds = ImageDataset(root, (1, 128), "train", batch_size=3)
    assert len(ref_ds) == len(our_ds)

    # identical resize output
    for i in range(3):
        ref_img, ref_label = ref_ds[i]
        our_img, our_label = our_ds[i]
        assert ref_label == our_label
        np.testing.assert_array_equal(ref_img[:, :, 0], our_img)

    # identical collated batch (exact-maxW mode == reference behavior)
    ref_collate = RefCollate(imgH=128, PAD="NormalizePAD", max_width=1600)
    our_collate = AlignCollate(imgH=128, PAD="NormalizePAD", max_width=1600,
                               bucket_spec=None)
    items_ref = [ref_ds[i] for i in range(3)]
    items_our = [our_ds[i] for i in range(3)]
    ref_imgs, ref_labels = ref_collate(items_ref)
    out = our_collate(items_our)
    assert tuple(ref_labels) == out["labels"]
    ref_np = ref_imgs.numpy()  # (B, 1, H, W)
    np.testing.assert_allclose(
        ref_np.transpose(0, 2, 3, 1), out["images"], atol=1e-6)


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
def test_width_cap_label_truncation_parity(tmp_path):
    """`dataset.py:108-128`: over-wide lines truncate image AND label."""
    RefCollate, _ = _import_reference_dataset()

    img = render_line("abcabcabcabc")  # wide
    wide = np.concatenate([img] * 4, axis=1)[:, :, None]  # (~1152 px)
    label = "abcabcabcabc" * 4
    ref_collate = RefCollate(imgH=128, PAD="NormalizePAD", max_width=512)
    our_collate = AlignCollate(imgH=128, PAD="NormalizePAD", max_width=512,
                               bucket_spec=None)
    ref_imgs, ref_labels = ref_collate([(wide, label)])
    out = our_collate([(wide[:, :, 0], label)])
    assert tuple(ref_labels) == out["labels"]
    assert ref_imgs.shape[3] == out["images"].shape[2] == 512
    np.testing.assert_allclose(
        ref_imgs.numpy().transpose(0, 2, 3, 1), out["images"], atol=1e-6)
