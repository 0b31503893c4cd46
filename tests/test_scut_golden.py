"""Gated batch-8 golden eval over the reference's SCUT-EPT sample scans.

Reproduces BASELINE config #2 mechanics (`Original_README.md:56-76`): the 5
real scanned lines + ground truth shipped by the reference
(`images/scut_test_img_id_gt.txt`) are run through ``test.py -bm`` semantics —
AlignCollate over genuinely variable-width scans, full 7375-class head, CER
via editdistance — with a checkpoint converted from the reference's own
``.pth.tar`` save format (`main.py:349-356`).

The reference ships no trained weights, so the converted checkpoint is
random-init: the assertion is pipeline-mechanical (batch collation on real
images, converter at full scale, finite CER), not accuracy. Set
``HCTR_SLOW_TESTS=1`` to run (full-size forward at scan widths on CPU).
"""

import os
import shutil
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_PATH, REPO_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    os.environ.get("HCTR_SLOW_TESTS") != "1" or not reference_available(),
    reason="set HCTR_SLOW_TESTS=1 (and have /root/reference) to run")

FULL_VOCAB = os.path.join(REPO_ROOT, "demo", "full", "data",
                          "chars_list.txt")


@pytest.fixture(scope="module")
def scut_dataset(tmp_path_factory):
    """Temp dataset layout over the 5 reference scans, duplicated to 8 rows
    so one full batch-8 AlignCollate pass runs (the loader drops partial
    batches, matching reference `dataset.py:44-45`)."""
    img_dir = os.path.join(REFERENCE_PATH, "images")
    manifest = os.path.join(img_dir, "scut_test_img_id_gt.txt")
    if not os.path.isfile(manifest) or not os.path.isfile(FULL_VOCAB):
        pytest.skip("SCUT manifest or full chars_list not present")
    root = str(tmp_path_factory.mktemp("scut"))
    os.makedirs(os.path.join(root, "test"))
    rows = []
    with open(manifest, encoding="utf-8") as f:
        base = [ln.rstrip("\n") for ln in f if ln.strip()]
    for i in range(8):  # 5 originals + 3 duplicates under fresh names
        name, label = base[i % len(base)].split(",", 1)
        if not os.path.splitext(name)[1]:  # manifest rows omit ".jpg"
            name += ".jpg"
        dup = f"{i}_{name}"
        shutil.copyfile(os.path.join(img_dir, name),
                        os.path.join(root, "test", dup))
        rows.append(f"{dup},{label}")
    with open(os.path.join(root, "test_img_id_gt.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(rows) + "\n")
    shutil.copyfile(FULL_VOCAB, os.path.join(root, "chars_list.txt"))
    return root, [r.split(",", 1)[1] for r in rows]


@pytest.fixture(scope="module")
def converted_full_ckpt(tmp_path_factory):
    """Full-scale (7375-class) reference-format ``.pth.tar``, random-init."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from models.handwritten_ctr_model import hctr_model as ref_model
    finally:
        sys.path.remove(REFERENCE_PATH)
    torch.manual_seed(0)
    m = ref_model(num_classes=7375).eval()
    path = str(tmp_path_factory.mktemp("ckpt") / "hctr_checkpoint.pth.tar")
    torch.save({"epoch": 0, "state_dict": m.state_dict(),
                "best_acc": 0.0, "optimizer": {}}, path)
    return path


def test_scut_batch8_benchmark(scut_dataset, converted_full_ckpt):
    import argparse

    from handwritten_chinese_ocr_samples_tpu.eval.driver import run_benchmark

    root, labels = scut_dataset
    args = argparse.Namespace(
        model_type="hctr", model_file=converted_full_ckpt, input=root,
        batch_size=8, benchmark_mode=True, decode_method="greedy-search",
        skip_search=False, kenlm_path="", use_tfm_pred=False, tfm_path="",
        use_tfm_score=False, beam_size=10, search_depth=10, lm_panelty=2.0,
        len_bonus=5.8, workers=2, test_verbose=True, print_freq=1,
        chars_list=os.path.join(root, "chars_list.txt"), host_beam=False)
    cer = run_benchmark(args)
    # Random weights: no accuracy claim, but the pipeline must produce a
    # well-defined corpus CER over all 8 real scans.
    assert np.isfinite(cer) and 0.0 <= cer <= 1.0
    assert sum(len(l) for l in labels) > 0
