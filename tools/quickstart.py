#!/usr/bin/env python
"""Quickstart: end-to-end pipeline on a TPU VM (the reference's Colab
notebook flow, `colab_train.ipynb` cells 0-24, as a script).

Demo mode (no data needed — generates learnable synthetic text lines):
    python tools/quickstart.py --demo --out /tmp/hctr_demo --epochs 3

Real-data mode (CASIA-HWDB DGRL archives):
    python tools/quickstart.py --dgrl HWDB2.0Train.zip HWDB2.1Train.zip \
        --dgrl-test HWDB2.0Test.zip --out ./data/hwdb --epochs 90 -b 32

Steps: extract DGRL pages -> per-line PNGs + manifest -> 90/10 train/val
split (seed 42, like the reference) -> chars_list.txt -> train with periodic
eval + best-checkpoint tracking -> final greedy CER report.
"""

import argparse
import os
import shutil
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def build_demo_dataset(out_dir: str):
    sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))
    from util_synth import make_dataset
    make_dataset(out_dir, n_train=64, n_val=16, n_test=16, seed=42)
    print(f"demo dataset -> {out_dir}")


def build_from_dgrl(train_zips, test_zips, out_dir: str, height: int = 128):
    from handwritten_chinese_ocr_samples_tpu.data.prep.dgrl import dgrl2png
    from handwritten_chinese_ocr_samples_tpu.data.prep.flow import build_split

    os.makedirs(out_dir, exist_ok=True)
    train_dir = os.path.join(out_dir, "train")
    test_dir = os.path.join(out_dir, "test")
    manifests = []
    for z in train_zips:
        n, manifest = dgrl2png(z, train_dir, height)
        print(f"{z}: {n} lines")
        manifests.append(manifest)
    test_manifest = None
    for z in test_zips:
        n, test_manifest = dgrl2png(z, test_dir, height)
        print(f"{z}: {n} test lines")

    # 90/10 split; val images live in val/ (moved from train/)
    build_split(manifests, out_dir, val_fraction=0.1, seed=42,
                test_manifest=test_manifest)
    val_dir = os.path.join(out_dir, "val")
    os.makedirs(val_dir, exist_ok=True)
    with open(os.path.join(out_dir, "val_img_id_gt.txt")) as f:
        for line in f:
            name = line.split(",", 1)[0]
            src = os.path.join(train_dir, name)
            if os.path.exists(src):
                shutil.move(src, os.path.join(val_dir, name))

    # vocabulary from all labels
    chars = []
    seen = set()
    for manifest_name in ("train_img_id_gt.txt", "val_img_id_gt.txt",
                          "test_img_id_gt.txt"):
        p = os.path.join(out_dir, manifest_name)
        if not os.path.exists(p):
            continue
        with open(p, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split(",", 1)
                if len(parts) == 2:
                    for ch in parts[1]:
                        if ch not in seen:
                            seen.add(ch)
                            chars.append(ch)
    with open(os.path.join(out_dir, "chars_list.txt"), "w",
              encoding="utf-8") as f:
        for ch in chars:
            f.write(ch + "\n")
    print(f"vocabulary: {len(chars)} chars")


def main():
    ap = argparse.ArgumentParser(description="HCTR TPU quickstart")
    ap.add_argument("--demo", action="store_true",
                    help="use generated synthetic data")
    ap.add_argument("--dgrl", nargs="*", default=[],
                    help="DGRL train zips/dirs")
    ap.add_argument("--dgrl-test", nargs="*", default=[],
                    help="DGRL test zips/dirs")
    ap.add_argument("--out", default="./data/quickstart")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("-b", "--batch-size", type=int, default=8)
    ap.add_argument("-lr", type=float, default=0.001)
    ap.add_argument("--eval-artifact", action="store_true",
                    help="with --demo: skip training and evaluate the "
                         "committed convergence artifact (demo/checkpoint, "
                         "CER 0.0 on its test split — see demo/RESULTS.md)")
    args = ap.parse_args()

    if args.demo and args.eval_artifact:
        import subprocess
        import sys as _sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        raise SystemExit(subprocess.call(
            [_sys.executable, os.path.join(repo, "test.py"), "-m",
             "hctr-tiny", "-f", os.path.join(repo, "demo", "checkpoint"),
             "-i", os.path.join(repo, "demo", "data"),
             "-cl", os.path.join(repo, "demo", "data", "chars_list.txt"),
             "-bm", "-b", "8"]))

    if args.demo:
        build_demo_dataset(args.out)
    elif args.dgrl:
        build_from_dgrl(args.dgrl, args.dgrl_test, args.out)
    elif not os.path.isfile(os.path.join(args.out, "chars_list.txt")):
        ap.error("need --demo or --dgrl (or an already-prepared --out)")

    from handwritten_chinese_ocr_samples_tpu.models.registry import (
        get_model_info)
    from handwritten_chinese_ocr_samples_tpu.train.trainer import (
        Trainer, TrainerConfig)
    import jax.numpy as jnp

    model, characters = get_model_info("hctr", data_dir=args.out,
                                       dtype=jnp.bfloat16)
    print(f"vocab {len(characters)} -> {len(characters) + 2} classes")
    cfg = TrainerConfig(
        data=args.out, batch_size=args.batch_size, lr=args.lr,
        epochs=args.epochs, print_freq=10, val_freq=0, seed=42,
        out_dir=os.path.join(args.out, "ckpt"))
    trainer = Trainer(cfg, model, characters)
    trainer.fit()
    acc = trainer.evaluate("test")
    print(f"final greedy test accuracy (1-CER): {acc:.4f}")


if __name__ == "__main__":
    main()
