#!/usr/bin/env python
"""Build the hard demo artifact: proof that LM fusion buys accuracy.

The reference exists to turn greedy CER 6.38 into 2.49 with context beam
search + transformer LM (`Original_README.md:26-33`). Until real CASIA-HWDB
data is available in this environment, this artifact reproduces that claim
mechanically on a synthetic task engineered so that vision alone CANNOT
solve it but vision + language CAN:

* **Vocabulary**: 200 glyph classes = 100 confusable pairs. Each class
  renders as a strong per-pair stripe pattern (learnable exactly) plus one
  member-mark stripe whose intensity is drawn from overlapping Gaussians
  (pair member 0 ~ N(170, 25), member 1 ~ N(106, 25), redrawn per
  occurrence): the Bayes error of the member decision from pixels alone is
  ~10%, so greedy decoding is stuck near CER ~5-10% no matter how well the
  recognizer trains.
* **Text distribution**: a sparse bigram chain where each character allows
  4 successor *pairs* and the member within each successor pair is a
  deterministic function of the previous character. Language context
  therefore fully determines what vision cannot: an ideal LM removes all
  member-substitution errors.
* **Pipeline**: train hctr-tiny through the real `main.py`, train the
  first-party char transformer LM on text sampled from the same chain,
  grid-search (lm_panelty, len_bonus) with `test.py -gs` on a held-out
  tune split, then report greedy vs `-dm beam-search -utp -uts -ss` CER
  on the test split — both through `test.py -bm`.

Artifact layout (committed): demo/hard/{data,data_tune,checkpoint,lm,
RESULTS.md}. Re-evaluate without training:

    python tools/make_hard_demo.py --skip-train
"""

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
HARD = os.path.join(REPO_ROOT, "demo", "hard")

GROUPS = 100
VOCAB = [chr(0x4E00 + i) for i in range(2 * GROUPS)]
CELL = 24
STRIPES = 12
IMG_H = 128
MARK_MU = (170, 106)   # member 0 / member 1 stripe intensity means
MARK_SIGMA = 25


# --------------------------------------------------------------- rendering
def _stripe(img, s, x0, value):
    y0 = 6 + s * (IMG_H - 12) // STRIPES
    img[y0: y0 + 6, x0 + 3: x0 + CELL - 3] = value


def render_line(text: str, rng: np.random.Generator) -> np.ndarray:
    img = np.full((IMG_H, CELL * len(text)), 255, dtype=np.uint8)
    for i, ch in enumerate(text):
        k = ord(ch) - 0x4E00
        g, m = divmod(k, 2)
        grng = np.random.default_rng(10_000 + g)
        slots = grng.choice(STRIPES, 6, replace=False)
        x0 = i * CELL
        for s in slots[:5]:                       # pair pattern: exact
            _stripe(img, s, x0, 20)
        inten = rng.normal(MARK_MU[m], MARK_SIGMA)  # member mark: ambiguous
        _stripe(img, slots[5], x0, int(np.clip(inten, 0, 230)))
    return img


# ------------------------------------------------------------ text source
def successors(prev_k: int, seed: int):
    """4 allowed successor classes + probs; the member within each allowed
    pair is a deterministic function of (prev char, pair)."""
    crng = np.random.default_rng(seed * 77_777 + prev_k)
    groups = crng.choice(GROUPS, 4, replace=False)
    members = crng.integers(0, 2, 4)
    probs = crng.dirichlet(np.full(4, 1.5))
    return 2 * groups + members, probs


def sample_line(rng: np.random.Generator, seed: int,
                min_len=6, max_len=12) -> str:
    L = int(rng.integers(min_len, max_len + 1))
    k = int(rng.integers(len(VOCAB)))
    out = [k]
    for _ in range(L - 1):
        succ, p = successors(out[-1], seed)
        out.append(int(rng.choice(succ, p=p)))
    return "".join(VOCAB[k] for k in out)


def write_split(root: str, phase: str, n: int, rng, seed: int):
    pdir = os.path.join(root, phase)
    os.makedirs(pdir, exist_ok=True)
    from PIL import Image
    lines = []
    for i in range(n):
        text = sample_line(rng, seed)
        name = f"{phase}_{i:05d}.png"
        Image.fromarray(render_line(text, rng)).save(
            os.path.join(pdir, name))
        lines.append(f"{name},{text}")
    with open(os.path.join(root, f"{phase}_img_id_gt.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def make_datasets(seed: int = 42, n_train=1200, n_val=100, n_test=150,
                  n_tune=100):
    rng = np.random.default_rng(seed)
    data = os.path.join(HARD, "data")
    tune = os.path.join(HARD, "data_tune")
    for root in (data, tune):
        if os.path.isdir(root):
            shutil.rmtree(root)
        os.makedirs(root)
        with open(os.path.join(root, "chars_list.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(VOCAB) + "\n")
    write_split(data, "train", n_train, rng, seed)
    write_split(data, "val", n_val, rng, seed)
    write_split(data, "test", n_test, rng, seed)
    # the tune split doubles as that root's "test" phase so `test.py -gs`
    # can grid-search on held-out lines that are NOT the reported test set
    write_split(tune, "test", n_tune, rng, seed)
    return data, tune


# ------------------------------------------------------------------ steps
def run(cmd, **kw):
    print("+", " ".join(map(str, cmd)), flush=True)
    return subprocess.run(list(map(str, cmd)), cwd=REPO_ROOT, check=True,
                          **kw)


def train_recognizer(data, epochs, lr):
    out = os.path.join(HARD, "train_out")
    if os.path.isdir(out):
        shutil.rmtree(out)
    run([sys.executable, "main.py", "-m", "hctr-tiny", "-d", data,
         "-b", "16", "-lr", lr, "-ep", epochs, "--lr-decay-epochs",
         max(1, int(epochs) * 2 // 3), "-j", "2", "--seed", "42",
         "--max-width", "320", "--bucket-step", "64", "--out-dir", out])
    src = os.path.join(out, "hctr-tiny_checkpoint")
    dst = os.path.join(HARD, "checkpoint")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    shutil.rmtree(out)


def train_lm(seed: int = 7, n_lines: int = 8000, epochs: int = 3):
    from handwritten_chinese_ocr_samples_tpu.lm.io import save_lm
    from handwritten_chinese_ocr_samples_tpu.lm.train import train_char_lm
    rng = np.random.default_rng(seed)
    corpus = [sample_line(rng, 42) for _ in range(n_lines)]
    model, params, tok = train_char_lm(
        corpus, "".join(VOCAB), epochs=epochs, batch_size=64, max_len=64,
        d_model=128, n_layers=3, warmup_steps=200, log_every=200)
    lm_dir = os.path.join(HARD, "lm")
    if os.path.isdir(lm_dir):
        shutil.rmtree(lm_dir)
    save_lm(lm_dir, model, params, tok)
    return lm_dir


def train_ngram(order: int = 3, seed: int = 7, n_lines: int = 8000):
    """First-party n-gram over the same chain corpus (the reference's
    KenLM configuration, `ctc_codec.py:120-122` + third-party recipe; the
    corpus is deterministic, so this regenerates in seconds even under
    --skip-train). Order 3 keeps the committed binary small; the chain is
    second-order, so higher orders add bytes, not accuracy."""
    import tempfile
    from handwritten_chinese_ocr_samples_tpu.lm.hblm import build_hblm
    from handwritten_chinese_ocr_samples_tpu.lm.ngram_train import (
        train_ngram_arpa)
    rng = np.random.default_rng(seed)
    lm_dir = os.path.join(HARD, "lm")
    os.makedirs(lm_dir, exist_ok=True)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False,
                                     encoding="utf-8") as f:
        for _ in range(n_lines):
            f.write(" ".join(sample_line(rng, 42)) + "\n")
        corpus = f.name
    try:
        arpa = os.path.join(lm_dir, "ngram.arpa")
        hblm = os.path.join(lm_dir, "ngram.hblm")
        sizes = train_ngram_arpa(corpus, arpa, order=order, vocab=VOCAB)
        build_hblm(arpa, hblm)
        print(f"ngram LM -> {hblm} ({sizes})")
    finally:
        os.unlink(corpus)
    return hblm


def eval_cer(data, extra=()):
    proc = run([sys.executable, "test.py", "-m", "hctr-tiny",
                "-f", os.path.join(HARD, "checkpoint"), "-i", data,
                "-cl", os.path.join(data, "chars_list.txt"),
                "-bm", "-b", "25", *extra],
               capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-600:])
    m = re.search(r"Total Test CER: ([0-9.e-]+)", proc.stdout)
    return float(m.group(1)) if m else float("nan")


def grid_search(tune, lm_args):
    proc = run([sys.executable, "test.py", "-m", "hctr-tiny",
                "-f", os.path.join(HARD, "checkpoint"), "-i", tune,
                "-cl", os.path.join(tune, "chars_list.txt"),
                "-bm", "-b", "25", "-dm", "beam-search",
                "-ss", *lm_args, "-gs",
                "-al", "0.4", "-au", "1.6", "-ac", "4",
                "-bl", "0.0", "-bu", "4.0", "-bc", "3"],
               capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-400:])
    m = re.search(r"best: lm_panelty=([\d.]+) len_bonus=([\d.]+) "
                  r"CER=([\d.e-]+)", proc.stdout)
    if not m:
        raise RuntimeError("grid search produced no best line:\n"
                           + proc.stdout[-3000:])
    return float(m.group(1)), float(m.group(2)), float(m.group(3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--skip-train", action="store_true",
                    help="re-evaluate the committed artifact only")
    ap.add_argument("--skip-grid", action="store_true",
                    help="use the recorded (lm_panelty, len_bonus)")
    args = ap.parse_args()

    data = os.path.join(HARD, "data")
    tune = os.path.join(HARD, "data_tune")
    if not args.skip_train:
        make_datasets()
        print(f"hard demo datasets -> {data}")
        train_recognizer(data, args.epochs, args.lr)
        lm_dir = train_lm()
    else:
        lm_dir = os.path.join(HARD, "lm")

    ngram_path = train_ngram()  # deterministic corpus: always regenerable

    greedy_cer = eval_cer(data, ("-dm", "greedy-search"))
    print(f"greedy test CER: {greedy_cer:.4f}")

    if args.skip_grid:
        with open(os.path.join(HARD, "RESULTS.md")) as f:
            text = f.read()
        m = re.search(r"lm_panelty=([\d.]+) len_bonus=([\d.]+)", text)
        alpha, beta = float(m.group(1)), float(m.group(2))
        mn = re.search(r"ngram lm_panelty=([\d.]+) len_bonus=([\d.]+)",
                       text)
        ng_alpha, ng_beta = ((float(mn.group(1)), float(mn.group(2)))
                             if mn else (1.0, 0.5))
        # keep the recorded tune CERs — a skip-grid re-eval should not
        # degrade the committed artifact to nan
        mt = re.findall(r"tune CER ([\d.]+|nan)", text)
        tune_cer = float(mt[0]) if mt else float("nan")
        ng_tune_cer = float(mt[1]) if len(mt) > 1 else float("nan")
    else:
        alpha, beta, tune_cer = grid_search(
            tune, ("-utp", "-uts", "-tp", lm_dir))
        print(f"grid best on tune: lm_panelty={alpha} len_bonus={beta} "
              f"CER={tune_cer:.4f}")
        ng_alpha, ng_beta, ng_tune_cer = grid_search(
            tune, ("-kp", ngram_path))
        print(f"ngram grid best on tune: lm_panelty={ng_alpha} "
              f"len_bonus={ng_beta} CER={ng_tune_cer:.4f}")

    beam_cer = eval_cer(data, ("-dm", "beam-search", "-utp", "-uts", "-ss",
                               "-tp", lm_dir, "-lp", str(alpha),
                               "-lb", str(beta)))
    print(f"beam+LM test CER: {beam_cer:.4f}")

    ngram_cer = eval_cer(data, ("-dm", "beam-search", "-ss",
                                "-kp", ngram_path, "-lp", str(ng_alpha),
                                "-lb", str(ng_beta)))
    print(f"beam+ngram test CER: {ngram_cer:.4f}")

    with open(os.path.join(HARD, "RESULTS.md"), "w") as f:
        f.write("# Hard demo: LM fusion improves accuracy\n\n")
        f.write("Synthetic stand-in for the reference's headline claim "
                "(`Original_README.md:26-33`: CER 6.38 greedy -> 2.49 with "
                "CBS + transformer LM): 200 glyph classes in 100 "
                "confusable pairs whose member mark has ~10% visual Bayes "
                "error, text from a sparse bigram chain in which context "
                "determines the member exactly. Vision alone cannot beat "
                "the mark's Bayes error; vision + LM can.\n\n")
        f.write("Regenerate: `python tools/make_hard_demo.py` (~10 min on "
                "one TPU chip). Re-evaluate the committed artifact: "
                "`python tools/make_hard_demo.py --skip-train "
                "--skip-grid`.\n\n")
        f.write("| decode | test CER |\n|---|---|\n")
        f.write(f"| greedy (`test.py -bm -dm greedy-search`) | "
                f"**{greedy_cer:.4f}** |\n")
        f.write(f"| beam + LM (`test.py -bm -dm beam-search -utp -uts -ss`)"
                f" | **{beam_cer:.4f}** |\n")
        f.write(f"| beam + n-gram (`test.py -bm -dm beam-search -ss "
                f"-kp lm/ngram.hblm`) | **{ngram_cer:.4f}** |\n\n")
        f.write(f"- grid search (`-gs` on the held-out tune split): "
                f"lm_panelty={alpha} len_bonus={beta} "
                f"(tune CER {tune_cer:.4f}); "
                f"ngram lm_panelty={ng_alpha} len_bonus={ng_beta} "
                f"(tune CER {ng_tune_cer:.4f})\n")
        f.write(f"- recognizer: hctr-tiny, main.py, {args.epochs} epochs, "
                f"lr {args.lr}, batch 16, seed 42\n")
        f.write("- LM: first-party char transformer (128d/3L), 8k lines "
                "sampled from the same bigram chain; n-gram: first-party "
                "Witten-Bell trigram (cli/lm_train_ngram) on the same "
                "corpus, binarized to HBLM\n")
        f.write(f"- data: 1200 train / 150 test / 100 tune lines, "
                f"6-12 chars each (seed 42)\n")
    print(json.dumps({"greedy_cer": greedy_cer, "beam_lm_cer": beam_cer,
                      "beam_ngram_cer": ngram_cer,
                      "lm_panelty": alpha, "len_bonus": beta,
                      "ngram_lm_panelty": ng_alpha,
                      "ngram_len_bonus": ng_beta}))
    if not beam_cer < greedy_cer:
        raise SystemExit(
            f"beam+LM CER {beam_cer} did not beat greedy {greedy_cer}")
    if not ngram_cer < greedy_cer:
        raise SystemExit(
            f"beam+ngram CER {ngram_cer} did not beat greedy {greedy_cer}")


if __name__ == "__main__":
    main()
