#!/usr/bin/env python
"""Full-size demo: train the 38M `hctr` (7375 classes) for real on TPU.

VERDICT r3 #1: every committed accuracy/perf number so far came from
`hctr-tiny` (200-class hard demo) and the config-#5 bench decoded
*synthesized* posteriors. This tool closes that gap at the reference's
own scale (`handwritten_ctr_model.py:157`: num_classes=7375;
`Debug_Notebook.ipynb`: ~38M params, max_width 1200):

* **Vocabulary**: 7373 chars = 3686 confusable pairs (+1 unused filler,
  mirroring rare vocabulary entries). Each *pair* renders as a unique
  high-contrast 12x3 block code (2^36 pattern space, uniqueness checked)
  — learnable exactly; the *member* within a pair is carried by one
  bottom mark strip whose intensity is drawn from overlapping Gaussians
  (member 0 ~ N(170,25), member 1 ~ N(106,25)) with ~10% visual Bayes
  error, exactly the hard demo's construction (tools/make_hard_demo.py)
  scaled to the full class count.
* **Text**: sparse bigram chain over pairs; the member within each
  allowed successor pair is a deterministic function of the previous
  character, so language context resolves what vision cannot.
* **Shapes**: 40-50 chars/line at 24 px/char -> widths 960-1200, the
  reference's production cap (`Debug_Notebook.ipynb` cells 5-6).
* **Pipeline**: the real `main.py` trainer (SGD, clip 5.0, step-LR),
  the real `lm/train.py` char transformer at the full 7373-char vocab
  (512d/6L — the exact decode-path LM config bench.py times), grid
  search via `test.py -gs` on a held-out tune split, then greedy vs
  `-dm beam-search -utp -uts -ss` CER through `test.py -bm`.

Artifacts (committed): demo/full/{data_test,checkpoint,lm,RESULTS.md}.
The train/val splits are deterministic (seed) and regenerated on demand
(`--step data`) to keep the repo lean; the committed checkpoint is
params+batch_stats only (bf16 params — the dtype the forward computes in).

Steps are independently invocable so training can run in the background:

    python tools/make_fullsize_demo.py --step data
    python tools/make_fullsize_demo.py --step train --epochs 80
    python tools/make_fullsize_demo.py --step lm
    python tools/make_fullsize_demo.py --step strip
    python tools/make_fullsize_demo.py --step grid
    python tools/make_fullsize_demo.py --step eval
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
FULL = os.path.join(REPO_ROOT, "demo", "full")

GROUPS = 3686
VOCAB = [chr(0x4E00 + i) for i in range(2 * GROUPS + 1)]   # 7373 chars
CELL = 24
IMG_H = 128
ROWS, COLS = 12, 3          # 36-block pair code, 2^36 pattern space
MARK_MU = (170, 106)        # member 0 / member 1 mark intensity means
MARK_SIGMA = 25
MIN_LEN, MAX_LEN = 40, 50   # 960-1200 px at CELL=24


# --------------------------------------------------------------- rendering
_PATTERNS = None


def _build_patterns() -> np.ndarray:
    """Deterministic unique 12x3 binary code per pair group."""
    out = np.zeros((GROUPS, ROWS, COLS), bool)
    seen = {}
    for g in range(GROUPS):
        salt = 0
        while True:
            p = (np.random.default_rng((123_456 + g) * 1_000 + salt)
                 .random((ROWS, COLS)) < 0.5)
            key = p.tobytes()
            if key not in seen and p.any() and not p.all():
                seen[key] = g
                out[g] = p
                break
            salt += 1
    return out


def patterns() -> np.ndarray:
    global _PATTERNS
    if _PATTERNS is None:
        _PATTERNS = _build_patterns()
    return _PATTERNS


def render_line(text: str, rng: np.random.Generator) -> np.ndarray:
    pats = patterns()
    img = np.full((IMG_H, CELL * len(text)), 255, dtype=np.uint8)
    for i, ch in enumerate(text):
        k = ord(ch) - 0x4E00
        g, m = divmod(k, 2)
        x0 = i * CELL
        pat = pats[g]
        for r in range(ROWS):
            y0 = 4 + r * 9
            for c in range(COLS):
                if pat[r, c]:
                    img[y0: y0 + 8, x0 + c * 8 + 1: x0 + (c + 1) * 8 - 1] = 20
        inten = rng.normal(MARK_MU[m], MARK_SIGMA)  # ambiguous member mark
        img[115:124, x0 + 3: x0 + CELL - 3] = int(np.clip(inten, 0, 230))
    return img


# ------------------------------------------------------------ text source
_SUCC = {}


def successors(prev_k: int, seed: int):
    """4 allowed successor pair-groups + probs; the member within each is a
    deterministic function of (prev char, pair). Memoized — the full vocab
    makes the per-call rng setup the sampling bottleneck otherwise."""
    key = (prev_k, seed)
    hit = _SUCC.get(key)
    if hit is None:
        crng = np.random.default_rng(seed * 77_777 + prev_k)
        groups = crng.choice(GROUPS, 4, replace=False)
        members = crng.integers(0, 2, 4)
        probs = crng.dirichlet(np.full(4, 1.5))
        hit = _SUCC[key] = (2 * groups + members, probs)
    return hit


def sample_line(rng: np.random.Generator, seed: int,
                min_len=MIN_LEN, max_len=MAX_LEN) -> str:
    L = int(rng.integers(min_len, max_len + 1))
    k = int(rng.integers(2 * GROUPS))     # filler char never sampled
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
    print(f"{root}/{phase}: {n} lines", flush=True)


def make_augmented_train(n_extra: int = 3600, aug_seed: int = 4242):
    """``data_aug/``: the committed splits plus ``n_extra`` regenerable
    extra train lines (VERDICT r4 #3 — the 60-epoch round-4 run plateaued
    at val acc 0.8405 vs the ~0.90 Bayes ceiling with only ~14 examples
    per class; more coverage of the 3686 pair codes is the lever).

    The extra lines come from an INDEPENDENT pixel rng stream (aug_seed)
    but the SAME text model (successors seed 42), so the committed
    val/test/tune splits and the trained LM's corpus distribution are
    untouched. Fully deterministic, so nothing new needs committing:
    images hardlink/copy from ``data/`` and the extras regenerate
    bit-identically on demand.
    """
    from PIL import Image
    src = os.path.join(FULL, "data")
    dst = os.path.join(FULL, "data_aug")
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(os.path.join(dst, "train"))
    shutil.copy(os.path.join(src, "chars_list.txt"), dst)
    for phase in ("val", "test"):
        os.makedirs(os.path.join(dst, phase))
        for name in os.listdir(os.path.join(src, phase)):
            _link_or_copy(os.path.join(src, phase, name),
                          os.path.join(dst, phase, name))
        shutil.copy(os.path.join(src, f"{phase}_img_id_gt.txt"), dst)
    lines = []
    with open(os.path.join(src, "train_img_id_gt.txt"),
              encoding="utf-8") as f:
        for ln in f:
            if ln.strip():
                lines.append(ln.strip())
                name = ln.split(",", 1)[0]
                _link_or_copy(os.path.join(src, "train", name),
                              os.path.join(dst, "train", name))
    rng = np.random.default_rng(aug_seed)
    for i in range(n_extra):
        text = sample_line(rng, 42)      # text-model seed matches the LM
        name = f"train_a{i:05d}.png"
        Image.fromarray(render_line(text, rng)).save(
            os.path.join(dst, "train", name))
        lines.append(f"{name},{text}")
        if (i + 1) % 600 == 0:
            print(f"augment: {i + 1}/{n_extra}", flush=True)
    with open(os.path.join(dst, "train_img_id_gt.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{dst}: {len(lines)} train lines "
          f"({n_extra} extra, aug_seed {aug_seed})", flush=True)
    return dst


def _link_or_copy(src: str, dst: str):
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy(src, dst)


def make_datasets(seed: int = 42, n_train=2400, n_val=100, n_test=150,
                  n_tune=100):
    """Deterministic: the SAME (seed, n) always regenerates identical data,
    so only the test/tune splits need committing."""
    rng = np.random.default_rng(seed)
    data = os.path.join(FULL, "data")
    tune = os.path.join(FULL, "data_tune")
    for root in (data, tune):
        if os.path.isdir(root):
            shutil.rmtree(root)
        os.makedirs(root)
        with open(os.path.join(root, "chars_list.txt"), "w",
                  encoding="utf-8") as f:
            f.write("\n".join(VOCAB) + "\n")
    # draw order matters for determinism: train, val, test, then tune
    write_split(data, "train", n_train, rng, seed)
    write_split(data, "val", n_val, rng, seed)
    write_split(data, "test", n_test, rng, seed)
    write_split(tune, "test", n_tune, rng, seed)
    return data, tune


# ------------------------------------------------------------------ steps
def run(cmd, **kw):
    print("+", " ".join(map(str, cmd)), flush=True)
    return subprocess.run(list(map(str, cmd)), cwd=REPO_ROOT, check=True,
                          **kw)


def train_recognizer(data, epochs, lr, batch=16, resume="", optimizer="adam",
                     lr_decay_epochs=None):
    out = os.path.join(FULL, "train_out")
    # Adam (the reference's own alternative optimizer path, `main.py:215` /
    # `innovation.py:235`): SGD at any tested lr left the 7375-class CTC
    # stuck at the uniform plateau (~8.7 = ln 7375) for 20+ epochs on this
    # corpus; Adam escapes it within a few epochs.
    if lr_decay_epochs is None:
        lr_decay_epochs = max(1, int(epochs) * 2 // 3)
    cmd = [sys.executable, "main.py", "-m", "hctr", "-d", data,
           "-b", batch, "-lr", lr, "-ep", epochs, "--lr-decay-epochs",
           lr_decay_epochs, "-j", "2", "--seed", "42",
           "--max-width", "1200", "--bucket-step", "128", "-pf", "50",
           "--optimizer", optimizer, "--out-dir", out]
    if resume:
        cmd += ["-re", resume]
    run(cmd)


def strip_checkpoint():
    """Commit-size artifact: params + batch_stats only (optimizer state
    stays in train_out). bf16 on disk is a TRANSPORT choice (halves the
    commit); every serving loader normalizes to f32 at load
    (``utils.ckpt_io.normalize_serving_dtype`` — bf16-stored leaves
    compile a ~7.7x slower forward, VERDICT r4 #1)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from handwritten_chinese_ocr_samples_tpu.utils.ckpt_io import (
        restore_pytree_host)
    out = os.path.join(FULL, "train_out")
    # Prefer the highest-acc best-copy (the reference evaluates its
    # `model_best.pth.tar`, `main.py:300` — not the last epoch's state);
    # fall back to the rolling `hctr_checkpoint` if no copy finalized.
    best = sorted(
        (d for d in os.listdir(out)
         if re.fullmatch(r"hctr_\d+ep_[\d.]+acc_checkpoint", d)),
        key=lambda d: float(d.split("_")[2][:-3]))
    if best:
        src = os.path.join(out, best[-1])
        print(f"stripping best copy {best[-1]}")
    else:
        src = os.path.join(out, "hctr_checkpoint")
        if not os.path.isdir(src):
            raise SystemExit(f"no finalized checkpoint under {out}")
    payload = restore_pytree_host(os.path.abspath(src))
    params = jax.tree.map(
        lambda a: (np.asarray(a, jnp.bfloat16)
                   if np.asarray(a).dtype == np.float32 else np.asarray(a)),
        payload["params"])
    slim = {
        "epoch": payload["epoch"],
        "best_acc": payload["best_acc"],
        "params": params,
        "batch_stats": payload["batch_stats"],
    }
    dst = os.path.abspath(os.path.join(FULL, "checkpoint"))
    if os.path.exists(dst):
        shutil.rmtree(dst)
    ocp.PyTreeCheckpointer().save(dst, slim)
    print(f"stripped checkpoint -> {dst}")


def train_lm(seed: int = 7, n_lines: int = 40000, epochs: int = 4):
    """Full-vocab (7373-char) char transformer at the decode-path config
    (512d/6L — what bench.py and the CLIs instantiate). VERDICT r3 #4."""
    from handwritten_chinese_ocr_samples_tpu.lm.io import save_lm
    from handwritten_chinese_ocr_samples_tpu.lm.train import train_char_lm
    rng = np.random.default_rng(seed)
    corpus = [sample_line(rng, 42) for _ in range(n_lines)]
    # max_len 160 (not 64): training cost is identical (batch seq rounds
    # to the longest line, 64) but decode's auto-ctx can then pick the
    # platform-proven STABLE_CTX=144 cache shape with the rung-112 ladder
    # (a 64-deep cache would leave the default ladder rung deeper than
    # the cache and only ~14 tokens of slack over a 50-char line).
    model, params, tok = train_char_lm(
        corpus, "".join(VOCAB), epochs=epochs, batch_size=64, max_len=160,
        d_model=512, n_layers=6, warmup_steps=300, log_every=100)
    lm_dir = os.path.join(FULL, "lm")
    if os.path.isdir(lm_dir):
        shutil.rmtree(lm_dir)
    # bf16 artifact (the decode path computes in bf16; halves the commit)
    import jax
    import jax.numpy as jnp
    params = jax.tree.map(
        lambda a: (np.asarray(a, jnp.bfloat16)
                   if np.asarray(a).dtype == np.float32 else np.asarray(a)),
        params)
    save_lm(lm_dir, model, params, tok)
    # held-out perplexity (the fairseq recipe's acceptance metric,
    # `third-party/README.md:95`: PPL ~29 on hwdb2x pages)
    held = [sample_line(rng, 42) for _ in range(512)]
    ppl = lm_perplexity(lm_dir, held)
    with open(os.path.join(lm_dir, "PPL.txt"), "w") as f:
        f.write(f"{ppl:.4f}\n")
    print(f"full-vocab LM -> {lm_dir}  held-out PPL {ppl:.2f}")
    return lm_dir, ppl


def lm_perplexity(lm_dir: str, lines) -> float:
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.lm.infer import LMScorer
    from handwritten_chinese_ocr_samples_tpu.lm.io import load_lm
    model, variables, tok = load_lm(lm_dir, dtype=jnp.bfloat16)
    return LMScorer(model, variables, tok).perplexity(lines)


def eval_cer(data, extra=(), batch=25):
    proc = run([sys.executable, "test.py", "-m", "hctr",
                "-f", os.path.join(FULL, "checkpoint"), "-i", data,
                "-cl", os.path.join(data, "chars_list.txt"),
                "-bm", "-b", batch, *extra],
               capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-600:])
    m = re.search(r"Total Test CER: ([0-9.e-]+)", proc.stdout)
    return float(m.group(1)) if m else float("nan")


def grid_search(tune, lm_args):
    proc = run([sys.executable, "test.py", "-m", "hctr",
                "-f", os.path.join(FULL, "checkpoint"), "-i", tune,
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


def write_results(greedy_cer, beam_cer, alpha, beta, tune_cer, ppl, epochs,
                  lr):
    with open(os.path.join(FULL, "RESULTS.md"), "w") as f:
        f.write("# Full-size demo: the 38M `hctr` trained for real\n\n")
        f.write(
            "The reference's headline (`Original_README.md:26-33`) is CER "
            "6.38 greedy -> 2.49 with CBS + transformer LM at 7,375 output "
            "classes. No CASIA-HWDB data exists in this environment, so "
            "this artifact reproduces the claim's *structure* at the "
            "reference's full model scale: 7373-char vocabulary (3686 "
            "confusable pairs with ~10% visual Bayes error on the pair-"
            "member mark), 40-50 chars/line at widths 960-1200, the real "
            "`main.py` trainer and `test.py` evaluator end to end. The "
            "committed checkpoint also supplies bench.py's config-#5 "
            "posteriors — the LM-fused decode timing runs on REAL trained "
            "posteriors, not synthetic statistics.\n\n")
        f.write("Regenerate: `python tools/make_fullsize_demo.py --step "
                "all` (several hours on one TPU chip). Re-evaluate the "
                "committed artifact: `python tools/make_fullsize_demo.py "
                "--step eval --skip-grid`.\n\n")
        f.write("| decode | test CER |\n|---|---|\n")
        f.write(f"| greedy (`test.py -bm -dm greedy-search`) | "
                f"**{greedy_cer:.4f}** |\n")
        f.write(f"| beam + LM (`test.py -bm -dm beam-search -utp -uts "
                f"-ss`) | **{beam_cer:.4f}** |\n\n")
        f.write(f"- grid search (`-gs` on the held-out tune split): "
                f"lm_panelty={alpha} len_bonus={beta} "
                f"(tune CER {tune_cer:.4f})\n")
        f.write(f"- recognizer: hctr (38M params, 7375 classes), main.py, "
                f"{epochs} epochs, Adam lr {lr} (`--optimizer adam` — the "
                f"reference's `main.py:215` path; SGD stalls on the "
                f"uniform CTC plateau here), batch 16, seed 42, "
                f"max_width 1200\n")
        f.write(f"- LM: first-party char transformer 512d/6L at the full "
                f"7373-char vocab (lm/train.py), held-out PPL "
                f"{ppl:.2f} (the fairseq recipe's acceptance metric, "
                f"`third-party/README.md:95`)\n")
        f.write("- data: 2400 train / 150 test / 100 tune lines, 40-50 "
                "chars each (seed 42); train/val regenerable via "
                "`--step data`; `--step augment` adds deterministic extra "
                "train lines (data_aug/, gitignored)\n")
        f.write(
            "\n## Scratch space\n\n"
            "`demo/full/train_out/` (gitignored, ~12 GB when present) "
            "holds the rolling orbax training state — full optimizer "
            "moments for the 38M model plus the best-epoch copies "
            "`hctr_{N}ep_{acc}acc_checkpoint` the trainer snapshots on "
            "every val improvement (`train/checkpoint.py` naming). It "
            "exists only on a machine that ran `--step train`; `--step "
            "strip` distills it into the committed `checkpoint/` (params "
            "+ batch_stats, bf16 transport; serving loaders normalize to "
            "f32 — see `utils/ckpt_io.py`). Safe to delete after "
            "stripping: `rm -rf demo/full/train_out`.\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", default="all",
                    choices=["data", "augment", "train", "lm", "strip",
                             "grid", "eval", "all"])
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--lr-decay-epochs", type=int, default=None)
    ap.add_argument("--optimizer", default="adam",
                    choices=["model", "sgd", "adam"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--resume", default="")
    ap.add_argument("--n-extra", type=int, default=3600,
                    help="extra train lines for --step augment")
    ap.add_argument("--train-data", default="",
                    help="override the train step's dataset root "
                         "(e.g. demo/full/data_aug from --step augment)")
    ap.add_argument("--skip-grid", action="store_true",
                    help="use the recorded (lm_panelty, len_bonus)")
    args = ap.parse_args()

    data = os.path.join(FULL, "data")
    tune = os.path.join(FULL, "data_tune")
    step = args.step

    if step in ("data", "all"):
        make_datasets()
    if step == "augment":
        make_augmented_train(n_extra=args.n_extra)
    if step in ("train", "all"):
        train_recognizer(args.train_data or data, args.epochs, args.lr,
                         args.batch, args.resume, args.optimizer,
                         args.lr_decay_epochs)
    ppl = float("nan")
    if step in ("lm", "all"):
        _, ppl = train_lm()
    if np.isnan(ppl):
        ppl_file = os.path.join(FULL, "lm", "PPL.txt")
        if os.path.exists(ppl_file):
            with open(ppl_file) as f:
                ppl = float(f.read().strip())
    if step in ("strip", "train", "all"):
        strip_checkpoint()

    if step in ("grid", "eval", "all"):
        results = os.path.join(FULL, "RESULTS.md")
        if args.skip_grid or step == "eval":
            with open(results) as f:
                text = f.read()
            m = re.search(r"lm_panelty=([\d.]+) len_bonus=([\d.]+)", text)
            alpha, beta = float(m.group(1)), float(m.group(2))
            mt = re.search(r"tune CER ([\d.]+|nan)", text)
            tune_cer = float(mt.group(1)) if mt else float("nan")
            mp = re.search(r"PPL ([\d.]+|nan)", text)
            if np.isnan(ppl) and mp:
                ppl = float(mp.group(1))
        else:
            alpha, beta, tune_cer = grid_search(
                tune, ("-utp", "-uts", "-tp", os.path.join(FULL, "lm")))
            print(f"grid best on tune: lm_panelty={alpha} len_bonus={beta} "
                  f"CER={tune_cer:.4f}")

        greedy_cer = eval_cer(data, ("-dm", "greedy-search"))
        print(f"greedy test CER: {greedy_cer:.4f}")
        beam_cer = eval_cer(
            data, ("-dm", "beam-search", "-utp", "-uts", "-ss",
                   "-tp", os.path.join(FULL, "lm"),
                   "-lp", str(alpha), "-lb", str(beta)))
        print(f"beam+LM test CER: {beam_cer:.4f}")
        write_results(greedy_cer, beam_cer, alpha, beta, tune_cer, ppl,
                      args.epochs, args.lr)
        print(json.dumps({"greedy_cer": greedy_cer,
                          "beam_lm_cer": beam_cer,
                          "lm_panelty": alpha, "len_bonus": beta,
                          "lm_ppl": ppl}))
        if not beam_cer < greedy_cer:
            raise SystemExit(
                f"beam+LM CER {beam_cer} did not beat greedy {greedy_cer}")


if __name__ == "__main__":
    main()
