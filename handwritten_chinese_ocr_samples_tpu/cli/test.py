"""Eval/inference CLI — flag surface mirrors the reference (`test.py:24-106`).

    # single image, greedy
    python -m handwritten_chinese_ocr_samples_tpu.cli.test \
        -m hctr -f <ckpt> -i image.jpg -dm greedy-search

    # benchmark CER on a test set
    python -m ...cli.test -m hctr -f <ckpt> -i <data_dir> -bm -b 32

    # beam search + JAX LM, grid search over (lm_panelty, len_bonus)
    python -m ...cli.test -m hctr -f <ckpt> -i <data_dir> -bm \
        -dm beam-search -utp -uts -tp <lm_dir> -gs

Accepts reference ``.pth.tar`` checkpoints directly (bit-parity eval runs).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_argparser():
    parser = argparse.ArgumentParser(description="TPU OCR textline testing")
    args = parser.add_argument_group("Options")
    args.add_argument("-m", "--model-type", dest="model_type", type=str,
                      required=True, choices=["hctr", "hctr-tiny", "innovation"],
                      help="target model for different languages/scenarios")
    args.add_argument("-f", "--model-file", dest="model_file", type=str,
                      metavar="PATH", required=True,
                      help="checkpoint: orbax dir or reference .pth.tar")
    args.add_argument("-i", "--input", dest="input", type=str,
                      metavar="PATH", required=True,
                      help="path to input image or testset")
    args.add_argument("-b", "--batch-size", dest="batch_size", type=int,
                      metavar="N", default=1, help="mini-batch size")
    args.add_argument("-bm", "--benchmark-mode", dest="benchmark_mode",
                      action="store_true",
                      help="benchmark CER on input testset")
    args.add_argument("-dm", "--decode-method", dest="decode_method",
                      type=str, default="beam-search",
                      choices=["greedy-search", "beam-search"],
                      help="method to decode the CTC output")
    args.add_argument("-ss", "--skip-search", dest="skip_search",
                      action="store_true",
                      help="skip high-confidence frames in beam search")
    args.add_argument("--prune", dest="prune", type=float, default=0.001,
                      metavar="P",
                      help="skip-search ambiguity threshold as a "
                           "probability (default 0.001 = the reference's "
                           "`ctc_codec.py:128`); a calibrated tighter "
                           "value (e.g. 0.01) keeps more frames on the "
                           "fast path when posteriors are soft")
    args.add_argument("-kp", "--kenlm-path", dest="kenlm_path", type=str,
                      metavar="PATH", default="",
                      help="ngram model for scoring in beam search")
    args.add_argument("-utp", "--use-tfm-pred", dest="use_tfm_pred",
                      action="store_true",
                      help="use transformer LM for candidate prediction")
    args.add_argument("-tp", "--transformer-path", dest="tfm_path", type=str,
                      metavar="DIR", default="",
                      help="path to JAX char-LM dir (dict.txt+config+weights)")
    args.add_argument("-uts", "--use-tfm-score", dest="use_tfm_score",
                      action="store_true",
                      help="use transformer LM for scoring in beam search")
    args.add_argument("-bs", "--beam-size", dest="beam_size", type=int,
                      default=10, help="beam size for beam search")
    args.add_argument("-sd", "--search-depth", dest="search_depth", type=int,
                      default=10, help="search depth (top-k) for beam search")
    args.add_argument("-lp", "--lm-panelty", dest="lm_panelty", type=float,
                      default=0.8, help="LM penalty for sentence scoring")
    args.add_argument("-lb", "--len-bonus", dest="len_bonus", type=float,
                      default=4.8, help="length bonus for sentence scoring")
    # device LM-fused search tuning (defaults = the tuned fast config;
    # 0 = auto-calibrate from the data, see decode/adaptive.py)
    args.add_argument("-lc", "--lm-ctx", dest="lm_ctx", type=int, default=0,
                      help="LM KV-cache context length (0 = auto-size from "
                           "the data and escalate on overflow)")
    args.add_argument("-g", "--lm-group", dest="lm_group", type=int,
                      default=8,
                      help="batch group size for the device LM-fused "
                           "skip-search (vmapped per group)")
    args.add_argument("--seg-budget", dest="seg_budget", type=int, default=0,
                      help="static max scanned segments per line in "
                           "skip-search (0 = auto-size per batch)")
    args.add_argument("--run-max", dest="run_max", type=int, default=8,
                      help="max char-fast frames per compacted segment")
    args.add_argument("--ctx-ladder", dest="ctx_ladder", type=int,
                      default=112,
                      help="KV-context ladder first-rung depth: scan the "
                           "early segments on a cache this deep before "
                           "climbing to the full context (default 112, "
                           "0 = off; exact — the rung length is sized per "
                           "batch from a sound bound)")
    args.add_argument("--fused-commit", dest="fused_commit",
                      action="store_true",
                      help="defer the run phase's KV-cache write into the "
                           "post-merge reorder pass (one full-cache pass "
                           "per segment instead of two; exact)")
    args.add_argument("--lm-f32", dest="lm_f32", action="store_true",
                      help="run the fused LM in float32 (default bfloat16)")
    args.add_argument("--lm-int8", dest="lm_int8", action="store_true",
                      help="int8-quantize the fused LM's FF and logits "
                           "matmuls (per-channel weight scales, dynamic "
                           "activation scale; attention/KV stay bf16)")
    args.add_argument("-dp", "--data-parallel", dest="data_parallel",
                      type=int, metavar="N", default=0,
                      help="shard eval batches over N devices (data-"
                           "parallel decode; 0 = single device)")
    args.add_argument("--int8", dest="int8", action="store_true",
                      help="post-training int8 quantization of the "
                           "recognizer convs (calibrated on the first "
                           "batch; ~1.9x conv throughput on v5e)")
    args.add_argument("-jw", "--workers", type=int, metavar="N", default=4,
                      help="number of data loading workers (benchmark mode)")
    args.add_argument("-tv", "--test-verbose", dest="test_verbose",
                      action="store_true",
                      help="print PRE/TRU pairs during testing")
    args.add_argument("-pf", "--print-freq", dest="print_freq", type=int,
                      metavar="N", default=100, help="log print frequency")
    args.add_argument("-cl", "--chars-list", dest="chars_list", type=str,
                      default=None,
                      help="explicit chars_list.txt path (same alias as "
                           "the deploy CLI)")
    args.add_argument("--host-beam", dest="host_beam", action="store_true",
                      help="force the host beam-search decoder (device "
                           "decoding is the default where supported)")
    args.add_argument("--profile", default="", metavar="DIR",
                      help="capture a jax.profiler trace of the run into "
                           "DIR (with -gs: first grid point only)")
    # hyper-param grid search (`test.py:92-105`)
    args.add_argument("-gs", "--grid-search", action="store_true",
                      help="grid search lm_panelty and len_bonus")
    args.add_argument("-al", "--alpha-lower", type=float, default=0.7)
    args.add_argument("-au", "--alpha-upper", type=float, default=1.1)
    args.add_argument("-ac", "--alpha-count", type=int, default=10)
    args.add_argument("-bl", "--beta-lower", type=float, default=4.2)
    args.add_argument("-bu", "--beta-upper", type=float, default=6.6)
    args.add_argument("-bc", "--beta-count", type=int, default=25)
    return parser


def run(args):
    from ..eval.driver import run_benchmark, run_single
    if args.benchmark_mode:
        return run_benchmark(args)
    return run_single(args)


def run_profiled(args):
    """Wrap one run in a jax.profiler trace when --profile is set."""
    if not getattr(args, "profile", ""):
        return run(args)
    from ..utils.profiling import profile_trace
    with profile_trace(args.profile):
        result = run(args)
    print(f"profiler trace -> {args.profile}")
    return result


def main():
    args = build_argparser().parse_args()
    if not args.grid_search:
        run_profiled(args)
        return
    # Grid search over (alpha=lm_panelty, beta=len_bonus), `test.py:349-382`.
    best = (None, None, float("inf"))
    first = True
    for alpha in np.linspace(args.alpha_lower, args.alpha_upper,
                             args.alpha_count):
        for beta in np.linspace(args.beta_lower, args.beta_upper,
                                args.beta_count):
            args.lm_panelty = float(alpha)
            args.len_bonus = float(beta)
            print(f"grid search: lm_panelty={alpha:.3f} len_bonus={beta:.3f}")
            cer = run_profiled(args) if first else run(args)
            first = False
            if cer is not None and cer < best[2]:
                best = (alpha, beta, cer)
    print(f"best: lm_panelty={best[0]} len_bonus={best[1]} CER={best[2]}")


if __name__ == "__main__":
    main()
