"""Serving CLI — the reference's OpenVINO deploy entry (`deploy.py:21-63`)
re-targeted at AOT-compiled TPU executables.

    python -m handwritten_chinese_ocr_samples_tpu.cli.deploy \
        -lang hctr -m <export_dir or ckpt> -i image.jpg -ni 20
"""

from __future__ import annotations

import argparse
import logging as log
import os
import sys


def build_argparser():
    parser = argparse.ArgumentParser(description="TPU OCR serving")
    args = parser.add_argument_group("Options")
    args.add_argument("-lang", "--language", type=str, default="hctr",
                      choices=["hctr", "hctr-tiny"], help="model language/scenario tag")
    args.add_argument("-m", "--model", type=str, required=True, metavar="PATH",
                      help="checkpoint (orbax dir or .pth.tar)")
    args.add_argument("-i", "--input", type=str, required=True, metavar="PATH",
                      help="input image or folder")
    args.add_argument("-d", "--device", type=str, default="TPU",
                      help="target device (informational; TPU)")
    args.add_argument("-ni", "--number-iter", type=int, default=20,
                      help="number of inference iterations (latency avg)")
    args.add_argument("-b", "--batch-size", type=int, default=1,
                      help="folder inputs: serve in width-bucketed batches "
                           "of this size (throughput mode; 1 = the "
                           "reference's per-image loop)")
    args.add_argument("--daemon", action="store_true",
                      help="serve the input folder through the continuous "
                           "request-queue daemon (deadline batching)")
    args.add_argument("--max-delay-ms", type=float, default=50.0,
                      help="daemon mode: max per-request queueing latency")
    args.add_argument("--stdin", dest="stdin_stream", action="store_true",
                      help="daemon mode: run as a continuous service — "
                           "read image paths from stdin (one per line), "
                           "write 'path\\tprediction' to stdout as each "
                           "resolves; exits after EOF drains")
    args.add_argument("-cl", "--chars-list", type=str, default=None,
                      help="chars_list.txt path")
    args.add_argument("-w", "--widths", type=str, default="512,1024,1600",
                      help="comma-separated serving width buckets")
    args.add_argument("-dm", "--method", type=str, default="greedy-search",
                      choices=["greedy-search", "beam-search"],
                      help="decode method")
    # beam-search flags (parity with `deploy.py:40-61`)
    args.add_argument("-ss", "--skip-search", action="store_true")
    args.add_argument("-kp", "--kenlm-path", dest="kenlm_path", type=str,
                      default="")
    args.add_argument("-tp", "--tfm-path", dest="tfm_path", type=str,
                      default="")
    args.add_argument("-utp", "--use-tfm-pred", dest="use_tfm_pred",
                      action="store_true")
    args.add_argument("-uts", "--use-tfm-score", dest="use_tfm_score",
                      action="store_true")
    args.add_argument("-bs", "--beam-size", dest="beam_size", type=int,
                      default=10)
    args.add_argument("-sd", "--search-depth", dest="search_depth", type=int,
                      default=10)
    args.add_argument("-lp", "--lm-panelty", dest="lm_panelty", type=float,
                      default=1.9)
    args.add_argument("-lb", "--len-bonus", dest="len_bonus", type=float,
                      default=5.7)
    # device LM-fused search tuning (0 = auto-calibrate; decode/adaptive.py)
    args.add_argument("-lc", "--lm-ctx", dest="lm_ctx", type=int, default=0)
    args.add_argument("-g", "--lm-group", dest="lm_group", type=int,
                      default=8)
    args.add_argument("--seg-budget", dest="seg_budget", type=int, default=0)
    args.add_argument("--run-max", dest="run_max", type=int, default=8)
    args.add_argument("--prune", dest="prune", type=float, default=0.001,
                      metavar="P", help="skip-search ambiguity threshold "
                      "(probability; `ctc_codec.py:128` default)")
    args.add_argument("--ctx-ladder", dest="ctx_ladder", type=int,
                      default=112)
    args.add_argument("--fused-commit", dest="fused_commit",
                      action="store_true")
    args.add_argument("--lm-f32", dest="lm_f32", action="store_true")
    args.add_argument("--lm-int8", dest="lm_int8", action="store_true",
                      help="int8-quantize the fused LM's FF and logits "
                           "matmuls")
    args.add_argument("--int8", dest="int8", action="store_true",
                      help="post-training int8 quantization of the "
                           "recognizer convs (calibrated on the first "
                           "request; ~1.3x greedy serving on v5e)")
    return parser


def main():
    log.basicConfig(format="[ %(levelname)s ] %(message)s", level=log.INFO,
                    stream=sys.stdout)
    args = build_argparser().parse_args()

    import jax.numpy as jnp
    from ..core.codec import CTCCodec
    from ..eval.driver import load_recognizer_variables
    from ..models.registry import get_model_info
    from ..serve.engine import ServingEngine

    model, characters = get_model_info(
        args.language,
        data_dir=args.input if os.path.isdir(args.input) else None,
        chars_list_file=args.chars_list, dtype=jnp.bfloat16)
    codec = CTCCodec(characters)
    variables = load_recognizer_variables(args.model)

    # LM backend wiring mirrors `deploy.py:76-87` / `ctc_codec.py:101-122`.
    lm = None
    if args.method == "beam-search":
        from ..decode.lm_interface import build_lm_backend
        lm = build_lm_backend(
            tfm_path=args.tfm_path, kenlm_path=args.kenlm_path,
            use_tfm=args.use_tfm_pred or args.use_tfm_score)

    widths = tuple(int(w) for w in args.widths.split(","))
    log.info(f"Compiling serving executables for widths {widths} "
             f"({args.method})...")
    engine = ServingEngine(
        model, variables, codec, widths=widths,
        decode_method=args.method,
        beam_size=args.beam_size, search_depth=args.search_depth,
        lm_panelty=args.lm_panelty, len_bonus=args.len_bonus,
        lm=lm, use_lm_pred=args.use_tfm_pred,
        use_lm_score=args.use_tfm_score or bool(args.kenlm_path),
        skip_search=args.skip_search,
        lm_ctx=args.lm_ctx, lm_group=args.lm_group,
        seg_budget=args.seg_budget, run_max=args.run_max,
        ctx_ladder=args.ctx_ladder, fused_commit=args.fused_commit,
        prune=args.prune,
        lm_f32=args.lm_f32,
        lm_int8=args.lm_int8,
        int8=args.int8)

    if args.daemon and args.stdin_stream:
        return serve_stdin(engine, args)

    if os.path.isfile(args.input):
        files = [args.input]
        iters = args.number_iter
    else:
        files = [os.path.join(args.input, f)
                 for f in sorted(os.listdir(args.input))
                 if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))]
        iters = 1

    if args.daemon:
        import time
        from concurrent.futures import ThreadPoolExecutor
        from ..serve.daemon import ServingDaemon
        bs = max(args.batch_size, 1)
        with ServingDaemon(engine, batch_size=bs,
                           max_delay_ms=args.max_delay_ms) as daemon, \
                ThreadPoolExecutor(max_workers=8) as pool:
            t0 = time.time()
            futs = list(pool.map(daemon.submit, files))
            texts = [f.result() for f in futs]
            dt = time.time() - t0
        for f, t in zip(files, texts):
            log.info(f"Showing the prediction...\nfile:\t{f}\npred:\t{t}")
        log.info(f"Daemon throughput: {len(files) / dt:.2f} lines/sec "
                 f"(batch {bs}, deadline {args.max_delay_ms} ms)")
    elif args.batch_size > 1 and len(files) > 1:
        texts, lps = engine.infer_files_batched(
            files, batch_size=args.batch_size)
        for f, t in zip(files, texts):
            log.info(f"Showing the prediction...\nfile:\t{f}\npred:\t{t}")
        log.info(f"Batched throughput: {lps:.2f} lines/sec "
                 f"(batch {args.batch_size})")
    else:
        texts, avg_ms = engine.infer_files(files, iterations=iters)
        for f, t in zip(files, texts):
            log.info(f"Showing the prediction...\nfile:\t{f}\npred:\t{t}")
        log.info(f"Average throughput: {avg_ms} ms")


if __name__ == "__main__":
    main()


def serve_stdin(engine, args) -> None:
    """Continuous service loop: stdin paths -> stdout predictions.

    Each line of stdin is an image path, submitted to the deadline-
    batched daemon; each result prints as ``path\\tprediction`` (errors
    as ``path\\tERROR: ...``) the moment its future resolves, so
    downstream consumers can pipe. EOF stops intake; queued requests
    drain before exit. This is the long-running-service counterpart of
    the reference's one-shot deploy loop (`deploy.py:109-125`)."""
    import threading
    from ..serve.daemon import ServingDaemon

    out_lock = threading.Lock()

    def emit(path, fut):
        try:
            text = fut.result()
            line = f"{path}\t{text}"
        except Exception as e:  # noqa: BLE001 — report per-request
            line = f"{path}\tERROR: {e}"
        with out_lock:
            print(line, flush=True)

    bs = max(args.batch_size, 1)
    log.info(f"daemon ready (batch {bs}, deadline {args.max_delay_ms} ms); "
             f"reading image paths from stdin")
    with ServingDaemon(engine, batch_size=bs,
                       max_delay_ms=args.max_delay_ms) as daemon:
        for raw in sys.stdin:
            path = raw.strip()
            if not path:
                continue
            try:
                fut = daemon.submit(path)
            except Exception as e:  # unreadable file etc.
                with out_lock:
                    print(f"{path}\tERROR: {e}", flush=True)
                continue
            fut.add_done_callback(
                lambda f, p=path: emit(p, f))
    log.info("stdin closed; drained")
