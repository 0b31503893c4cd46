"""Benchmark: LM-fused device beam search at production scale.

BASELINE config #5 (beam search + transformer LM, batch 32, w1200): the
reference's dominant inference bottleneck — a per-(sample, timestep) Python
loop with synchronous LM calls (`ctc_codec.py:183-285`, SURVEY.md §3.3).

Posteriors are synthesized at trained-model statistics (peaky: ~90% of
frames have a single class above the skip-search prune threshold; ~40-60
characters per 1200-frame line), which is the regime the reference's
skip-search was built for (`ctc_codec.py:124-181`).

Usage: python tools/bench_lm_beam.py [--group 8] [--budget 192]
       [--dtype bfloat16] [--batch 32] [--width 1200] [--iters 3]
       [--no-skip] [--lm-ctx 256]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NUM_CLASSES = 7375


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--budget", type=int, default=192)
    ap.add_argument("--lm-int8", action="store_true",
                    help="int8 FF/logits matmuls in the fused LM")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--lm-ctx", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-skip", action="store_true")
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--seg-budget", type=int, default=96)
    ap.add_argument("--runmax", type=int, default=8)
    ap.add_argument("--frame-budget", type=int, default=0,
                    help="no-skip mode: static frame-scan truncation "
                         "(0 = scan all T frames)")
    ap.add_argument("--peek-rows", type=int, default=-1,
                    help="peek-row compaction budget (-1 = auto via "
                         "count_peek_rows, 0 = off)")
    ap.add_argument("--ctx-ladder", type=int, default=112,
                    help="KV-context ladder first-rung depth (default 112, "
                         "0 = off); the rung length auto-sizes from the "
                         "sound count_ladder_segments bound")
    ap.add_argument("--fused-commit", action="store_true",
                    help="defer the run commit into the reorder write "
                         "(one cache pass per segment; exact)")
    ap.add_argument("--posteriors", default="",
                    help="replay REAL dumped posteriors "
                         "(tools/dump_posteriors.py .npz) instead of "
                         "synthetics: segment structure and timings are "
                         "exact (logits off the top-K are floor-filled, "
                         "so transcriptions are approximate — use "
                         "test.py for CER)")
    ap.add_argument("--lm", default="",
                    help="load a trained LM bundle (lm/io.load_lm dir) "
                         "instead of random-init weights")
    ap.add_argument("--prune", type=float, default=0.001,
                    help="skip-search ambiguity threshold (probability); "
                         "with --posteriors, n_above recomputes from the "
                         "dumped top-K at this value")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        count_kept_frames, count_ladder_segments, count_peek_rows,
        count_segments, make_id_tables,
        make_lm_beam_search)
    from handwritten_chinese_ocr_samples_tpu.lm.cached import CachedLM
    from handwritten_chinese_ocr_samples_tpu.lm.model import CharTransformerLM
    from handwritten_chinese_ocr_samples_tpu.lm.tokenizer import Tokenizer
    from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
        topk_logsoftmax)
    from handwritten_chinese_ocr_samples_tpu.utils.posteriors import (
        synth_peaky_logits)

    B, T, D = args.batch, args.width, NUM_CLASSES
    if args.posteriors:
        # real class ids need the real vocabulary (sibling data/ dir of
        # the dump, the demo/full layout)
        import os
        cl = os.path.join(os.path.dirname(os.path.abspath(args.posteriors)),
                          "data", "chars_list.txt")
        with open(cl, encoding="utf-8") as f:
            chars = "".join(ln.rstrip("\n") for ln in f if ln.strip())
        assert len(chars) + 2 == D, (len(chars), D)
    else:
        chars = "".join(chr(0x4E00 + i) for i in range(D - 2))
    codec = CTCCodec(chars)
    tokenizer = Tokenizer.from_characters(chars)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.lm:
        from handwritten_chinese_ocr_samples_tpu.lm.io import load_lm
        model, lm_vars, tokenizer = load_lm(args.lm, dtype=dtype)
        lm_params = lm_vars["params"]
    else:
        model = CharTransformerLM(vocab_size=tokenizer.vocab_size)
        lm_params = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 8), jnp.int32), train=False)["params"]
    clm = CachedLM(model, lm_params, dtype=dtype, quant_int8=args.lm_int8)
    c2l, l2c = make_id_tables(codec, tokenizer)

    skip = not args.no_skip
    prune_lp = float(np.log(args.prune))
    dev = jax.devices()[0]

    if args.posteriors:
        # replay the dumped REAL top-K tables: cost structure (segments,
        # peek rows, kept frames) is exact; full logits are floor-filled
        # off the top-K (only the ling_p gather of off-table LM proposals
        # sees the floor, a below-prune stand-in)
        d = np.load(args.posteriors, allow_pickle=True)
        n = d["cand_vals"].shape[0]
        sel = (np.arange(B) * max(1, n // B)) % n
        cvn = d["cand_vals"][sel, :T]
        cin = d["cand_idx"][sel, :T]
        blankn = d["blank_lp"][sel, :T]
        n_above_n = d["n_above"][sel, :T]
        K = cvn.shape[-1]
        if args.prune > 0.001:
            na = (cvn > prune_lp).sum(-1).astype(np.int32)
            n_above_n = np.where((n_above_n > K) & (na <= 1), 2, na)
        floor = np.float32(cvn.min() - 5.0)
        logits_np = np.full((B, T, D), floor, np.float32)
        np.put_along_axis(logits_np, cin.astype(np.int64), cvn, axis=-1)
        logz_np = np.zeros((B, T), np.float32)  # dumped vals are log-probs
        cv = jax.device_put(jnp.asarray(cvn), dev)
        ci = jax.device_put(jnp.asarray(cin), dev)
        blank_lp = jax.device_put(jnp.asarray(blankn), dev)
        n_above = jax.device_put(jnp.asarray(n_above_n), dev)
        logz = jax.device_put(jnp.asarray(logz_np), dev)
        logits = jax.device_put(jnp.asarray(logits_np), dev)
        print(f"replaying {B} of {n} dumped lines (T={T}, "
              f"prune {args.prune})", flush=True)
    else:
        print(f"synthesizing logits ({B}x{T}x{D})...", flush=True)
        logits_np = synth_peaky_logits(B, T, D)
        logits = jax.device_put(jnp.asarray(logits_np), dev)

        @jax.jit
        def prep(logits):
            cv, ci, blank_lp, n_above = topk_logsoftmax(
                logits, k=args.depth, prune=prune_lp)
            logz = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1)
            return cv, ci, logz, blank_lp, n_above

        cv, ci, logz, blank_lp, n_above = prep(logits)
    kept = count_kept_frames(np.asarray(ci), np.asarray(n_above),
                             unknown_id=codec.unknown_id)
    segs = count_segments(np.asarray(ci), np.asarray(n_above),
                          unknown_id=codec.unknown_id, run_max=args.runmax)
    print(f"kept frames/line: min {kept.min()} mean {kept.mean():.0f} "
          f"max {kept.max()} (budget {args.budget}); segments/line: "
          f"min {segs.min()} mean {segs.mean():.0f} max {segs.max()} "
          f"(seg budget {args.seg_budget})", flush=True)
    if skip and kept.max() > args.budget:
        print("WARNING: kept-frame budget overflow — results truncated")
    if skip and segs.max() > args.seg_budget:
        print("WARNING: segment budget overflow — results truncated")

    if args.peek_rows < 0:
        peek_rows = count_peek_rows(np.asarray(n_above), depth=args.depth,
                                    use_lm_pred=True) if skip else None
    else:
        peek_rows = args.peek_rows or None
    print(f"peek rows: {peek_rows} (of {2 * args.depth})")
    ladder = None
    if args.ctx_ladder and skip:
        if args.ctx_ladder >= args.lm_ctx:
            print(f"WARNING: --ctx-ladder {args.ctx_ladder} >= lm_ctx "
                  f"{args.lm_ctx} — ladder disabled")
        else:
            # cap inside the program's OWN segment count min(kept budget,
            # seg budget) — decode_one drops any rung at/past it, which
            # would silently time an unladdered program
            k1 = min(count_ladder_segments(
                np.asarray(ci), np.asarray(n_above), ctx1=args.ctx_ladder,
                unknown_id=codec.unknown_id, run_max=args.runmax),
                min(args.budget, args.seg_budget) - 1)
            if k1 >= 1:
                ladder = (k1, args.ctx_ladder)
            print(f"ladder: {ladder} (first k segments at the small rung)")
    group = args.group if B % args.group == 0 else 1
    if group != args.group:
        print(f"WARNING: batch {B} not divisible by group {args.group} "
              f"— running ungrouped")
    if args.fused_commit and not skip:
        print("WARNING: --fused-commit only applies to skip mode "
              "— ignored with --no-skip")
    fn = make_lm_beam_search(
        clm, c2l, l2c, beam_size=args.beam, depth=args.depth,
        unknown_id=codec.unknown_id, lm_panelty=0.8, len_bonus=4.8,
        lm_ctx=args.lm_ctx, use_lm_pred=True, skip_search=skip,
        prune=prune_lp,
        kept_budget=args.budget if skip else None,
        group_size=group,
        seg_budget=args.seg_budget if skip else None,
        run_max=args.runmax,
        peek_rows=peek_rows,
        return_overflow=True,
        ctx_ladder=ladder,
        fused_commit=args.fused_commit and skip,
        frame_budget=None if skip else (args.frame_budget or None))

    def run_once():
        if skip:
            prefixes, lengths, ovf = fn(cv, ci, logits, logz, blank_lp,
                                        n_above)
        else:
            prefixes, lengths, ovf = fn(cv, ci, logits, logz)
        if np.asarray(ovf).any():
            print("WARNING: LM-ctx/peek-row overflow on "
                  f"{int(np.asarray(ovf).sum())} lines — results truncated")
        return np.asarray(prefixes), np.asarray(lengths)

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    p, l = run_once()
    print(f"first run (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        p, l = run_once()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    texts = codec.compact_to_texts(p, l)
    print(f"decoded lens: {[len(t) for t in texts[:8]]}...")
    print(f"config: skip={skip} group={args.group} budget={args.budget} "
          f"dtype={args.dtype} lm_ctx={args.lm_ctx}")
    print(f"lines/sec/chip: {B / dt:.2f}  ({dt / B * 1000:.0f} ms/line, "
          f"batch {B} in {dt:.2f}s)")


if __name__ == "__main__":
    main()
