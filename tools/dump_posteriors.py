"""Dump the trained checkpoint's REAL top-K posteriors to an .npz.

VERDICT r4 #2 diagnosis step: the LM-fused skip search auto-sized its
segment budget to 148 on the trained full-size checkpoint (vs 52 on the
synthetic trained-statistics posteriors, `utils/posteriors.py`) — ~3
ambiguous frames per character. Everything the segment scheduler and the
adaptive knobs consume derives from the top-K log-softmax table
(`ops/topk_logsoftmax`): candidate values/ids, the blank log-prob, and the
above-prune class count. Dumping that table for the committed test split
lets every calibration question — prune-threshold sweeps, run_max/seg
trade-offs, ambiguity-run histograms — run OFFLINE on CPU while the chip
trains (`count_segments`-style analysis needs no device).

n_above at the reference prune log(0.001) (`ctc_codec.py:128`) comes from
the op itself; for any TIGHTER prune p' it recomputes exactly from the
dumped top-K values as ``sum(vals > p')`` whenever the true count <= K
(the fast/ambiguous split only needs "== 1" vs ">= 2", which that bound
always decides correctly).

Usage: python tools/dump_posteriors.py [--out demo/full/posteriors.npz]
       (needs the chip; ~seconds per batch at b32/w1200)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402  (reuses the committed-artifact loaders)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(bench.FULL,
                                                  "posteriors.npz"))
    ap.add_argument("--depth", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.models.hctr import hctr_model
    from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
        topk_logsoftmax)

    loaded = bench._try_load_fullsize()
    if loaded is None:
        raise SystemExit("demo/full artifacts missing — nothing to dump")
    variables, _lm_dir, batches, _chars = loaded
    model = hctr_model(num_classes=bench.NUM_CLASSES, dtype=jnp.bfloat16)

    @jax.jit
    def prep(variables, x_u8):
        x = x_u8.astype(jnp.float32) / 255.0
        x = (x - 0.5) / 0.5
        logits = model.apply(variables, x, train=False)
        return topk_logsoftmax(logits, k=args.depth)

    outs = [jax.device_get(prep(variables, jnp.asarray(b)))
            for b in batches]
    cand_vals = np.concatenate([o[0] for o in outs]).astype(np.float32)
    cand_idx = np.concatenate([o[1] for o in outs]).astype(np.int32)
    blank_lp = np.concatenate([o[2] for o in outs]).astype(np.float32)
    n_above = np.concatenate([o[3] for o in outs]).astype(np.int32)

    manifest = os.path.join(bench.FULL, "data", "test_img_id_gt.txt")
    with open(manifest, encoding="utf-8") as f:
        rows = [ln.rstrip("\n").split(",", 1) for ln in f if ln.strip()]
    n = min(len(rows), cand_vals.shape[0])
    np.savez_compressed(
        args.out, cand_vals=cand_vals[:n], cand_idx=cand_idx[:n],
        blank_lp=blank_lp[:n], n_above=n_above[:n],
        names=np.array([r[0] for r in rows[:n]]),
        labels=np.array([r[1] for r in rows[:n]]))
    print(f"{args.out}: {n} lines, T={cand_vals.shape[1]}, "
          f"K={cand_vals.shape[2]}", flush=True)


if __name__ == "__main__":
    main()
