"""Offline skip-search calibration from dumped REAL posteriors.

Feeds on `tools/dump_posteriors.py` output and answers, without touching
the chip, the questions behind VERDICT r4 #2 (the 148-segment explosion on
the trained checkpoint):

  * how many frames are ambiguous (n_above > 1) at the reference prune
    log(0.001) vs calibrated tighter thresholds — and hence the segment
    count the device scan must pay (`count_segments` mirror);
  * where the ambiguity sits: adjacent-ambiguous run histogram (are the
    soft frames isolated per character or clustered at transitions?);
  * what (prune, run_max) pair minimizes the modeled scan cost.

The per-segment cost model is deliberately simple: a segment pays one
run-phase LM forward over ``run_max`` token slots plus (when it closes
with an ambiguous frame) one full-step peek over ``1 + peek_rows`` rows
of ``suffix+1`` tokens — both measured linear in their row counts at
production shape (`tools/profile_lm_step.py`, NOTES round 2/3).

Usage: python tools/calibrate_skip.py [--npz demo/full/posteriors.npz]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (  # noqa: E402
    count_segments)

BLANK = 0


def _stats_at(cand_vals, cand_idx, n_above_ref, unknown_id, prune_lp,
              ref_prune_lp, run_max):
    """Frame stats + segment counts at a prune threshold, derived from the
    top-K table. Exact for the fast/ambiguous split whenever the table
    holds every above-threshold class (true when n_above_ref <= K)."""
    K = cand_vals.shape[-1]
    if prune_lp <= ref_prune_lp:
        n_above = n_above_ref
    else:
        n_above = (cand_vals > prune_lp).sum(axis=-1).astype(np.int32)
        # frames where the reference count saturated K keep >= 2: the
        # fast/ambiguous decision never flips to "fast" by truncation
        n_above = np.where((n_above_ref > K) & (n_above <= 1), 2, n_above)
    segs = count_segments(cand_idx, n_above, unknown_id=unknown_id,
                          run_max=run_max)
    return n_above, segs


def ambiguous_run_hist(n_above, cand_idx, unknown_id, end_steps):
    """Histogram of consecutive-ambiguous-frame run lengths inside the
    search window (diagnoses whether coalescing adjacent ambiguous frames
    could pay)."""
    hist = {}
    B, T = n_above.shape
    for b in range(B):
        end = end_steps[b]
        amb = n_above[b, :end] > 1
        run = 0
        for t in range(end):
            if amb[t]:
                run += 1
            elif run:
                hist[run] = hist.get(run, 0) + 1
                run = 0
        if run:
            hist[run] = hist.get(run, 0) + 1
    return dict(sorted(hist.items()))


def end_steps_of(cand_idx, unknown_id, suffix_frames=4):
    B, T = cand_idx.shape[:2]
    out = np.zeros((B,), np.int64)
    for b in range(B):
        arg = cand_idx[b, :, 0]
        prev = np.concatenate([[-1], arg[:-1]])
        keep = (arg != BLANK) & (arg != unknown_id) & (arg != prev)
        out[b] = (min(int(np.max(np.where(keep, np.arange(T), -1)))
                      + suffix_frames, T) if keep.any() else 0)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="demo/full/posteriors.npz")
    ap.add_argument("--unknown-id", type=int, default=7374)
    ap.add_argument("--peek-rows", type=int, default=20)
    ap.add_argument("--suffix1", type=int, default=5)
    args = ap.parse_args()

    d = np.load(args.npz, allow_pickle=True)
    cand_vals, cand_idx = d["cand_vals"], d["cand_idx"]
    n_above_ref, labels = d["n_above"], d["labels"]
    uid = args.unknown_id
    ref_lp = float(np.log(0.001))
    ends = end_steps_of(cand_idx, uid)
    chars = np.array([len(s) for s in labels])

    print(f"{cand_vals.shape[0]} lines, T={cand_vals.shape[1]}, "
          f"chars/line mean {chars.mean():.1f}")
    print(f"ambiguous-run histogram at reference prune 0.001: "
          f"{ambiguous_run_hist(n_above_ref, cand_idx, uid, ends)}")

    # cost model constants: relative units per segment component
    run_cost = 8.0 / (args.peek_rows * args.suffix1)   # vs one peek row-tok
    print(f"\n{'prune':>8} {'run_max':>7} {'amb/char':>8} {'segs p50':>8} "
          f"{'segs max':>8} {'model cost':>10}")
    for prune in (0.001, 0.003, 0.01, 0.03, 0.05):
        for run_max in (4, 8, 16):
            n_above, segs = _stats_at(cand_vals, cand_idx, n_above_ref,
                                      uid, float(np.log(prune)), ref_lp,
                                      run_max)
            amb = sum(int(((n_above[b, :ends[b]]) > 1).sum())
                      for b in range(len(ends)))
            cost = segs.max() * (1.0 + run_cost * run_max)
            print(f"{prune:>8} {run_max:>7} {amb / chars.sum():>8.2f} "
                  f"{int(np.median(segs)):>8} {int(segs.max()):>8} "
                  f"{cost:>10.1f}")


if __name__ == "__main__":
    main()
