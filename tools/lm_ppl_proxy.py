"""LM-quality proxy: real perplexity from the first-party LM pipeline.

The reference's transformer LM reports PPL ~29 on the HWDB2.x page corpus
after training on ~7 GB of news2016zh (`third-party/README.md:69,95`) —
that corpus is not available in this environment (zero egress). As a
verifiable stand-in, this trains `lm.train.train_char_lm` on a 90/10
split of the HWDB2.x page ground-truth corpus itself and reports held-out
perplexity computed the fairseq way (exp of mean per-token NLL, eos
included).

Measured (2026-08-17, d256/4L, 10 epochs, page-level split): held-out
PPL 3.5; untrained-model sanity PPL ~8050. The 3.5 is NOT comparable to
the fairseq 29: CASIA-HWDB2.x pages are a small set of source documents
copied by many writers, so held-out pages are textual near-duplicates of
training pages — while fairseq trained on out-of-domain news. What the
run validates is the pipeline: training converges, tokenizer eos-fill
semantics and scoring are sound, and the model generalizes (dev PPL far
below the untrained baseline, far above the memorized-train floor).

Usage:
  python tools/lm_ppl_proxy.py [--corpus PATH] [--epochs 10]
      [--d-model 256] [--layers 4] [--save DIR]

``--ngram N`` measures the first-party Witten-Bell estimator
(`lm/ngram_train.py`) on the same page-level split instead — the
counterpart of the reference recipe's kenlm 5-gram, scored as log10
perplexity with <s>/</s> the kenlm way. Host-only, no JAX. Measured
(2026-08-18): 5-gram held-out PPL 1.4 (36.8k 5-grams) — even lower than
the transformer's 3.5 because held-out pages are near-verbatim copies of
training pages and exact n-gram lookups exploit that perfectly; same
caveat as above, it validates the estimator pipeline, not news-domain
quality.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

DEFAULT_CORPUS = "/root/reference/third-party/hwdb2x_test_page_gt_space.txt"


def ngram_ppl(args):
    """Witten-Bell n-gram held-out perplexity on the page-level split."""
    import tempfile

    from handwritten_chinese_ocr_samples_tpu.lm.arpa import ArpaLM
    from handwritten_chinese_ocr_samples_tpu.lm.ngram_train import (
        train_ngram_arpa)

    pages = [line.strip() for line in open(args.corpus, encoding="utf-8")]
    pages = [p for p in pages if p]  # already char-spaced
    rng = np.random.default_rng(42)
    order = rng.permutation(len(pages))
    n_dev = max(1, len(pages) // 10)
    dev = [pages[i] for i in order[:n_dev]]
    train = [pages[i] for i in order[n_dev:]]
    print(f"corpus: {len(pages)} pages -> {len(train)} train / "
          f"{len(dev)} dev pages (page-level split)", flush=True)

    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     encoding="utf-8") as f:
        f.write("\n".join(train) + "\n")
        f.flush()
        with tempfile.NamedTemporaryFile(suffix=".arpa") as out:
            sizes = train_ngram_arpa(f.name, out.name, order=args.ngram)
            print(f"estimated: {sizes}", flush=True)
            lm = ArpaLM(out.name)
            tot = cnt = 0
            for page in dev:
                tot += lm.score(page)               # log10, incl </s>
                cnt += len(page.split()) + 1
            ppl = 10.0 ** (-tot / max(cnt, 1))
            print(f"held-out: {cnt} tokens, log10/token {tot / cnt:.4f}, "
                  f"PPL {ppl:.1f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=DEFAULT_CORPUS,
                    help="space-separated char corpus, one page per line")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max-len", type=int, default=256)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=250,
                    help="split pages into chunks of <= this many chars")
    ap.add_argument("--save", default="",
                    help="optional dir to save the trained LM bundle")
    ap.add_argument("--ngram", type=int, default=0, metavar="N",
                    help="measure the Witten-Bell N-gram estimator "
                         "instead of training the transformer")
    args = ap.parse_args()

    if args.ngram:
        return ngram_ppl(args)

    import jax
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.lm.train import (
        batches_from_corpus, train_char_lm)

    pages = [line.strip().replace(" ", "")
             for line in open(args.corpus, encoding="utf-8")]
    pages = [p for p in pages if p]

    def chunked(ps):
        out = []
        for p in ps:
            for i in range(0, len(p), args.chunk):
                c = p[i: i + args.chunk]
                if len(c) >= 4:
                    out.append(c)
        return out

    # split by PAGE before chunking — chunks of one page share content
    # and style, and splitting after chunking leaks them across the sets
    # (measured: PPL 3.0 with chunk-level split vs a sane page-level one)
    rng = np.random.default_rng(42)
    order = rng.permutation(len(pages))
    n_dev = max(1, len(pages) // 10)
    dev = chunked([pages[i] for i in order[:n_dev]])
    train = chunked([pages[i] for i in order[n_dev:]])
    chars = "".join(sorted({ch for li in train + dev for ch in li}))
    n_tok = sum(len(s) for s in train)
    print(f"corpus: {len(pages)} pages -> {len(train)} train / "
          f"{len(dev)} dev chunks (page-level split), vocab {len(chars)}, "
          f"~{n_tok / 1e3:.0f}k train chars", flush=True)

    model, params, tokenizer = train_char_lm(
        train, chars, epochs=args.epochs, batch_size=args.batch,
        max_len=args.max_len, lr=args.lr, warmup_steps=args.warmup,
        d_model=args.d_model, n_layers=args.layers, log_every=200)

    @jax.jit
    def nll_counts(params, toks, lengths):
        logits = model.apply({"params": params}, toks, train=False)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32),
                                  axis=-1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        L = nll.shape[1]
        mask = jnp.arange(L)[None, :] < (lengths[:, None] + 1)
        return jnp.sum(nll * mask), jnp.sum(mask)

    tot = cnt = 0.0
    for toks, lengths in batches_from_corpus(dev, tokenizer, 8,
                                             args.max_len, seed=0):
        s, c = nll_counts(params, toks, lengths)
        tot += float(s)
        cnt += float(c)
    ppl = float(np.exp(tot / max(cnt, 1)))
    print(f"held-out: {cnt:.0f} tokens, NLL/token {tot / cnt:.4f}, "
          f"PPL {ppl:.1f}")

    if args.save:
        from handwritten_chinese_ocr_samples_tpu.lm.io import save_lm
        save_lm(args.save, model, params, tokenizer)
        print(f"LM bundle -> {args.save}")


if __name__ == "__main__":
    main()
