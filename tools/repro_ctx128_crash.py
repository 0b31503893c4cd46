"""Minimal repro hunt: lm_ctx=128 kills the TPU worker (kernel fault).

Observed in round 1 (pre-Pallas) and round 2: the LM-fused beam search with
``lm_ctx=128`` reproducibly crashes the axon TPU worker, while
``lm_ctx=256`` is stable (NOTES.md Gotchas). This script isolates the
candidate components at L=128 in increasing complexity; run it on the TPU
and note which stage dies:

  1. peek_cache_attention kernel alone at L=128
  2. cache gather + masked OOB scatter at L=128
  3. _grouped_peek (kernel + XLA around it) at L=128
  4. a short scan of full LM-beam steps at L=128

Usage: python tools/repro_ctx128_crash.py [--ctx 128] [--stage N]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=128)
    ap.add_argument("--stage", type=int, default=0, help="0 = all")
    ap.add_argument("--rows", type=int, default=80)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        _grouped_peek)
    from handwritten_chinese_ocr_samples_tpu.lm.cached import CachedLM, \
        LMCache
    from handwritten_chinese_ocr_samples_tpu.lm.model import CharTransformerLM
    from handwritten_chinese_ocr_samples_tpu.ops.peek_attention import (
        peek_cache_attention)

    B, L = args.rows, args.ctx
    H, Dh, R, S1 = 8, 64, 21, 5
    rng = np.random.default_rng(0)

    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])

    if args.stage in (0, 1):
        q = jnp.asarray(rng.normal(size=(B, R * S1, H, Dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
        lengths = jnp.asarray(rng.integers(0, L, (B,)), jnp.int32)
        for i in range(20):
            out = peek_cache_attention(q, k, v, lengths)
        print(f"stage 1 (kernel L={L}): ok {sync(out):.3f}", flush=True)

    if args.stage in (0, 2):
        cache = LMCache(
            k=jnp.asarray(rng.normal(size=(6, B, L, H, Dh)), jnp.bfloat16),
            v=jnp.asarray(rng.normal(size=(6, B, L, H, Dh)), jnp.bfloat16),
            lengths=jnp.asarray(rng.integers(0, L, (B,)), jnp.int32))
        idx = jnp.asarray(rng.integers(0, B, (B,)), jnp.int32)
        kn = jnp.asarray(rng.normal(size=(6, B, H, Dh)), jnp.bfloat16)

        @jax.jit
        def gw(c, idx, kn, do):
            g = CachedLM.gather(c, idx)
            bi = jnp.arange(B)
            wpos = jnp.where(do, g.lengths, L)   # L = OOB drop sentinel
            return LMCache(
                k=g.k.at[:, bi, wpos].set(kn, mode="drop"),
                v=g.v.at[:, bi, wpos].set(kn, mode="drop"),
                lengths=jnp.where(do, g.lengths + 1, g.lengths))

        do = jnp.asarray(rng.integers(0, 2, (B,)) > 0)
        for i in range(20):
            cache = gw(cache, idx, kn, do)
        print(f"stage 2 (gather/scatter L={L}): ok {sync(cache.k):.3f}",
              flush=True)

    if args.stage in (0, 3, 4):
        model = CharTransformerLM(vocab_size=7377)
        params = jax.jit(model.init, static_argnames=("train",))(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 8), jnp.int32), train=False)["params"]
        clm = CachedLM(model, params, dtype=jnp.bfloat16)
        cache = clm.init_cache(B, L)
        cache = cache._replace(
            lengths=jnp.asarray(rng.integers(1, L // 2, (B,)), jnp.int32))
        tokens = jnp.asarray(rng.integers(4, 7377, (B, R, S1)), jnp.int32)
        n_tokens = jnp.full((B, R), S1, jnp.int32)
        next_logp = jnp.asarray(rng.normal(size=(B, 7377)), jnp.float32)

        peek = jax.jit(lambda c, t, n, nl: _grouped_peek(clm, c, t, n, nl))
        for i in range(10):
            out = peek(cache, tokens, n_tokens, next_logp)
        print(f"stage 3 (_grouped_peek L={L}): ok {sync(out):.3f}",
              flush=True)

    print("all requested stages survived", flush=True)


if __name__ == "__main__":
    main()
