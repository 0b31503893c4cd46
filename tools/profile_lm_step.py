"""Decompose the LM-beam step cost: time each component in isolation.

Components at production shape (G items x BM beams, ctx, depth):
  * peek       — _grouped_peek forward (the LM FLOPs)
  * peek-noctx — peek with a length-0 cache (isolates cache-attention cost)
  * logits     — the final vocab projection + log_softmax alone
  * gather     — cache gather + masked write (beam reorder traffic)
  * sortmerge  — row sort + segmented logaddexp + top_k
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timed(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:1]
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=320,
                    help="G*BM flattened beams")
    ap.add_argument("--ctx", type=int, default=256)
    ap.add_argument("--r", type=int, default=21, help="peek rows per beam")
    ap.add_argument("--s1", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        _grouped_peek)
    from handwritten_chinese_ocr_samples_tpu.lm.cached import CachedLM, \
        LMCache
    from handwritten_chinese_ocr_samples_tpu.lm.model import CharTransformerLM

    V = 7377
    model = CharTransformerLM(vocab_size=V)
    params = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 8), jnp.int32), train=False)["params"]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    clm = CachedLM(model, params, dtype=dtype)

    B, R, S1, L = args.rows, args.r, args.s1, args.ctx
    rng = np.random.default_rng(0)
    cache = LMCache(
        k=jnp.asarray(rng.normal(size=(6, B, L, 8, 64)), dtype),
        v=jnp.asarray(rng.normal(size=(6, B, L, 8, 64)), dtype),
        lengths=jnp.full((B,), L // 2, jnp.int32))
    cache0 = cache._replace(lengths=jnp.zeros((B,), jnp.int32))
    tokens = jnp.asarray(rng.integers(4, V, (B, R, S1)), jnp.int32)
    n_tokens = jnp.full((B, R), S1, jnp.int32)
    next_logp = jnp.asarray(rng.normal(size=(B, V)), jnp.float32)

    peek = jax.jit(lambda c, t, n, nl: _grouped_peek(clm, c, t, n, nl))
    t_peek = timed(peek, cache, tokens, n_tokens, next_logp)
    t_peek0 = timed(peek, cache0, tokens, n_tokens, next_logp)

    # logits+log_softmax alone at peek token count
    h = jnp.asarray(rng.normal(size=(B, R, S1, 512)), dtype)

    @jax.jit
    def logits_only(h):
        return jax.nn.log_softmax(clm._logits(h), axis=-1)
    t_logits = timed(logits_only, h)

    # ff/qkv GEMM speed-of-light check at the same token count
    w1 = jnp.asarray(rng.normal(size=(512, 2048)), dtype)
    w2 = jnp.asarray(rng.normal(size=(2048, 512)), dtype)

    @jax.jit
    def ff_only(h):
        x = h
        for _ in range(6):
            x = jax.nn.relu(x @ w1) @ w2
        return x
    t_ff = timed(ff_only, h)

    # cache gather + masked write
    reorder = jnp.asarray(rng.integers(0, B, (B,)), jnp.int32)
    k_new = jnp.asarray(rng.normal(size=(6, B, 8, 64)), dtype)

    @jax.jit
    def gather_write(c, idx, kn):
        g = CachedLM.gather(c, idx)
        wpos = g.lengths
        bi = jnp.arange(B)
        return LMCache(k=g.k.at[:, bi, wpos].set(kn, mode="drop"),
                       v=g.v.at[:, bi, wpos].set(kn, mode="drop"),
                       lengths=g.lengths + 1)
    t_gather = timed(lambda *a: gather_write(*a).k, cache, reorder, k_new)

    # sort + merge + top_k at step row count (per group, vmapped)
    G = B // 10
    n_rows = 10 * (R - 1) + 10

    def one(keys1, keys2, vals):
        ks = jax.lax.sort((keys1, keys2, vals), num_keys=2)
        return jax.lax.top_k(ks[2], 10)[0]
    sm = jax.jit(jax.vmap(one))
    k1 = jnp.asarray(rng.integers(0, 1 << 30, (G, n_rows)), jnp.int32)
    k2 = jnp.asarray(rng.integers(0, 1 << 30, (G, n_rows)), jnp.int32)
    vv = jnp.asarray(rng.normal(size=(G, n_rows)), jnp.float32)
    t_sort = timed(sm, k1, k2, vv)

    tok = B * R * S1
    flops_layers = tok * (6 * (4 * 512 * 512 + 2 * 512 * 2048) * 2)
    flops_logits = tok * 512 * V * 2
    print(f"rows={B} R={R} S1={S1} ctx={L} dtype={args.dtype} "
          f"tokens/step={tok}")
    print(f"peek          : {t_peek * 1e3:8.2f} ms  "
          f"({(flops_layers + flops_logits) / t_peek / 1e12:.1f} TFLOPS)")
    print(f"peek ctx=0    : {t_peek0 * 1e3:8.2f} ms")
    print(f"logits+lsm    : {t_logits * 1e3:8.2f} ms  "
          f"({flops_logits / t_logits / 1e12:.1f} TFLOPS)")
    print(f"6x ff GEMMs   : {t_ff * 1e3:8.2f} ms  "
          f"({tok * 6 * 2 * 512 * 2048 * 2 * 2 / t_ff / 1e12:.1f} TFLOPS)")
    print(f"cache gather  : {t_gather * 1e3:8.2f} ms")
    print(f"sort+topk     : {t_sort * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
