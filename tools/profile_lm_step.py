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
    """Time a jitted fn. The fn is wrapped to reduce every output to ONE
    scalar on device — transferring real outputs would swamp the timing
    with D2H traffic (the TPU tunnel moves ~130 MB/s and a single sync
    costs ~30 ms; `block_until_ready` does not reliably block on axon)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def checksum(*a):
        out = fn(*a)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(x).astype(jnp.float32) for x in leaves
                   if hasattr(x, "dtype"))

    np.asarray(checksum(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = checksum(*args)
        np.asarray(out)
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
    ap.add_argument("--scan", type=int, default=0,
                    help="N>0: also time each component inside one "
                         "N-step lax.scan (amortizes the dispatch floor)")
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

    # ---- scan mode: true per-step device time. A single timed dispatch
    # sits on a ~26 ms host-sync latency floor (tunneled TPU), so each
    # component is iterated N times inside ONE lax.scan — the floor
    # amortizes away and the delta between runs isolates the component.
    N = args.scan
    if N:
        import jax

        def scanned(body, init_carry, *aux):
            # aux arrays are jit ARGUMENTS (closing over them would embed
            # them as constants in the HLO — hundreds of MB shipped to the
            # remote compiler)
            @jax.jit
            def run(c, *aux):
                c, _ = jax.lax.scan(lambda c, _: (body(c, *aux), ()), c,
                                    None, length=N)
                return jax.tree.map(
                    lambda x: jnp.sum(x).astype(jnp.float32)
                    if hasattr(x, "dtype") else 0.0, c)
            np.asarray(jax.tree.leaves(run(init_carry, *aux))[0])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(init_carry, *aux)
                np.asarray(jax.tree.leaves(out)[0])
                ts.append(time.perf_counter() - t0)
            return min(ts) / N

        def peek_body(c, cache, tokens, n_tokens):
            nl = c
            # tokens must depend on the carry: with loop-invariant inputs
            # XLA hoists the whole forward OUT of the scan and the timing
            # collapses to the tiny carry-dependent slice. The where's
            # predicate is data-dependent (never provably false) and its
            # taken branch always equals `tokens`.
            tokens = jnp.where(jnp.sum(nl) > NEGBIG, tokens, tokens + 1)
            tot, logp0, k0, v0 = _grouped_peek(clm, cache, tokens,
                                               n_tokens, nl)
            # fold FULL outputs back into the carry — consuming slices lets
            # XLA dead-code-eliminate the other rows' whole forward pass
            return (nl + jnp.sum(logp0, axis=1)
                    + (jnp.sum(tot, axis=1) + jnp.sum(k0) + jnp.sum(v0)
                       )[:, None])

        NEGBIG = -1e30
        t_peek_s = scanned(peek_body, next_logp, cache, tokens, n_tokens)

        def run_peek_body(c, cache, run_tokens, run_n):
            nl = c
            run_tokens = jnp.where(jnp.sum(nl) > NEGBIG, run_tokens,
                                   run_tokens + 1)
            tot, lp0, kf, vf, last = _grouped_peek(
                clm, cache, run_tokens, run_n, nl, full_kv=True,
                want_last=True)
            return (nl + last[:, 0] + (jnp.sum(tot) + jnp.sum(kf)
                                       + jnp.sum(vf))[None, None])

        run_tokens = jnp.asarray(rng.integers(4, V, (B, 1, 9)), jnp.int32)
        run_n = jnp.full((B, 1), 9, jnp.int32)
        t_run_s = scanned(run_peek_body, next_logp, cache, run_tokens,
                          run_n)

        def logits_body(c):
            lp = jax.nn.log_softmax(clm._logits(c), axis=-1)
            return c + lp[..., :512].astype(dtype)

        t_logits_s = scanned(logits_body, h)

        def gather_body(c, reorder, k_new):
            g = CachedLM.gather(c, reorder)
            bi = jnp.arange(B)
            return LMCache(k=g.k.at[:, bi, g.lengths].set(k_new, mode="drop"),
                           v=g.v.at[:, bi, g.lengths].set(k_new, mode="drop"),
                           lengths=g.lengths)

        t_gather_s = scanned(gather_body, cache, reorder, k_new)

        def gather_fused_body(c, reorder, k_new):
            g = CachedLM.gather_write(c, reorder, k_new, k_new, c.lengths)
            return g._replace(lengths=c.lengths)

        t_gatherf_s = scanned(gather_fused_body, cache, reorder, k_new)

        def sort_body(c):
            k1, k2, vv = c
            s1_, s2_, sv = jax.lax.sort((k1, k2, vv), num_keys=2)
            tk = jax.vmap(lambda x: jax.lax.top_k(x, 10)[0])(sv)
            return (s2_, s1_, sv.at[:, :10].add(tk))

        G = max(B // 10, 1)
        n_rows = 10 * (R - 1) + 10
        k1 = jnp.asarray(rng.integers(0, 1 << 30, (G, n_rows)), jnp.int32)
        k2 = jnp.asarray(rng.integers(0, 1 << 30, (G, n_rows)), jnp.int32)
        vv = jnp.asarray(rng.normal(size=(G, n_rows)), jnp.float32)
        t_sort_s = scanned(sort_body, (k1, k2, vv))

        print(f"-- scanned x{N} (true device time/step) --")
        print(f"peek          : {t_peek_s * 1e3:8.2f} ms")
        print(f"run peek(9tok): {t_run_s * 1e3:8.2f} ms")
        print(f"logits+lsm    : {t_logits_s * 1e3:8.2f} ms")
        print(f"cache gather  : {t_gather_s * 1e3:8.2f} ms")
        print(f"gather fused  : {t_gatherf_s * 1e3:8.2f} ms")
        print(f"sort+topk     : {t_sort_s * 1e3:8.2f} ms")

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
