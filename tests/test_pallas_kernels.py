"""Pallas kernels (interpret mode on CPU) vs XLA oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
    topk_logsoftmax, topk_logsoftmax_xla,
)


@pytest.mark.parametrize("shape,k", [((2, 17, 300), 5), ((1, 8, 128), 3),
                                     ((3, 9, 500), 10)])
def test_topk_logsoftmax_interpret(shape, k):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    v1, i1, b1, n1 = topk_logsoftmax(jnp.asarray(x), k=k, interpret=True)
    v2, i2, b2, n2 = topk_logsoftmax_xla(jnp.asarray(x), k=k)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_fused_beam_matches_unfused():
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.decode.beam_device import (
        beam_search_device, beam_search_from_topk)

    CHARS = "abcdefgh"
    codec = CTCCodec(CHARS)
    rng = np.random.default_rng(3)
    D = codec.num_classes
    logits = rng.normal(size=(2, 12, D)).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    p1, l1 = beam_search_device(logp, beam_size=4, depth=5,
                                unknown_id=codec.unknown_id)
    v, i, _b, _n = topk_logsoftmax(jnp.asarray(logits), k=5, interpret=True)
    p2, l2 = beam_search_from_topk(v, i, beam_size=4,
                                   unknown_id=codec.unknown_id)
    # dense O(rows^2) merge must decode identically to the sorted merge
    p3, l3 = beam_search_from_topk(v, i, beam_size=4,
                                   unknown_id=codec.unknown_id,
                                   dense_merge=True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l3))
    for b in range(2):
        n = int(np.asarray(l1)[b])
        np.testing.assert_array_equal(np.asarray(p1)[b, :n],
                                      np.asarray(p2)[b, :n])
        np.testing.assert_array_equal(np.asarray(p1)[b, :n],
                                      np.asarray(p3)[b, :n])


def test_peek_cache_attention_interpret():
    """Pallas peek-attention partials (interpret mode) == XLA oracle,
    including empty caches and merged full attention."""
    import jax
    import numpy as np
    from handwritten_chinese_ocr_samples_tpu.ops.peek_attention import (
        merge_partials, peek_cache_attention, peek_cache_attention_xla)

    rng = np.random.default_rng(0)
    B, N, H, Dh, L = 4, 10, 2, 8, 16
    q = jnp.asarray(rng.normal(size=(B, N, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, Dh)), jnp.float32)
    lengths = jnp.asarray([0, 3, L, 7], jnp.int32)

    o_p, m_p, l_p = peek_cache_attention(q, k, v, lengths, interpret=True)
    o_x, m_x, l_x = peek_cache_attention_xla(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_p), np.asarray(l_x),
                               rtol=1e-5, atol=1e-5)

    # merged with a second partial == dense softmax over the union
    k2 = jnp.asarray(rng.normal(size=(B, 4, H, Dh)), jnp.float32)
    v2 = jnp.asarray(rng.normal(size=(B, 4, H, Dh)), jnp.float32)
    o2, m2, l2 = peek_cache_attention_xla(
        q, k2, v2, jnp.full((B,), 4, jnp.int32))
    got = merge_partials(o_p, m_p, l_p, o2, m2, l2)

    kk = jnp.concatenate([k, k2], axis=1)
    vv = jnp.concatenate([v, v2], axis=1)
    s = jnp.einsum("bnhk,blhk->bnhl", q, kk)
    valid = jnp.concatenate(
        [jnp.arange(L)[None, :] < lengths[:, None],
         jnp.ones((B, 4), bool)], axis=1)
    s = jnp.where(valid[:, None, None, :], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bnhl,blhk->bnhk", w, vv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,V,d", [((2, 3, 4), 300, 64),
                                       ((37,), 777, 96),
                                       ((1, 5), 128, 32)])
def test_lse_rows_interpret(shape, V, d):
    """Streaming-LSE kernel (interpret mode) == XLA oracle, including
    row/vocab shapes that don't divide the tile sizes."""
    from handwritten_chinese_ocr_samples_tpu.ops.logits_lse import (
        lse_rows, target_logit, target_lse_xla)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=shape + (d,)), jnp.float32)
    emb = jnp.asarray(rng.normal(size=(V, d)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, size=shape), jnp.int32)

    lse = lse_rows(x, emb, block_rows=16, block_v=128, interpret=True)
    t = target_logit(x, emb, tgt)
    t_x, lse_x = target_lse_xla(x, emb, tgt)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_x),
                               rtol=1e-5, atol=1e-5)


def test_lse_rows_bf16_inputs():
    """bf16 activations/embedding accumulate in f32 like the XLA path."""
    from handwritten_chinese_ocr_samples_tpu.ops.logits_lse import (
        lse_rows, target_lse_xla)

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(9, 48)), jnp.bfloat16)
    emb = jnp.asarray(rng.normal(size=(260, 48)), jnp.bfloat16)
    tgt = jnp.zeros((9,), jnp.int32)
    lse = lse_rows(x, emb, block_rows=8, block_v=128, interpret=True)
    _, lse_x = target_lse_xla(x, emb, tgt)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_x),
                               rtol=1e-3, atol=1e-3)


def test_lse_rows_folded_emb_batched():
    """vmap over the EMBEDDING axis (x closed over) takes the sequential
    lane branch — the unbatched x must broadcast to the lanes, and the
    lane count must not be confused with x's row count."""
    from handwritten_chinese_ocr_samples_tpu.ops.logits_lse import (
        _lse_rows_folded, target_lse_xla)

    rng = np.random.default_rng(3)
    G, N, V, d = 3, 7, 90, 16     # N != G on purpose
    x = jnp.asarray(rng.normal(size=(N, d)), jnp.float32)
    embs = jnp.asarray(rng.normal(size=(G, V, d)), jnp.float32)
    got = jax.vmap(lambda e: _lse_rows_folded(x, e))(embs)
    for g in range(G):
        _, want = target_lse_xla(x, embs[g], jnp.zeros((N,), jnp.int32))
        np.testing.assert_allclose(np.asarray(got[g]), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_gather_write_kv_interpret():
    """DMA gather/patch kernel (interpret mode) == one-hot-matmul oracle,
    including no-write rows (wpos >= L) and identity reorders."""
    from handwritten_chinese_ocr_samples_tpu.lm.cached import (
        CachedLM, LMCache)
    from handwritten_chinese_ocr_samples_tpu.ops.cache_gather import (
        gather_write_kv)

    rng = np.random.default_rng(5)
    layers, B, L, H, Dh = 2, 6, 16, 2, 8
    k = jnp.asarray(rng.normal(size=(layers, B, L, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(layers, B, L, H, Dh)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(layers, B, H, Dh)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(layers, B, H, Dh)), jnp.float32)
    idx = jnp.asarray([3, 3, 0, 5, 4, 1], jnp.int32)
    # one row past the end (masked write), one identity row
    wpos = jnp.asarray([0, 7, L, 2, L - 1, L + 3], jnp.int32)
    lengths = jnp.asarray(rng.integers(0, L, size=(B,)), jnp.int32)

    cache = LMCache(k=k, v=v, lengths=lengths)
    want = CachedLM.gather_write_xla(cache, idx, kn, vn, wpos)
    got_k, got_v = gather_write_kv(k, v, idx, kn, vn, wpos)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want.k),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want.v),
                               rtol=1e-6, atol=1e-6)


def test_gather_write_kv_vmapped_interpret():
    """The grouped decoder vmaps gather_write over G lanes — the kernel
    must batch correctly (explicit-loop fallback for scalar prefetch)."""
    from handwritten_chinese_ocr_samples_tpu.lm.cached import (
        CachedLM, LMCache)
    from handwritten_chinese_ocr_samples_tpu.ops.cache_gather import (
        gather_write_kv)

    rng = np.random.default_rng(9)
    G, layers, B, L, H, Dh = 3, 2, 4, 8, 2, 8
    k = jnp.asarray(rng.normal(size=(G, layers, B, L, H, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(G, layers, B, L, H, Dh)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(G, layers, B, H, Dh)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(G, layers, B, H, Dh)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, B, size=(G, B)), jnp.int32)
    wpos = jnp.asarray(rng.integers(0, L + 2, size=(G, B)), jnp.int32)

    got_k, got_v = jax.vmap(gather_write_kv)(k, v, idx, kn, vn, wpos)
    for g in range(G):
        cache = LMCache(k=k[g], v=v[g],
                        lengths=jnp.zeros((B,), jnp.int32))
        want = CachedLM.gather_write_xla(cache, idx[g], kn[g], vn[g],
                                         wpos[g])
        np.testing.assert_allclose(np.asarray(got_k[g]),
                                   np.asarray(want.k), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_v[g]),
                                   np.asarray(want.v), rtol=1e-6, atol=1e-6)
