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
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for b in range(2):
        n = int(np.asarray(l1)[b])
        np.testing.assert_array_equal(np.asarray(p1)[b, :n],
                                      np.asarray(p2)[b, :n])
