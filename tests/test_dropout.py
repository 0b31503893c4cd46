"""Recompute-in-backward dropout (`ops/dropout.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handwritten_chinese_ocr_samples_tpu.ops.dropout import dropout_recompute


def test_forward_mask_and_scale():
    key = jax.random.key(3)
    x = jnp.ones((64, 128), jnp.float32)
    y = np.asarray(dropout_recompute(x, key, 0.3))
    # every element is either dropped or scaled by exactly 1/(1-rate)
    uniq = np.unique(y)
    assert len(uniq) == 2 and uniq[0] == 0.0
    np.testing.assert_allclose(uniq[1], 1 / 0.7, rtol=1e-6)
    # realized keep rate within 5% absolute of requested at this sample size
    assert abs((y != 0).mean() - 0.7) < 0.05


def test_backward_uses_identical_mask():
    key = jax.random.key(7)
    x = jax.random.normal(jax.random.key(0), (33, 257), jnp.float32)

    def f(x):
        return jnp.sum(dropout_recompute(x, key, 0.5) * 3.0)

    y = dropout_recompute(x, key, 0.5)
    g = jax.grad(f)(x)
    # grad is 3*scale where kept, 0 where dropped — same mask both ways
    np.testing.assert_allclose(np.asarray(g) != 0, np.asarray(y) != 0)
    kept = np.asarray(y) != 0
    np.testing.assert_allclose(np.asarray(g)[kept], 3.0 / 0.5, rtol=1e-6)


def test_deterministic_under_key_and_distinct_across_keys():
    x = jnp.ones((16, 64), jnp.bfloat16)
    a = np.asarray(dropout_recompute(x, jax.random.key(1), 0.9))
    b = np.asarray(dropout_recompute(x, jax.random.key(1), 0.9))
    c = np.asarray(dropout_recompute(x, jax.random.key(2), 0.9))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


@pytest.mark.parametrize("rate", [0.1, 0.9])
def test_high_rate_keep_fraction(rate):
    key = jax.random.key(11)
    x = jnp.ones((256, 512), jnp.float32)
    y = np.asarray(dropout_recompute(x, key, rate))
    assert abs((y != 0).mean() - (1 - rate)) < 0.01


def test_model_train_step_runs_and_is_deterministic():
    """The hctr backbone's dropout sites route through the new op; the
    jitted value+grad must be reproducible under a fixed dropout key."""
    from handwritten_chinese_ocr_samples_tpu.models.hctr import HCTRModel

    model = HCTRModel(num_classes=37, backbone_channels=128,
                      num_blocks=(1, 1, 1, 1))
    x = jax.random.normal(jax.random.key(0), (2, 128, 64, 1))
    variables = model.init({"params": jax.random.key(1)}, x, train=False)

    @jax.jit
    def loss(params, drop_key):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": drop_key})
        return jnp.sum(logits.astype(jnp.float32) ** 2) * 1e-6

    vg = jax.jit(jax.value_and_grad(loss))
    l1, g1 = vg(variables["params"], jax.random.key(5))
    l2, g2 = vg(variables["params"], jax.random.key(5))
    assert np.asarray(l1) == np.asarray(l2)
    gleaf1 = jax.tree.leaves(g1)[0]
    gleaf2 = jax.tree.leaves(g2)[0]
    np.testing.assert_array_equal(np.asarray(gleaf1), np.asarray(gleaf2))
    assert np.isfinite(np.asarray(l1))


def test_rate_one_drops_everything():
    """nn.Dropout semantics at rate=1.0: all zeros, no division by zero."""
    from handwritten_chinese_ocr_samples_tpu.models.hctr import _Dropout
    y = _Dropout(1.0).apply({}, jnp.ones((4, 8)), deterministic=False,
                            rngs={"dropout": jax.random.key(0)})
    assert np.all(np.asarray(y) == 0.0)
