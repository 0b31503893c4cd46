"""Width-axis (sequence-parallel) sharding: correctness on the CPU mesh.

Long text lines make the CTC time axis (pixel width) the natural sharding
dimension. These tests shard NHWC inputs over ``(data, model)`` =
(batch, width) and verify GSPMD produces the same numerics as unsharded
execution — halo exchanges for the 3x3 convs are XLA's job, not ours.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from handwritten_chinese_ocr_samples_tpu.models.hctr import HCTRModel
from handwritten_chinese_ocr_samples_tpu.parallel.mesh import (
    make_mesh, width_sharding,
)


def tiny_model(num_classes=12):
    return HCTRModel(num_classes=num_classes, backbone_channels=64,
                     num_blocks=(1, 1, 1, 1))


@pytest.fixture(scope="module")
def model_and_vars():
    model = tiny_model()
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, jnp.zeros((2, 128, 64, 1)),
        train=False)
    return model, variables


def test_width_sharded_forward_matches(model_and_vars):
    model, variables = model_and_vars
    assert jax.device_count() >= 4
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 128, 64, 1)).astype(np.float32)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    want = np.asarray(fwd(variables, jnp.asarray(x)))

    xs = jax.device_put(x, width_sharding(mesh))
    rep = NamedSharding(mesh, P())
    vs = jax.tree.map(lambda a: jax.device_put(a, rep), variables)
    with mesh:
        got = np.asarray(fwd(vs, xs))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_width_sharded_train_step_matches(model_and_vars):
    from handwritten_chinese_ocr_samples_tpu.train.step import (
        create_train_state, make_train_step)

    model = tiny_model()
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    B, W, L = 2, 64, 4
    rng = np.random.default_rng(1)
    batch = {
        "images": rng.uniform(-1, 1, (B, 128, W, 1)).astype(np.float32),
        "labels": rng.integers(1, 11, (B, L)).astype(np.int32),
        "label_paddings": np.zeros((B, L), np.float32),
        "widths": np.full((B,), W, np.int32),
    }
    step = make_train_step(donate=False)

    # unsharded oracle
    state0 = create_train_state(model, jax.random.key(0),
                                input_shape=(B, 128, W, 1))
    _, m0 = step(state0, {k: jnp.asarray(v) for k, v in batch.items()},
                 jax.random.key(2))
    want = float(m0["loss"])

    # width-sharded
    state1 = create_train_state(model, jax.random.key(0),
                                input_shape=(B, 128, W, 1))
    ws = width_sharding(mesh)
    bs = NamedSharding(mesh, P("data"))
    dev_batch = {
        "images": jax.device_put(batch["images"], ws),
        "labels": jax.device_put(batch["labels"], bs),
        "label_paddings": jax.device_put(batch["label_paddings"], bs),
        "widths": jax.device_put(batch["widths"], bs),
    }
    with mesh:
        _, m1 = step(state1, dev_batch, jax.random.key(2))
        got = float(m1["loss"])
    assert got == pytest.approx(want, rel=1e-4)


def test_head_tensor_parallel_padded(model_and_vars):
    """Head TP activation (VERDICT r3): with ``head_pad_multiple`` the
    (2048, padded) head kernel divides the ``model`` axis and
    ``param_shardings`` actually shards it; the padded model's logits are
    identical to its own unsharded run, its output width is still
    ``num_classes``, and the dead pad columns receive zero gradient."""
    from handwritten_chinese_ocr_samples_tpu.train.step import (
        create_train_state, make_train_step, param_shardings,
        shard_train_state)

    num_classes = 13                       # odd, like 7375
    model = HCTRModel(num_classes=num_classes, backbone_channels=64,
                      num_blocks=(1, 1, 1, 1), head_pad_multiple=8)
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    B, W, L = 2, 64, 4
    rng = np.random.default_rng(2)
    batch = {
        "images": rng.uniform(-1, 1, (B, 128, W, 1)).astype(np.float32),
        "labels": rng.integers(1, num_classes - 1, (B, L)).astype(np.int32),
        "label_paddings": np.zeros((B, L), np.float32),
        "widths": np.full((B,), W, np.int32),
    }

    state = create_train_state(model, jax.random.key(0),
                               input_shape=(B, 128, W, 1))
    kernel = state.params["linear"]["kernel"]
    assert kernel.shape[1] == 16           # 13 padded up to 8k
    specs = param_shardings(mesh, state.params)
    assert specs["linear"]["kernel"].spec == P(None, "model")

    # output contract: still num_classes wide
    logits = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         jnp.asarray(batch["images"]), train=False)
    assert logits.shape == (B, W, num_classes)

    step = make_train_step(donate=False)
    _, m0 = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                 jax.random.key(3))
    want = float(m0["loss"])

    state1 = create_train_state(model, jax.random.key(0),
                                input_shape=(B, 128, W, 1))
    state1 = shard_train_state(state1, mesh)
    bs = NamedSharding(mesh, P("data"))
    dev_batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
    with mesh:
        new_state, m1 = step(state1, dev_batch, jax.random.key(3))
        got = float(m1["loss"])
    assert got == pytest.approx(want, rel=1e-4)

    # pad columns are dead: one SGD step leaves them at (1-lr*wd)*w exactly
    # (weight decay only — no data gradient reaches them)
    w0 = np.asarray(kernel)[:, num_classes:]
    w1 = np.asarray(new_state.params["linear"]["kernel"])[:, num_classes:]
    ratio = w1 / w0
    np.testing.assert_allclose(ratio, ratio.flat[0], rtol=1e-5)
