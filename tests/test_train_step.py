"""Train-step semantics + multi-chip dry run on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from handwritten_chinese_ocr_samples_tpu.models.hctr import HCTRModel
from handwritten_chinese_ocr_samples_tpu.train.step import (
    adjust_learning_rate, create_train_state, make_train_step,
)


def tiny_model(num_classes=12):
    """Same topology, scaled-down widths — keeps 1-core CPU compiles quick."""
    return HCTRModel(num_classes=num_classes, backbone_channels=64,
                     num_blocks=(1, 1, 1, 1))


@pytest.fixture(scope="module")
def tiny_state():
    model = tiny_model()
    state = create_train_state(model, jax.random.key(0),
                               input_shape=(2, 128, 32, 1), lr=0.01)
    return model, state


def _batch(B=2, W=32, L=4, num_classes=12, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": jnp.asarray(
            rng.uniform(-1, 1, (B, 128, W, 1)).astype(np.float32)),
        "labels": jnp.asarray(
            rng.integers(1, num_classes - 1, (B, L)).astype(np.int32)),
        "label_paddings": jnp.zeros((B, L), jnp.float32),
        "widths": jnp.full((B,), W, jnp.int32),
    }


def test_train_step_reduces_loss(tiny_state):
    _, state = tiny_state
    step = make_train_step(donate=False)
    batch = _batch()
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.key(2))
        losses.append(float(metrics["loss"]))
        assert float(metrics["skipped"]) == 0.0
    assert losses[-1] < losses[0]
    assert int(state.step) == 4


def test_lr_schedule(tiny_state):
    _, state = tiny_state
    base = 0.01
    for epoch, want in [(0, 0.01), (29, 0.01), (30, 0.001), (60, 0.0001)]:
        s = adjust_learning_rate(state, base, epoch)
        got = float(s.opt_state.hyperparams["learning_rate"])
        assert got == pytest.approx(want, rel=1e-6), epoch


def test_nonfinite_batch_skipped(tiny_state):
    """`main.py:411-415`: bad batches leave params untouched."""
    _, state = tiny_state
    step = make_train_step(donate=False)
    batch = _batch()
    bad = dict(batch)
    bad["images"] = batch["images"].at[0, 0, 0, 0].set(jnp.nan)
    p_before = jax.tree.leaves(state.params)[0]
    new_state, metrics = step(state, bad, jax.random.key(3))
    assert float(metrics["skipped"]) == 1.0
    p_after = jax.tree.leaves(new_state.params)[0]
    np.testing.assert_array_equal(np.asarray(p_before), np.asarray(p_after))
    # step counter still advances (the reference also counts skipped batches)
    assert int(new_state.step) == int(state.step) + 1


def test_multichip_sharded_train_step():
    """dp+tp train step over the 8-device virtual mesh (tiny model; the
    driver separately dry-runs the full model via __graft_entry__)."""
    from handwritten_chinese_ocr_samples_tpu.parallel.mesh import (
        batch_sharding, make_mesh)
    from handwritten_chinese_ocr_samples_tpu.train.step import (
        shard_train_state)

    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    model = tiny_model()
    B = 8
    state = create_train_state(model, jax.random.key(0),
                               input_shape=(B, 128, 32, 1))
    state = shard_train_state(state, mesh)
    batch = _batch(B=B)
    bs = batch_sharding(mesh)
    batch = {k: jax.device_put(v, bs) for k, v in batch.items()}
    step = make_train_step(donate=False)
    with mesh:
        state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_warm_start_from_stripped_artifact(tiny_state, tmp_path):
    """Resuming from a *stripped* serving artifact (params+batch_stats only,
    bf16 transport — `tools/make_fullsize_demo.py --step strip`) warm-starts:
    params restored (cast back to the train dtype), optimizer fresh, epoch 0.
    A full-checkpoint resume path is covered by the trainer e2e tests."""
    import orbax.checkpoint as ocp
    from handwritten_chinese_ocr_samples_tpu.train.checkpoint import (
        load_checkpoint)

    _, state = tiny_state
    stripped = {
        "epoch": 7,
        "best_acc": 0.83,
        "params": jax.tree.map(
            lambda a: np.asarray(a, jnp.bfloat16), state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }
    path = str(tmp_path / "stripped_checkpoint")
    ocp.PyTreeCheckpointer().save(path, stripped)

    new_state, epoch, best_acc = load_checkpoint(path, state)
    assert epoch == 0                      # LR schedule restarts
    assert best_acc == pytest.approx(0.83)
    for want, got in zip(jax.tree.leaves(state.params),
                         jax.tree.leaves(new_state.params)):
        assert got.dtype == want.dtype     # bf16 transport -> f32 training
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0.01, atol=1e-2)
    # optimizer state untouched (fresh moments)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(new_state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pool_impls_bit_identical():
    """`pool_impl="reshape"` must be a pure lowering change: identical
    forward logits AND identical gradients vs the reduce_window default
    (H is even at every pool site, windows never overlap)."""
    model_w = tiny_model()
    model_r = HCTRModel(num_classes=12, backbone_channels=64,
                        num_blocks=(1, 1, 1, 1), pool_impl="reshape")
    state = create_train_state(model_w, jax.random.key(0),
                               input_shape=(2, 128, 32, 1), lr=0.01)
    batch = _batch()

    def fwd(model):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], train=False)

    np.testing.assert_array_equal(np.asarray(fwd(model_w)),
                                  np.asarray(fwd(model_r)))

    def loss(model, params):
        logits = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["images"], train=False)
        return jnp.sum(jnp.tanh(logits))

    g_w = jax.grad(lambda p: loss(model_w, p))(state.params)
    g_r = jax.grad(lambda p: loss(model_r, p))(state.params)
    for a, b in zip(jax.tree.leaves(g_w), jax.tree.leaves(g_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
