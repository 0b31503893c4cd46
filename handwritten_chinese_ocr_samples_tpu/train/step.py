"""Jitted train/eval steps and optimizer construction.

Training semantics mirror the reference trainer (`main.py:180-475`):

  * optimizer selected by the model's ``optimizer`` attribute — SGD with
    momentum + weight decay, or Adam (`main.py:209-218`);
  * gradient clipping by global norm 5.0 (`main.py:430-431`);
  * step-decay LR: ``lr * 0.1 ** (epoch // 30)`` (`main.py:579-584`), applied
    per epoch via ``adjust_learning_rate`` on an ``inject_hyperparams``
    optimizer;
  * non-finite-loss batches are skipped — gradients discarded, parameters and
    optimizer state unchanged (`main.py:411-415`), implemented branchlessly
    with a ``jnp.where`` over the state tree;
  * BatchNorm statistics are per-replica (torch DDP does not sync BN;
    SURVEY.md §7 hard part 5) — the ``batch_stats`` collection is updated
    locally and only the gradients are averaged over the ``data`` axis.

TPU-first differences: one fused ``jax.jit`` step (forward + CTC + backward +
update) per width bucket, bf16 activations with f32 CTC numerics, gradient
all-reduce emitted by XLA from sharding annotations instead of DDP/NCCL.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.ctc import ctc_loss_mean, widths_to_paddings


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def make_optimizer(
    kind: str = "SGD",
    lr: float = 0.001,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    clip_norm: float = 5.0,
) -> optax.GradientTransformation:
    """clip(5.0) -> weight decay -> SGD-momentum/Adam, LR injectable."""
    if kind == "SGD":
        @optax.inject_hyperparams
        def tx(learning_rate):
            return optax.chain(
                optax.clip_by_global_norm(clip_norm),
                optax.add_decayed_weights(weight_decay),
                optax.sgd(learning_rate, momentum=momentum),
            )
    elif kind == "Adam":
        @optax.inject_hyperparams
        def tx(learning_rate):
            return optax.chain(
                optax.clip_by_global_norm(clip_norm),
                optax.add_decayed_weights(weight_decay),
                optax.adam(learning_rate),
            )
    else:
        raise ValueError(f"not expected optimizer: {kind}")
    return tx(learning_rate=lr)


def adjust_learning_rate(state: TrainState, base_lr: float,
                         epoch: int, decay_epochs: int = 30) -> TrainState:
    """``lr = base_lr * 0.1 ** (epoch // decay_epochs)``; the reference
    hardcodes the 30-epoch interval (`main.py:579-584`)."""
    lr = base_lr * (0.1 ** (epoch // max(decay_epochs, 1)))
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def create_train_state(
    model,
    rng: jax.Array,
    input_shape=(1, 128, 256, 1),
    tx: Optional[optax.GradientTransformation] = None,
    lr: float = 0.001,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> TrainState:
    # jit the initializer: it is compiled once and served from the persistent
    # compilation cache afterwards (plain eager init re-traces every op).
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng}, jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    if tx is None:
        tx = make_optimizer(getattr(model, "optimizer", "SGD"), lr=lr,
                            momentum=momentum, weight_decay=weight_decay)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def make_train_step(use_width_mask: bool = False, donate: bool = True):
    """Build the jitted train step.

    ``use_width_mask=False`` reproduces the reference exactly: every example's
    CTC input length is the full padded width (`main.py:388`).
    ``use_width_mask=True`` masks pad frames by true image width instead (the
    quality-preserving option for coarse buckets).
    """

    def train_step(state: TrainState, batch: dict, dropout_rng: jax.Array):
        images = batch["images"]
        labels = batch["labels"]
        label_paddings = batch["label_paddings"]
        T = images.shape[2]
        logit_paddings = (
            widths_to_paddings(batch["widths"], T) if use_width_mask else None)
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = ctc_loss_mean(logits, labels, label_paddings,
                                 logit_paddings)
            return loss, updates["batch_stats"]

        (loss, new_batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # Branchless skip of non-finite batches (`main.py:411-415`).
        def keep_if_finite(new, old):
            return jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new, old)

        state = state.replace(
            step=state.step + 1,
            params=keep_if_finite(new_params, state.params),
            batch_stats=keep_if_finite(new_batch_stats, state.batch_stats),
            opt_state=keep_if_finite(new_opt_state, state.opt_state),
        )
        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "skipped": (~finite).astype(jnp.float32)}
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_classify_train_step(donate: bool = True):
    """Jitted train step for ``pred='Classification'`` models (the
    ``innovation`` isolated-character classifier, reference
    `innovation.py:235-237,252-283`): softmax cross-entropy on the
    ``(B, num_classes)`` head instead of CTC, same clip-5.0 +
    non-finite-skip + optimizer machinery as the CTC step."""

    def train_step(state: TrainState, batch: dict, dropout_rng: jax.Array):
        images = batch["images"]
        labels = batch["labels"]                       # (B,) int32 class ids
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits.astype(jnp.float32), labels))
            acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels)
                           .astype(jnp.float32))
            return loss, (updates["batch_stats"], acc)

        (loss, (new_batch_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        def keep_if_finite(new, old):
            return jax.tree.map(
                lambda n, o: jnp.where(finite, n, o), new, old)

        state = state.replace(
            step=state.step + 1,
            params=keep_if_finite(new_params, state.params),
            batch_stats=keep_if_finite(new_batch_stats, state.batch_stats),
            opt_state=keep_if_finite(new_opt_state, state.opt_state),
        )
        metrics = {"loss": loss, "grad_norm": grad_norm, "acc": acc,
                   "skipped": (~finite).astype(jnp.float32)}
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_classify_eval_step(model):
    """Jitted eval for classification models: forward -> argmax class ids."""

    @jax.jit
    def eval_step(params, batch_stats, images):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return eval_step


def make_eval_step(model, unknown_id: int, use_width_mask: bool = False):
    """Jitted eval: forward + on-device greedy collapse -> compact indices."""
    from ..ops.decode import greedy_decode_device

    @jax.jit
    def eval_step(params, batch_stats, images, widths):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=False)
        w = widths if use_width_mask else None
        chars, lengths = greedy_decode_device(
            logits, w, unknown_id=unknown_id)
        return chars, lengths

    return eval_step


# --------------------------------------------------------------------- pjit
def param_shardings(mesh: Mesh, params) -> Any:
    """Sharding tree: classifier head tensor-parallel over ``model``,
    everything else replicated (grads all-reduced over ``data`` by XLA).

    A dimension is only sharded when the axis size divides it — e.g. the
    7375-class head does not split over a 2-way ``model`` axis (7375 is
    odd) and falls back to replication.
    """
    model_size = mesh.shape.get("model", 1)

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        shape = getattr(leaf, "shape", ())
        if "linear" in names or "fc" in names:
            if (names[-1] == "kernel" and len(shape) == 2
                    and shape[1] % model_size == 0):
                return NamedSharding(mesh, P(None, "model"))
            if (names[-1] == "bias" and len(shape) == 1
                    and shape[0] % model_size == 0):
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState onto the mesh (head TP, rest replicated)."""
    p_shard = param_shardings(mesh, state.params)
    params = jax.tree.map(jax.device_put, state.params, p_shard)
    rep = NamedSharding(mesh, P())
    batch_stats = jax.tree.map(lambda x: jax.device_put(x, rep),
                               state.batch_stats)
    # Optimizer state mirrors the param tree inside trace/adam states; placing
    # it replicated is correct (XLA re-shards lazily on first use).
    opt_state = jax.tree.map(lambda x: jax.device_put(x, rep)
                             if hasattr(x, "shape") else x, state.opt_state)
    return state.replace(params=params, batch_stats=batch_stats,
                         opt_state=opt_state)
