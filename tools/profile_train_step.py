"""Decompose the hctr train-step cost on the TPU (VERDICT round-1 #4).

Times, at a given batch/width (default b16/w1200, the reference's A100
config, `colab_train.ipynb` cell 16):

  * full train step (fwd + CTC + bwd + clip/SGD update)
  * forward only (train=True, no grad)
  * forward + CTC loss value (no grad)
  * full step with dropout disabled (quantifies RNG/mask cost)
  * full step under remat (memory-for-FLOPs trade)

All timings run K steps back-to-back with ONE final device sync — a
single dispatch on the tunneled TPU pays a ~26 ms sync floor that would
swamp per-step deltas (NOTES.md).

Usage: python tools/profile_train_step.py [--batch 16] [--width 1200] [-k 5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--classes", type=int, default=7375)
    ap.add_argument("-k", "--steps", type=int, default=5)
    ap.add_argument("--label-len", type=int, default=48)
    ap.add_argument("--variants", type=str, default="",
                    help="comma list filtering which measurements run "
                         "(substring match on the result tag); empty = all")
    args = ap.parse_args()
    wanted = [v for v in args.variants.split(",") if v]

    def want(tag):
        return not wanted or any(w in tag for w in wanted)

    import jax
    import jax.numpy as jnp
    import optax
    from handwritten_chinese_ocr_samples_tpu.models.hctr import hctr_model
    from handwritten_chinese_ocr_samples_tpu.ops.ctc import ctc_loss_mean
    from handwritten_chinese_ocr_samples_tpu.train.step import (
        create_train_state, make_train_step)

    B, W, D, LL = args.batch, args.width, args.classes, args.label_len
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, 128, W, 1)), jnp.float32),
        "labels": jnp.asarray(rng.integers(1, D - 1, (B, LL)), jnp.int32),
        "label_paddings": jnp.zeros((B, LL), jnp.float32),
        "widths": jnp.full((B,), W, jnp.int32),
    }
    key = jax.random.key(0)

    def _sync(tree):
        leaf = [x for x in jax.tree.leaves(tree)
                if hasattr(x, "dtype")][0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def timed(fn, state, k=args.steps):
        s = fn(state)                             # compile + warm
        _sync(s)
        t0 = time.perf_counter()
        for _ in range(k):
            s = fn(s)
        _sync(s)
        return (time.perf_counter() - t0) / k

    def fresh(remat=False):
        model = hctr_model(num_classes=D, dtype=jnp.bfloat16, remat=remat)
        return model, create_train_state(model, jax.random.key(0),
                                         input_shape=(B, 128, 256, 1))

    results = {}

    # full step (donated state — each measurement gets a fresh one)
    if want("step/bf16 "):
        model, state = fresh()
        step = make_train_step(donate=True)
        results["step/bf16 "] = timed(lambda s: step(s, batch, key)[0],
                                      state)

    if want("remat"):
        _, state = fresh(remat=True)
        step_r = make_train_step(donate=True)
        results["step/bf16+remat"] = timed(
            lambda s: step_r(s, batch, key)[0], state)

    # rbg dropout keys: TPU-native counter RNG generates mask bits much
    # faster than threefry; the key impl flows through fold_in unchanged
    if want("rbg"):
        key_rbg = jax.random.key(0, impl="rbg")
        _, state = fresh()
        step2 = make_train_step(donate=True)
        results["step/bf16+rbg-drop"] = timed(
            lambda s: step2(s, batch, key_rbg)[0], state)

    # reshape-lowered (2,1) max-pool: bit-identical forward, but the
    # backward is select+interleave instead of SelectAndScatter
    if want("pool-reshape"):
        from handwritten_chinese_ocr_samples_tpu.models.hctr import \
            HCTRModel
        model_p = HCTRModel(num_classes=D, dtype=jnp.bfloat16,
                            pool_impl="reshape")
        state_p = create_train_state(model_p, jax.random.key(0),
                                     input_shape=(B, 128, 256, 1))
        step_p = make_train_step(donate=True)
        results["step/bf16 pool-reshape"] = timed(
            lambda s: step_p(s, batch, key)[0], state_p)

    # dropout rates zeroed (train=True: BN still in training mode) —
    # isolates the mask-generation + mask-multiply cost
    if want("drop-rates"):
        from handwritten_chinese_ocr_samples_tpu.models.hctr import \
            HCTRModel
        model_z = HCTRModel(num_classes=D, dtype=jnp.bfloat16,
                            stage_drop=(0.0, 0.0, 0.0, 0.0), block_drop=0.0)
        state_z = create_train_state(model_z, jax.random.key(0),
                                     input_shape=(B, 128, 256, 1))
        step3 = make_train_step(donate=True)
        results["step/bf16 drop-rates=0"] = timed(
            lambda s: step3(s, batch, key)[0], state_z)

    def timed_chain(mk, k=args.steps):
        """Dispatch k async calls, sync once on the LAST output (in-order
        device execution makes that a barrier for all of them)."""
        out = mk()
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(k):
            out = mk()
        np.asarray(out)
        return (time.perf_counter() - t0) / k

    # forward only (same train=True path, no grad)
    model, state = fresh()

    @jax.jit
    def fwd(params, stats):
        logits, _ = model.apply(
            {"params": params, "batch_stats": stats},
            batch["images"], train=True, mutable=["batch_stats"],
            rngs={"dropout": key})
        return jnp.sum(logits)

    if want("fwd(train=True)"):
        results["fwd(train=True)"] = timed_chain(
            lambda: fwd(state.params, state.batch_stats))

    @jax.jit
    def fwd_loss(params, stats):
        logits, _ = model.apply(
            {"params": params, "batch_stats": stats},
            batch["images"], train=True, mutable=["batch_stats"],
            rngs={"dropout": key})
        return ctc_loss_mean(logits, batch["labels"],
                             batch["label_paddings"], None)

    if want("fwd+ctc"):
        results["fwd+ctc"] = timed_chain(
            lambda: fwd_loss(state.params, state.batch_stats))

    # no-dropout / eval-BN variant quantifies RNG-mask + BN-stat cost
    # (not bit-identical semantics: BN uses running stats here)
    @jax.jit
    def step_nodrop(s):
        def loss_fn(params):
            logits = model.apply(
                {"params": params, "batch_stats": s.batch_stats},
                batch["images"], train=False)
            return ctc_loss_mean(logits, batch["labels"],
                                 batch["label_paddings"], None)
        loss, grads = jax.value_and_grad(loss_fn)(s.params)
        upds, opt2 = s.tx.update(grads, s.opt_state, s.params)
        return s.replace(params=optax.apply_updates(s.params, upds),
                         opt_state=opt2)

    if want("no-drop"):
        _, state = fresh()
        results["step/no-drop+eval-BN"] = timed(step_nodrop, state)

    for k, v in results.items():
        lines = B / v
        print(f"{k:26s}: {v * 1e3:7.1f} ms/step  ({lines:6.1f} lines/s)")


if __name__ == "__main__":
    main()
