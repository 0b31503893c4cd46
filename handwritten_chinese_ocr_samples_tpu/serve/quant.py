"""Post-training int8 quantization for the serving/eval forward pass.

TPU-native feature with no reference counterpart (the reference's
OpenVINO deploy path runs f32 on CPU, `deploy.py:90-125`): the v5e MXU
executes s8 x s8 -> s32 convolutions at ~1.9x its bf16 rate (measured on
this chip: 222 TOPS vs 119 TFLOPS for the mid-trunk conv shape —
NOTES.md round 3), so quantizing the SE-ResNet's conv sites buys serving
throughput at (measured) zero transcription cost on the committed demo.

Scheme (implemented in ``models.hctr.QuantizableConv``):
  * symmetric per-tensor activation scale ``s_x = amax / 127`` from a
    one-shot calibration pass (this module);
  * symmetric per-out-channel weight scales derived from the live kernel
    inside the compiled program — nothing extra to store or keep in sync;
  * s32 accumulation, dequantize + bias in f32, BN/SE/residual stay in
    the usual compute dtype. CTC head (~2% of forward FLOPs) stays float.

Calibration is one float forward per batch with Flax's
``mutable=["intermediates"]``: every conv site sows its input absmax;
``calibrate_conv_amax`` folds those into the nested ``quant`` tree that
``model.apply(..., quant=...)`` consumes.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp


def _fold_amax(tree: Dict[str, Any]) -> Dict[str, Any]:
    """intermediates tree -> quant tree (strip the sow tuple level)."""
    out: Dict[str, Any] = {}
    for name, sub in tree.items():
        if not isinstance(sub, dict):
            continue
        if "amax_in" in sub:
            vals = sub["amax_in"]  # sow tuple: one entry per call
            amax = vals[0]
            for v in vals[1:]:
                amax = jnp.maximum(amax, v)
            out[name] = amax
        else:
            folded = _fold_amax(sub)
            if folded:
                out[name] = folded
    return out


def calibrate_conv_amax(model, variables, batches: Iterable[jnp.ndarray],
                        train: bool = False) -> Dict[str, Any]:
    """Run float forwards over ``batches``; return the per-conv-site
    input-absmax tree for ``model.apply(..., quant=...)``.

    One float forward per calibration batch (jitted); the per-site maxima
    are reduced across batches. A single representative batch is usually
    enough for this model — activations are ReLU-bounded and the scales
    only set the clipping point."""

    @jax.jit
    def one(variables, x):
        _, state = model.apply(variables, x, train=train,
                               mutable=["intermediates"])
        return _fold_amax(state["intermediates"])

    acc: Optional[Dict[str, Any]] = None
    for x in batches:
        cur = one(variables, jnp.asarray(x))
        acc = cur if acc is None else jax.tree.map(jnp.maximum, acc, cur)
    if acc is None:
        raise ValueError("calibration needs at least one batch")
    return jax.device_get(acc)  # host floats: safe to close over in jit


def conv_site_count(quant_tree: Dict[str, Any]) -> int:
    """Number of quantized conv sites in a calibration tree."""
    return len(jax.tree.leaves(quant_tree))


def supports_quant(model) -> bool:
    """Whether the model's ``__call__`` accepts the ``quant`` tree."""
    import inspect
    return "quant" in inspect.signature(type(model).__call__).parameters


def calibrate_for_model(model, variables, batches,
                        announce: bool = True) -> Dict[str, Any]:
    """Guarded calibration used by every int8 entry point (eval driver,
    serving engine, export CLI, bench): raises a clear error for models
    without a quantized conv path and prints the standard one-liner."""
    if not supports_quant(model):
        raise ValueError(
            f"int8: model {type(model).__name__} has no quantized conv "
            f"path (its __call__ takes no `quant` tree)")
    tree = calibrate_conv_amax(model, variables, batches)
    if announce:
        print(f"[int8] calibrated {conv_site_count(tree)} conv sites; "
              f"serving s8xs8->s32 convs")
    return tree
