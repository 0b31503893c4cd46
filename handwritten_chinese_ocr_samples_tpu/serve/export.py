"""Model export — the TPU-native analogue of ONNX/OpenVINO-IR export.

The reference exports the recognizer (and the fairseq LM decoder) to ONNX
with fixed dummy shapes, then converts to OpenVINO IR
(`utils/export_onnx.py:16-114`). Here the portable artifact is a
``jax.export`` StableHLO bundle per (batch, width) bucket plus the weights:
StableHLO is XLA's serialization format, deserializable and runnable on any
matching JAX runtime (CPU/GPU/TPU), which is the role the ONNX graph played.

Artifacts written to ``<out_dir>/``:
  * ``<tag>_b{B}_w{W}.stablehlo``  — serialized Exported function
    (normalize -> forward -> greedy decode), one per bucket;
  * ``<tag>_weights/``             — orbax checkpoint of the variables;
  * ``<tag>_meta.json``            — shapes, class count, codec contract.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np


def export_model(model, variables, out_dir: str, tag: str = "hctr",
                 widths: Sequence[int] = (512, 1024, 1600),
                 batch_sizes: Sequence[int] = (1,),
                 unknown_id: int | None = None) -> dict:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import orbax.checkpoint as ocp

    from ..ops.decode import greedy_decode_device

    os.makedirs(out_dir, exist_ok=True)
    if unknown_id is None:
        unknown_id = model.num_classes - 1

    def infer(variables, x_u8):
        x = (x_u8.astype(jnp.float32) - 127.5) / 127.5
        logits = model.apply(variables, x, train=False)
        return greedy_decode_device(logits, None, unknown_id=unknown_id)

    h = model.img_height
    artifacts = []
    for b in batch_sizes:
        for w in widths:
            shape = jax.ShapeDtypeStruct((b, h, w, 1), jnp.uint8)
            var_shapes = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype),
                variables)
            exported = jexport.export(jax.jit(infer))(var_shapes, shape)
            data = exported.serialize()
            path = os.path.join(out_dir, f"{tag}_b{b}_w{w}.stablehlo")
            with open(path, "wb") as f:
                f.write(data)
            artifacts.append(os.path.basename(path))

    weights_dir = os.path.abspath(os.path.join(out_dir, f"{tag}_weights"))
    ckptr = ocp.PyTreeCheckpointer()
    if os.path.exists(weights_dir):
        import shutil
        shutil.rmtree(weights_dir)
    ckptr.save(weights_dir, variables)

    meta = {
        "tag": tag,
        "img_height": h,
        "num_classes": model.num_classes,
        "widths": list(widths),
        "batch_sizes": list(batch_sizes),
        "artifacts": artifacts,
        "weights": f"{tag}_weights",
        "input": "uint8 NHWC grayscale, raw pixels (normalization is fused)",
        "output": "compact collapsed char indices + lengths",
    }
    with open(os.path.join(out_dir, f"{tag}_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_exported(path: str):
    """Deserialize a ``.stablehlo`` artifact into a callable."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call
