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
                 unknown_id: int | None = None,
                 quant=None) -> dict:
    """``quant``: optional int8 conv-scale tree from
    ``serve.quant.calibrate_conv_amax`` — when given, the exported
    StableHLO runs the s8xs8->s32 conv path with the scales baked in as
    constants (the artifact is self-contained either way)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import orbax.checkpoint as ocp

    from ..ops.decode import greedy_decode_device
    from ..utils.ckpt_io import normalize_serving_dtype

    # Dtype contract at export time — the reference's analogue is the
    # OpenVINO IR fixing serving numerics (`deploy.py:90-106`). Weights are
    # traced (and saved) as f32 so no bundle can bake bf16-stored leaves
    # into the IR (bf16 storage compiles a ~7.7x slower forward; VERDICT
    # r4 #1). The bundle loader restores verbatim — the IR is the contract.
    variables = normalize_serving_dtype(variables)

    os.makedirs(out_dir, exist_ok=True)
    if unknown_id is None:
        unknown_id = model.num_classes - 1

    def infer(variables, x_u8):
        x = (x_u8.astype(jnp.float32) - 127.5) / 127.5
        if quant is not None:
            logits = model.apply(variables, x, train=False, quant=quant)
        else:
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
        "int8": quant is not None,
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


# ----------------------------------------------------------------- LM export
def export_lm(model, variables, tokenizer, out_dir: str, tag: str = "lm",
              batch_sizes: Sequence[int] = (1, 10),
              lengths: Sequence[int] = (32, 64)) -> dict:
    """Serialize the char LM decoder — the counterpart of the reference's
    fairseq-LM ONNX export (`utils/export_onnx.py:56-105`, fixed ``(1, 64)``
    token shapes for the OpenVINO path, `transformer_infer.py:81-169`).

    One StableHLO artifact per (batch, length) bucket computes
    ``tokens (B, L) -> logits (B, L, V)``; ``score``/``next_k_words`` are
    thin gathers implemented by the loader (``ExportedLMScorer``).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import orbax.checkpoint as ocp

    from ..utils.ckpt_io import normalize_serving_dtype

    # Same export-time dtype contract as export_model: f32 weights in the
    # traced IR and in the saved bundle, compute dtype fixed by the model.
    variables = normalize_serving_dtype(variables)

    os.makedirs(out_dir, exist_ok=True)

    def logits_fn(variables, tokens):
        return model.apply(variables, tokens, train=False)

    var_shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), variables)
    artifacts = []
    for b in batch_sizes:
        for L in lengths:
            shape = jax.ShapeDtypeStruct((b, L), jnp.int32)
            exported = jexport.export(jax.jit(logits_fn))(var_shapes, shape)
            path = os.path.join(out_dir, f"{tag}_b{b}_l{L}.stablehlo")
            with open(path, "wb") as f:
                f.write(exported.serialize())
            artifacts.append(os.path.basename(path))

    tokenizer.save_dict(os.path.join(out_dir, f"{tag}_dict.txt"))
    weights_dir = os.path.abspath(os.path.join(out_dir, f"{tag}_weights"))
    if os.path.exists(weights_dir):
        import shutil
        shutil.rmtree(weights_dir)
    ocp.PyTreeCheckpointer().save(weights_dir, variables)

    meta = {
        "tag": tag,
        "vocab_size": model.vocab_size,
        "max_len": model.max_len,
        "batch_sizes": list(batch_sizes),
        "lengths": list(lengths),
        "artifacts": artifacts,
        "weights": f"{tag}_weights",
        "dict": f"{tag}_dict.txt",
        "output": "next-token logits (B, L, V); position t scores token t+1",
    }
    with open(os.path.join(out_dir, f"{tag}_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


class ExportedLMScorer:
    """``score`` / ``next_k_words`` over a serialized LM bundle.

    Mirrors ``TransformerOVIE`` (`transformer_infer.py:81-169`): fixed-shape
    executables with batch padding — requests are padded up to the nearest
    exported (batch, length) bucket. Output-equality with the live
    ``LMScorer`` is tested in ``tests/test_export_serve.py``.
    """

    def __init__(self, lm_dir: str, tag: str = "lm"):
        import jax.numpy as jnp
        from ..lm.tokenizer import Tokenizer
        from ..utils.ckpt_io import restore_pytree_host

        with open(os.path.join(lm_dir, f"{tag}_meta.json")) as f:
            self.meta = json.load(f)
        self.tokenizer = Tokenizer(os.path.join(lm_dir, self.meta["dict"]))
        # host-array restore: the bundle loads regardless of the topology
        # it was exported under (see utils.ckpt_io) — then committed to
        # the device once (a host tree would re-upload per call; see
        # eval.driver weight-residency note)
        import jax
        self.variables = jax.device_put(
            restore_pytree_host(os.path.abspath(
                os.path.join(lm_dir, self.meta["weights"]))),
            jax.devices()[0])
        self._fns = {}
        for b in self.meta["batch_sizes"]:
            for L in self.meta["lengths"]:
                path = os.path.join(lm_dir, f"{tag}_b{b}_l{L}.stablehlo")
                self._fns[(b, L)] = load_exported(path)
        self._jnp = jnp

    def _bucket(self, n: int, need_len: int):
        bs = [b for b in sorted(self.meta["batch_sizes"]) if b >= n]
        ls = [L for L in sorted(self.meta["lengths"]) if L >= need_len]
        b = bs[0] if bs else max(self.meta["batch_sizes"])
        L = ls[0] if ls else max(self.meta["lengths"])
        return b, L

    def _logits(self, sentences, char_based):
        jnp = self._jnp
        need = max(len(s) for s in sentences) + 2
        b, L = self._bucket(len(sentences), need)
        out = []
        for i in range(0, len(sentences), b):
            chunk = sentences[i: i + b]
            pad = b - len(chunk)
            ids = self.tokenizer.tokenize(chunk + [""] * pad,
                                          char_based=char_based,
                                          fixed_len=L)
            logits = np.asarray(
                self._fns[(b, L)](self.variables, jnp.asarray(ids)))
            out.append(logits[: len(chunk)])
        return np.concatenate(out, axis=0)

    def score(self, sentences, char_based: bool = False) -> np.ndarray:
        if not sentences:
            return np.zeros((0,))
        from scipy.special import logsumexp
        logits = self._logits(sentences, char_based)     # (B, L, V)
        lse = logsumexp(logits, axis=-1)                 # (B, L)
        out = np.zeros((len(sentences),))
        for i, s in enumerate(sentences):
            # sentences longer than the largest exported bucket score their
            # truncated prefix — the fixed-shape contract, exactly like the
            # reference's OVIE path with its fixed (1, 64) token input
            # (`export_onnx.py:70`, `transformer_infer.py:119-131`)
            n = min(len(s), logits.shape[1] - 2)
            toks = self.tokenizer.tokenize([s], char_based=char_based,
                                           fixed_len=logits.shape[1])[0]
            for t in range(n):
                out[i] += logits[i, t, toks[t + 1]] - lse[i, t]
        return out

    def next_k_words(self, sentences, k: int, char_based: bool = False):
        if not sentences:
            return []
        logits = self._logits(sentences, char_based)
        res = []
        for i, s in enumerate(sentences):
            # over-long prefixes predict from the last in-bucket position
            at = logits[i, min(len(s), logits.shape[1] - 1)]
            idx = np.argsort(-at)[:k]
            res.append(self.tokenizer.decode(idx))
        return res
