"""Char-LM checkpoint directory IO.

Directory layout (the counterpart of the reference's fairseq model dir with
``checkpoint_best.pt`` + ``dict.txt``, `transformer_infer.py:19-29`):

    <dir>/dict.txt        fairseq-format dictionary
    <dir>/config.json     model hyper-parameters
    <dir>/weights/        orbax checkpoint of params
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Tuple

import jax.numpy as jnp
import orbax.checkpoint as ocp

from .model import CharTransformerLM
from .tokenizer import Tokenizer


def save_lm(out_dir: str, model: CharTransformerLM, params,
            tokenizer: Tokenizer) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tokenizer.save_dict(os.path.join(out_dir, "dict.txt"))
    cfg = {
        "vocab_size": model.vocab_size,
        "d_model": model.d_model,
        "n_layers": model.n_layers,
        "n_heads": model.n_heads,
        "d_ff": model.d_ff,
        "max_len": model.max_len,
        "dropout": model.dropout,
        "tie_embeddings": model.tie_embeddings,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    weights = os.path.abspath(os.path.join(out_dir, "weights"))
    if os.path.exists(weights):
        shutil.rmtree(weights)
    ocp.PyTreeCheckpointer().save(weights, {"params": params})


def load_lm(lm_dir: str, dtype=jnp.float32
            ) -> Tuple[CharTransformerLM, dict, Tokenizer]:
    dict_file = os.path.join(lm_dir, "dict.txt")
    cfg_file = os.path.join(lm_dir, "config.json")
    weights = os.path.abspath(os.path.join(lm_dir, "weights"))
    for p in (dict_file, cfg_file, weights):
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"{p} missing — expected dict.txt, config.json, weights/")
    tokenizer = Tokenizer(dict_file)
    with open(cfg_file) as f:
        cfg = json.load(f)
    model = CharTransformerLM(dtype=dtype, **cfg)
    # host-array restore — loadable regardless of the topology the bundle
    # was trained/saved under (see utils.ckpt_io)
    from ..utils.ckpt_io import normalize_serving_dtype, restore_pytree_host
    payload = restore_pytree_host(weights)
    # Storage dtype never leaks into the compiled program: bf16 transport
    # artifacts load as f32 and `dtype=` alone fixes the compute precision
    # (same contract as the recognizer loader — see ckpt_io).
    return model, normalize_serving_dtype({"params": payload["params"]}), \
        tokenizer
