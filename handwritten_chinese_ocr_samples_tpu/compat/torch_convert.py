"""PyTorch ``.pth.tar`` checkpoint -> JAX pytree converter.

Enables bit-identical parity runs against reference checkpoints
(`main.py:349-356` save format: ``{epoch, state_dict, best_acc, optimizer}``).
Weight-layout translations:

  * conv: torch ``(O, I, kh, kw)`` -> flax ``(kh, kw, I, O)``;
  * dense: torch ``(O, I)`` -> flax ``(I, O)``;
  * BatchNorm ``weight/bias`` -> params ``scale/bias``;
    ``running_mean/running_var`` -> ``batch_stats`` ``mean/var``;
  * the CTC head: the reference flattens features as ``(C, H)`` — index
    ``c*H + h`` (`handwritten_ctr_model.py:173`, torch ``flatten(1, 2)`` of
    BCHW) while the TPU model flattens NHWC as ``(H, C)`` — index
    ``h*C + c`` — so the 2048-dim input axis is permuted accordingly;
  * ``nn.Sequential`` block indices ``blockN.i`` -> module names
    ``blockN_i``; ``downsample.0/.1`` -> ``down_conv``/``down_bn``;
    SE ``se.fc.0/.2`` -> ``se/fc1``/``se/fc2``.

Only numpy/torch-cpu are required; torch is imported lazily.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def load_pth_tar(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint's ``state_dict`` as numpy arrays.

    Strips the DDP ``module.`` prefix if present (`main.py:260`).
    """
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _module_path(torch_prefix: str) -> Tuple[str, ...]:
    """Translate a torch module prefix into the flax module path."""
    parts = torch_prefix.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        m = re.fullmatch(r"block(\d)", p)
        if m and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"block{m.group(1)}_{parts[i + 1]}")
            i += 2
            continue
        if p == "downsample":
            # downsample.0 = conv, downsample.1 = bn
            idx = parts[i + 1]
            out.append("down_conv" if idx == "0" else "down_bn")
            i += 2
            continue
        if p == "transforms" and i + 2 < len(parts):
            # MultiScaleFeatureFusion: transforms.<i>.{0=conv,1=bn}
            # (`innovation.py:199-205`)
            stage, idx = parts[i + 1], parts[i + 2]
            out.append(f"transform{stage}_" + ("conv" if idx == "0"
                                               else "bn"))
            i += 3
            continue
        if p == "fusion" and i + 1 < len(parts) and parts[i + 1].isdigit():
            # fusion.{0=conv,1=bn} (`innovation.py:208-212`)
            out.append("fusion_conv" if parts[i + 1] == "0" else "fusion_bn")
            i += 2
            continue
        if p == "se" and i + 2 < len(parts) and parts[i + 1] == "fc":
            idx = parts[i + 2]
            out.append("se")
            out.append("fc1" if idx == "0" else "fc2")
            i += 3
            continue
        out.append(p)
        i += 1
    return tuple(out)


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    head_height: int = 4,
) -> Dict[str, Any]:
    """torch state_dict -> ``{"params": ..., "batch_stats": ...}`` pytree."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        *mod, leaf = key.split(".")
        path = _module_path(".".join(mod))
        v = np.asarray(val)

        if leaf in ("running_mean", "running_var"):
            name = "mean" if leaf == "running_mean" else "var"
            _set(batch_stats, path + (name,), v)
            continue

        is_bn = v.ndim == 1 and leaf in ("weight", "bias") and (
            f"{'.'.join(mod)}.running_mean" in sd)
        if is_bn:
            name = "scale" if leaf == "weight" else "bias"
            _set(params, path + (name,), v)
            continue

        if leaf == "weight":
            if v.ndim == 4:  # conv OIHW -> HWIO
                v = v.transpose(2, 3, 1, 0)
            elif v.ndim == 2:  # dense (O, I) -> (I, O)
                if path and path[-1] == "linear":
                    # Head input permutation (C, H) -> (H, C).
                    O, CH = v.shape
                    C = CH // head_height
                    v = (v.reshape(O, C, head_height)
                          .transpose(2, 1, 0)
                          .reshape(CH, O))
                else:
                    v = v.T
            _set(params, path + ("kernel",), v)
        elif leaf == "bias":
            _set(params, path + ("bias",), v)
        elif leaf == "gamma":  # ResidualSpatialAttention scalar
            _set(params, path + ("gamma",), v)
        else:
            raise ValueError(f"unhandled torch key: {key}")

    return {"params": params, "batch_stats": batch_stats}


def convert_checkpoint(path: str) -> Dict[str, Any]:
    """``.pth.tar`` file -> flax variables pytree."""
    return convert_state_dict(load_pth_tar(path))
