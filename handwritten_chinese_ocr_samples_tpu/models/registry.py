"""Model registry keyed by model tag.

Mirrors the reference's tiny registry pattern (`main.py:587-611`,
`test.py:309-345`): a tag (``hctr``) resolves to a model whose intrinsic
hyper-parameters (``img_height``, ``pad_mode``, ``optimizer``, ``pred``) travel
as attributes on the model object.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp

from ..core.codec import load_chars_list

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(tag: str):
    def deco(factory):
        _REGISTRY[tag] = factory
        return factory
    return deco


def list_models():
    return sorted(_REGISTRY)


def _register_builtin():
    from .hctr import hctr_model
    from .innovation import innovation_model

    def hctr_tiny(num_classes: int, dtype=jnp.float32, **kw):
        """Scaled-down hctr (64-ch trunk, [1,1,1,1] blocks, ~1.3M params):
        same topology/attributes, used by the committed demo artifact and
        fast CI (`tools/make_demo_artifact.py`)."""
        from .hctr import HCTRModel
        return HCTRModel(num_classes=num_classes, backbone_channels=64,
                         num_blocks=(1, 1, 1, 1), dtype=dtype, **kw)

    _REGISTRY.setdefault("hctr", hctr_model)
    _REGISTRY.setdefault("hctr-tiny", hctr_tiny)
    _REGISTRY.setdefault("innovation", innovation_model)


def discover_chars_list(input_path: str | None = None) -> str:
    """Locate ``chars_list.txt`` next to / above a dataset path.

    Mirrors the discovery order of `test.py:316-326`.
    """
    candidates = []
    if input_path:
        parent = os.path.dirname(input_path.rstrip("/"))
        candidates.append(os.path.join(parent, "chars_list.txt"))
        candidates.append(os.path.join(input_path, "chars_list.txt"))
    candidates += [
        "./data/handwritten_ctr_data/chars_list.txt",
        "./data/hwdb2.0/chars_list.txt",
        "./data/demo_data/chars_list.txt",
    ]
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    raise FileNotFoundError(
        "chars_list.txt not found near {!r} (tried {})".format(
            input_path, candidates)
    )


def get_model_info(
    model_type: str,
    data_dir: str | None = None,
    chars_list_file: str | None = None,
    dtype: Any = jnp.float32,
    **model_kwargs,
) -> Tuple[Any, str]:
    """Resolve (model, characters) for a model tag.

    ``num_classes = 1 (blank) + len(characters) + 1 (unknown)``
    (`main.py:600-601`).
    """
    _register_builtin()
    if chars_list_file is None:
        if data_dir and os.path.isfile(os.path.join(data_dir, "chars_list.txt")):
            chars_list_file = os.path.join(data_dir, "chars_list.txt")
        else:
            chars_list_file = discover_chars_list(data_dir)
    characters = load_chars_list(chars_list_file)
    num_classes = 1 + len(characters) + 1
    if model_type not in _REGISTRY:
        raise ValueError(f"Model type: {model_type} not supported "
                         f"(available: {list_models()})")
    model = _REGISTRY[model_type](num_classes=num_classes, dtype=dtype,
                                  **model_kwargs)
    return model, characters
