"""handwritten_chinese_ocr_samples_tpu — TPU-native Handwritten Chinese Text Recognition.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AndrewCullacino/handwritten-chinese-ocr-samples (an end-to-end HCTR pipeline:
grayscale text-line images -> SE-ResNet CNN with asymmetric pooling -> per-column
character logits -> CTC loss / CTC decoding, with optional beam search fused with
a language model), built TPU-first:

- NHWC bf16 convolutions tiled onto the MXU; static width-bucketed shapes.
- `jax.jit` train/eval steps; `optax` CTC loss; data/model-parallel `Mesh` sharding.
- On-device greedy and batched beam-search CTC decoding (`lax.scan`), with a
  first-party JAX decoder-only char LM replacing the fairseq dependency.
- Host-side tools (dataset extraction, corpus prep) in Python + C++.

Reference parity: see SURVEY.md at the repo root. Cited reference files use the
notation `<file>:<line>` relative to the reference checkout.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the deep conv trunk takes minutes to
# compile; cached executables load in seconds. Opt out with HCTR_NO_CACHE=1
# or override the location with JAX_COMPILATION_CACHE_DIR.
import os as _os

if not _os.environ.get("HCTR_NO_CACHE"):
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/hctr_tpu_jax"))
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .core.codec import CTCCodec, load_chars_list  # noqa: F401
from .models.registry import get_model_info, list_models  # noqa: F401
