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

from .core.codec import CTCCodec, load_chars_list  # noqa: F401
from .models.registry import get_model_info, list_models  # noqa: F401
