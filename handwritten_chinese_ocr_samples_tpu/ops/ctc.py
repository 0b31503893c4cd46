"""CTC loss for TPU (static shapes, f32 numerics under bf16 activations).

Semantics match ``torch.nn.CTCLoss(zero_infinity=True)`` with the default
``reduction='mean'`` as used by the reference trainer (`main.py:203-206`,
`main.py:406-409`):

  * per-example negative log-likelihood divided by its target length,
  * averaged over the batch,
  * infinite per-example losses zeroed (``zero_infinity``) instead of
    poisoning the batch.

The reference feeds the **full padded width** as the input length for every
example (`main.py:388`: ``preds_size = [preds.size(0)] * B``); we reproduce
that by passing all-zero ``logit_paddings`` for the bucketed width. Masked
variants (true per-image widths) are also supported and used by default for
training quality — the bucketed pad columns replicate the last image column
(`dataset.py:89-92`), which the reference deliberately feeds to the loss.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def ctc_loss_mean(
    logits: jnp.ndarray,          # (B, T, K) raw logits (softmax folded in)
    labels: jnp.ndarray,          # (B, L) int32, blank=0
    label_paddings: jnp.ndarray,  # (B, L) 1.0 = pad
    logit_paddings: jnp.ndarray | None = None,  # (B, T) 1.0 = pad
    blank_id: int = 0,
) -> jnp.ndarray:
    """Batch-mean CTC loss (torch ``reduction='mean'`` + ``zero_infinity``)."""
    B, T, _ = logits.shape
    if logit_paddings is None:
        logit_paddings = jnp.zeros((B, T), dtype=jnp.float32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32),
        logit_paddings.astype(jnp.float32),
        labels,
        label_paddings.astype(jnp.float32),
        blank_id=blank_id,
    )  # (B,)
    label_lengths = jnp.maximum(
        jnp.sum(1.0 - label_paddings, axis=-1), 1.0)
    per_seq = per_seq / label_lengths
    # zero_infinity: drop non-finite examples from the mean (they contribute 0
    # loss and 0 gradient), mirroring `main.py:205` + the trainer's finite
    # check (`main.py:411-415`).
    finite = jnp.isfinite(per_seq)
    per_seq = jnp.where(finite, per_seq, 0.0)
    return jnp.sum(per_seq) / B


def widths_to_paddings(widths: jnp.ndarray, T: int) -> jnp.ndarray:
    """Per-example valid frame counts -> (B, T) logit paddings (1.0 = pad)."""
    t = jnp.arange(T)[None, :]
    return (t >= widths[:, None]).astype(jnp.float32)
