"""On-device greedy CTC decoding.

The reference decodes entirely on the host: D2H copy of the full ``(W, B, D)``
logit tensor followed by a Python loop (`main.py:444`, `ctc_codec.py:70-99`).
On TPU that transfer (W x B x 7375 floats) dwarfs the decode itself, so here
the argmax **and** the CTC collapse (drop blanks/unknown, merge repeats) run
on device; only a compact ``(B, T) indices + (B,) lengths`` pair — a few KB —
crosses to the host for the final index->string join.

Collapse semantics match `ctc_codec.py:88-94`: keep frame ``t`` iff
``idx[t] not in {blank, unknown}`` and ``idx[t] != idx[t-1]`` (the repeat
comparison is against the previous *frame*, pre-collapse, exactly like the
reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("unknown_id", "blank_id"))
def greedy_decode_device(
    logits: jnp.ndarray,              # (B, T, K) raw logits (argmax == argmax of log-softmax)
    widths: jnp.ndarray | None = None,  # (B,) valid frames; None = full T
    *,
    unknown_id: int,
    blank_id: int = 0,
):
    """Greedy decode on device.

    Returns ``(chars, lengths)``: ``chars`` is ``(B, T)`` int32 with each
    row's collapsed character indices left-compacted (tail zero-padded) and
    ``lengths`` is ``(B,)`` the number of valid entries per row.
    """
    B, T, _ = logits.shape
    idx = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    if widths is not None:
        t_pos = jnp.arange(T, dtype=jnp.int32)[None, :]
        valid = t_pos < widths[:, None]
        idx = jnp.where(valid, idx, blank_id)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, dtype=jnp.int32), idx[:, :-1]], axis=1)
    keep = (idx != blank_id) & (idx != unknown_id) & (idx != prev)
    # Left-compact kept indices via cumsum scatter (static shapes, no host).
    # Dropped frames are parked at column T, which mode="drop" discards.
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1       # (B, T)
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)          # (B,)
    pos = jnp.where(keep, pos, T)
    chars = jnp.zeros((B, T), dtype=jnp.int32)
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]
    chars = chars.at[b_idx, pos].set(idx, mode="drop")
    return chars, lengths


def greedy_texts(codec, logits, widths=None):
    """Full greedy path: device argmax+collapse, host string join."""
    chars, lengths = greedy_decode_device(
        logits, widths, unknown_id=codec.unknown_id, blank_id=codec.blank_id)
    return codec.compact_to_texts(jax.device_get(chars),
                                  jax.device_get(lengths))
