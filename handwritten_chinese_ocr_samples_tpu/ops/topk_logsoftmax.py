"""Pallas TPU kernel: fused row-wise log-softmax + top-K over the class axis.

Beam search consumes only the top-``K`` candidate log-probs per frame (plus
the blank's), yet the naive pipeline materializes the full log-softmaxed
``(B, T, D)`` tensor (1.1 GB at B=32, T=1200, D=7375) and then runs
``top_k`` over it — two full HBM round trips of a tensor that is consumed
once. This kernel reads the raw logits tile-by-tile and emits only
``(B, T, K)`` values/indices and the blank column: a ~D/K reduction in
bytes written.

Algorithm per (T_TILE, D) block, entirely in VMEM:
  * ``logZ`` via max + log-sum-exp along lanes;
  * K iterations of (max, argmax, mask-out) along lanes — K is small and
    static, so the loop unrolls;
  * blank log-prob captured from column 0 before masking.

Grid: ``(B, T // T_TILE)``; the D axis stays whole inside the block (7375
f32 lanes x 8 sublanes ≈ 232 KB — comfortably within VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(x_ref, vals_ref, idx_ref, blank_ref, nabove_ref, *, k: int,
            k_pad: int, d_valid: int, prune: float):
    x = x_ref[0].astype(jnp.float32)              # (T_TILE, D_pad)
    T_TILE, D_pad = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (T_TILE, D_pad), 1)
    x = jnp.where(col < d_valid, x, NEG)          # mask lane padding

    m = jnp.max(x, axis=1, keepdims=True)
    logz = m + jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True))

    blank_ref[0] = x[:, 0:1] - logz
    # classes whose log-prob clears the skip-search prune threshold
    # (`ctc_codec.py:128,144`)
    nabove_ref[0] = jnp.sum(
        ((x - logz) > prune).astype(jnp.int32), axis=1, keepdims=True)

    work = x
    vs, is_ = [], []
    for _ in range(k):                            # static unroll, K small
        v = jnp.max(work, axis=1, keepdims=True)          # (T_TILE, 1)
        i = jnp.argmax(work, axis=1).astype(jnp.int32)    # (T_TILE,)
        vs.append(v - logz)
        is_.append(i[:, None])
        work = jnp.where(col == i[:, None], NEG, work)
    vals = jnp.concatenate(
        vs + [jnp.zeros((T_TILE, k_pad - k), jnp.float32)], axis=1)
    idxs = jnp.concatenate(
        is_ + [jnp.zeros((T_TILE, k_pad - k), jnp.int32)], axis=1)
    vals_ref[0] = vals
    idx_ref[0] = idxs


@functools.partial(jax.jit,
                   static_argnames=("k", "t_tile", "interpret", "prune"))
def topk_logsoftmax(logits: jnp.ndarray, k: int = 10, t_tile: int = 8,
                    interpret: bool | None = None,
                    prune: float = -6.9077554):
    """(B, T, D) raw logits -> (vals (B,T,K), idx (B,T,K), blank (B,T),
    n_above (B,T)).

    ``vals`` are log-softmax values of the top-``k`` classes per frame in
    descending order; ``blank`` is the log-prob of class 0; ``n_above``
    counts classes above the skip-search prune threshold (default
    log(0.001), `ctc_codec.py:128`).
    """
    if interpret is None:  # Mosaic compiles on TPU; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    B, T, D = logits.shape
    # pad T to the tile and D to the lane multiple
    T_pad = -(-T // t_tile) * t_tile
    D_pad = -(-D // 128) * 128
    if (T_pad, D_pad) != (T, D):
        logits = jnp.pad(logits, ((0, 0), (0, T_pad - T), (0, D_pad - D)))

    # K output lanes padded to 128 for layout friendliness
    K_pad = 128

    grid = (B, T_pad // t_tile)
    vals, idx, blank, nabove = pl.pallas_call(
        functools.partial(_kernel, k=k, k_pad=K_pad, d_valid=D, prune=prune),
        grid=grid,
        in_specs=[pl.BlockSpec((1, t_tile, D_pad),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, t_tile, K_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, K_pad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T_pad, K_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, K_pad), jnp.int32),
            jax.ShapeDtypeStruct((B, T_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(logits)
    return (vals[:, :T, :k], idx[:, :T, :k], blank[:, :T, 0],
            nabove[:, :T, 0])


def topk_logsoftmax_xla(logits: jnp.ndarray, k: int = 10,
                        prune: float = -6.9077554):
    """Reference XLA implementation (correctness oracle / CPU fallback)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vals, idx = jax.lax.top_k(logp, k)
    nabove = jnp.sum((logp > prune).astype(jnp.int32), axis=-1)
    return vals, idx.astype(jnp.int32), logp[..., 0], nabove
