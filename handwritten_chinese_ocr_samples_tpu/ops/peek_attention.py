"""Pallas TPU kernel: peek attention against the per-beam KV cache.

The LM-fused beam search scores candidate continuations with a grouped
teacher-forced *peek* (``decode/beam_lm_device._grouped_peek``): per beam,
``R`` candidate rows of ``S1`` tokens attend the beam's cached prefix plus
their own causal row. Done naively, the cache-score tensor
``(B, R, S1, H, L)`` is materialized in HBM once per transformer layer per
frame — at production shapes (320 beams x 21 rows x 5 tokens x 8 heads x
256 ctx, f32) that is ~280 MB *per layer per frame* of pure intermediate
traffic, and profiling shows it dominates the whole decode
(ctx 256 -> 128 sped the end-to-end search by 1.55x).

This kernel computes the cache part entirely in VMEM — scores, masking,
online max/sum — and emits only the flash-attention partials:

    o (B, N, H*Dh) f32   unnormalized  sum_j exp(s_j - m) * v_j
    m (B, N, Hpad) f32   row max score  (NEG when the cache is empty)
    l (B, N, Hpad) f32   sum_j exp(s_j - m)

(``N = R*S1`` flattened queries). The caller merges these with the tiny
own-row causal part (a few KB) via the standard flash combine. Per-beam
VMEM footprint: k/v ``(L, 512)`` + scores ``(N_pad, L)`` — well under 1 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
H_PAD = 128  # lane padding for the (N, H) partial outputs


def _kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
            *, n_heads: int, d_head: int):
    q = q_ref[0]                                   # (N_pad, H*Dh)
    k = k_ref[0]                                   # (L, H*Dh)
    v = v_ref[0]
    # additive mask row: 0 where the cache position is valid, NEG beyond
    # the prefix length (a (8, L) VMEM block so vmap-batched block specs
    # stay tiling-compliant; only row 0 is meaningful)
    mask = mask_ref[0, 0:1, :]                     # (1, L)
    valid = mask > 0.5 * NEG
    N_pad = q.shape[0]

    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (N_pad, L)
        s = s + mask
        m = jnp.max(s, axis=1, keepdims=True)      # (N_pad, 1)
        p = jnp.where(valid, jnp.exp(s - m), 0.0)
        lsum = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (N_pad, Dh)
        o_ref[0, :, sl] = o
        m_ref[0, :, h: h + 1] = m
        l_ref[0, :, h: h + 1] = lsum


@functools.partial(jax.jit, static_argnames=("interpret",))
def peek_cache_attention(q, k_cache, v_cache, lengths,
                         interpret: bool | None = None):
    """Flash partials of ``q`` against the masked cache.

    ``q (B, N, H, Dh)`` pre-scaled queries; ``k/v_cache (B, L, H, Dh)``;
    ``lengths (B,)`` valid cache positions. Returns
    ``(o (B,N,H,Dh) f32 unnormalized, m (B,N,H) f32, l (B,N,H) f32)``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, N, H, Dh = q.shape
    L = k_cache.shape[1]
    N_pad = -(-N // 8) * 8
    qf = q.reshape(B, N, H * Dh)
    if N_pad != N:
        qf = jnp.pad(qf, ((0, 0), (0, N_pad - N), (0, 0)))
    kf = k_cache.reshape(B, L, H * Dh)
    vf = v_cache.reshape(B, L, H * Dh)
    mask = jnp.where(jnp.arange(L)[None, :] < lengths[:, None],
                     0.0, NEG).astype(jnp.float32)          # (B, L)
    mask = jnp.broadcast_to(mask[:, None, :], (B, 8, L))

    o, m, lsum = pl.pallas_call(
        functools.partial(_kernel, n_heads=H, d_head=Dh),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, L), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, H * Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, H * Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, H * Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N_pad, H * Dh), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, H_PAD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_pad, H_PAD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N_pad, H * Dh), jnp.float32),
            jax.ShapeDtypeStruct((B, N_pad, H_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, N_pad, H_PAD), jnp.float32),
        ],
        interpret=interpret,
    )(mask, qf, kf, vf)
    return (o[:, :N].reshape(B, N, H, Dh), m[:, :N, :H], lsum[:, :N, :H])


def peek_cache_attention_xla(q, k_cache, v_cache, lengths):
    """XLA oracle (identical math, materializes the score tensor)."""
    B, N, H, Dh = q.shape
    L = k_cache.shape[1]
    s = jnp.einsum("bnhk,blhk->bnhl", q, k_cache,
                   preferred_element_type=jnp.float32)
    valid = (jnp.arange(L)[None, None, None, :]
             < lengths[:, None, None, None])
    s = jnp.where(valid, s, NEG)
    m = jnp.max(s, axis=-1)
    p = jnp.where(valid, jnp.exp(s - m[..., None]), 0.0)
    lsum = jnp.sum(p, axis=-1)
    o = jnp.einsum("bnhl,blhk->bnhk", p.astype(v_cache.dtype), v_cache,
                   preferred_element_type=jnp.float32)
    return o, m, lsum


def merge_partials(o1, m1, l1, o2, m2, l2):
    """Standard flash combine of two unnormalized attention partials.

    Shapes: ``o (..., Dh) f32``, ``m/l (...) f32``. Returns the normalized
    attention output ``(..., Dh) f32``. A partial with ``l == 0`` (fully
    masked, ``m == NEG``) contributes nothing.
    """
    m = jnp.maximum(m1, m2)
    a1 = jnp.where(l1 > 0, jnp.exp(m1 - m), 0.0)
    a2 = jnp.where(l2 > 0, jnp.exp(m2 - m), 0.0)
    denom = l1 * a1 + l2 * a2
    out = o1 * a1[..., None] + o2 * a2[..., None]
    return out / jnp.maximum(denom, 1e-30)[..., None]


def combine_partials(o1, m1, l1, o2, m2, l2):
    """Unnormalized flash combine: one partial equivalent to having
    attended both sources, chainable (associative) before a final
    ``merge_partials``. Same shape/masking conventions."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.where(l1 > 0, jnp.exp(m1 - m), 0.0)
    a2 = jnp.where(l2 > 0, jnp.exp(m2 - m), 0.0)
    return (o1 * a1[..., None] + o2 * a2[..., None], m,
            l1 * a1 + l2 * a2)
