"""Pallas TPU kernel: beam-reorder + one-token write of the LM KV cache.

Every committed beam-search step permutes the per-beam KV cache by the
survivors' parent indices and writes the new token's k/v at each beam's
length (`lm/cached.CachedLM.gather_write`). Expressed in XLA this is
either a per-row dynamic scatter (serializes on TPU) or a one-hot matmul
(+ select epilogue) — the one-hot form is MXU-shaped but still profiled
~2.9 ms/step at production shape, ~8x off the bandwidth floor for the
~280 MB it actually has to move.

Here the permutation is pure data movement: the parent index feeds the
*BlockSpec index_map* via scalar prefetch, so each (lane, layer, beam)
grid step DMAs the parent's (L, H*Dh) cache block straight through VMEM
and merges the single written row with a VPU select. No FLOPs, no
epilogue pass — just pipelined copies at DMA bandwidth.

The grouped decoder vmaps G lines through one scan. JAX's default
batching for scalar-prefetch kernels is an *explicit sequential loop*
over the lanes — measured 15.5 vs 17.5 lines/sec end-to-end (it
serializes the lanes' DMA streams). The kernel therefore carries a
native lane dimension and a ``custom_vmap`` rule that folds the mapped
axis into the grid, keeping all lanes in one pipelined program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, wpos_ref, ck_ref, cv_ref, kn_ref, vn_ref,
            ok_ref, ov_ref, *, L: int):
    g = pl.program_id(0)
    b = pl.program_id(1)
    w = wpos_ref[g, b]
    # ck/cv blocks were fetched from row idx[g, b] (see index_map) — the
    # reorder already happened; merge the written row in with a VPU
    # select (Mosaic cannot store at a dynamic sublane offset, and
    # w >= L naturally selects nothing).
    row = jax.lax.broadcasted_iota(jnp.int32, (1, L, 1), 1) == w
    ok_ref[0, :, 0] = jnp.where(row, kn_ref[0, :, 0], ck_ref[0, :, 0])
    ov_ref[0, :, 0] = jnp.where(row, vn_ref[0, :, 0], cv_ref[0, :, 0])


def _impl(ck, cv, idx, kn, vn, wpos, interpret):
    """Lane-carrying kernel body. ``ck/cv (G, layers, B, L, H*Dh)``,
    ``idx/wpos (G, B)``, ``kn/vn (G, layers, B, 1, H*Dh)``. One grid
    step per (lane, beam) moves all layers at once — fewer, bigger DMAs
    (the write position is shared across layers)."""
    G, layers, B, L, HDh = ck.shape

    def cache_map(g, b, idx_ref, wpos_ref):
        return (g, 0, idx_ref[g, b], 0, 0)

    def row_map(g, b, idx_ref, wpos_ref):
        return (g, 0, b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, B),
        in_specs=[
            pl.BlockSpec((1, layers, 1, L, HDh), cache_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layers, 1, L, HDh), cache_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layers, 1, 1, HDh), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layers, 1, 1, HDh), row_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, layers, 1, L, HDh), row_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, layers, 1, L, HDh), row_map,
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, L=L),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(ck.shape, ck.dtype),
            jax.ShapeDtypeStruct(cv.shape, cv.dtype),
        ],
        interpret=interpret,
    )(idx.astype(jnp.int32), wpos.astype(jnp.int32), ck, cv, kn, vn)


def _flat(cache_k, cache_v, k_new, v_new, lanes_first: bool):
    """Reshape the public 5D/6D operands to the kernel layout."""
    if lanes_first:
        G, layers, B, L, H, Dh = cache_k.shape
    else:
        layers, B, L, H, Dh = cache_k.shape
        G = 1
    shp = (G, layers, B)
    return (cache_k.reshape(shp + (L, H * Dh)),
            cache_v.reshape(shp + (L, H * Dh)),
            k_new.astype(cache_k.dtype).reshape(shp + (1, H * Dh)),
            v_new.astype(cache_v.dtype).reshape(shp + (1, H * Dh)))


@custom_batching.custom_vmap
def gather_write_kv(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                    idx: jnp.ndarray, k_new: jnp.ndarray,
                    v_new: jnp.ndarray, wpos: jnp.ndarray):
    """``out[l, p, t] = new[l, p] if t == wpos[p] else cache[l, idx[p], t]``.

    ``cache_k/v (layers, B, L, H, Dh)``; ``idx/wpos (B,)`` int32;
    ``k/v_new (layers, B, H, Dh)`` already reordered (indexed by the NEW
    beam position p, not the parent). ``wpos[p] >= L`` writes nothing.
    Returns the new ``(k, v)`` pair; lengths stay with the caller.
    Runs in interpret mode off-TPU (exercised by the unit tests).
    """
    interpret = jax.default_backend() != "tpu"
    ck, cv, kn, vn = _flat(cache_k, cache_v, k_new, v_new,
                           lanes_first=False)
    ok, ov = _impl(ck, cv, idx[None], kn, vn, wpos[None], interpret)
    return ok.reshape(cache_k.shape), ov.reshape(cache_v.shape)


@gather_write_kv.def_vmap
def _gather_write_kv_vmap(axis_size, in_batched, cache_k, cache_v, idx,
                          k_new, v_new, wpos):
    """Fold the mapped axis into the kernel grid: one pipelined program
    over all lanes instead of JAX's sequential explicit-loop fallback
    for batched scalar-prefetch operands."""
    def bc(x, batched):
        return x if batched else jnp.broadcast_to(
            x[None], (axis_size,) + x.shape)
    cache_k, cache_v, idx, k_new, v_new, wpos = map(
        bc, (cache_k, cache_v, idx, k_new, v_new, wpos), in_batched)
    interpret = jax.default_backend() != "tpu"
    ck, cv, kn, vn = _flat(cache_k, cache_v, k_new, v_new,
                           lanes_first=True)
    ok, ov = _impl(ck, cv, idx, kn, vn, wpos, interpret)
    return ((ok.reshape(cache_k.shape), ov.reshape(cache_v.shape)),
            (True, True))
