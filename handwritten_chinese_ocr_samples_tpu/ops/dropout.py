"""Recompute-in-backward dropout.

The reference model is unusually dropout-heavy — twelve block dropouts plus
four stage dropouts, the last at p=0.9 (`handwritten_ctr_model.py:96-99`) —
and under autodiff the standard formulation stores every keep-mask for the
backward pass: ~2G mask elements per b16/w1200 step of pure HBM residual
traffic (measured ~50 ms/step even with rbg keys, NOTES.md profile).

This op stores NOTHING: the backward pass regenerates the identical mask
from the same counter-RNG key.  Masks derive from uint16 random bits
(`keep = bits >= ceil(rate * 65536)`), so regeneration is exact and cheap —
one `random.bits` call each way instead of a mask round-trip through HBM.
The realized keep probability is `1 - ceil(rate * 65536) / 65536`, within
2**-16 of the requested rate (vs 2**-24 granularity of the uniform-f32
formulation — both are approximations; no test depends on mask identity
with `nn.Dropout`, only on determinism under a fixed key, which holds).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _keep_mask(key: jax.Array, shape, rate: float) -> jax.Array:
    thr = min(math.ceil(rate * 65536), 65535)
    bits = jax.random.bits(key, shape, dtype=jnp.uint16)
    return bits >= jnp.uint16(thr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dropout_recompute(x: jax.Array, key: jax.Array, rate: float) -> jax.Array:
    """``x * keep / (1 - rate)`` with the mask regenerated (not stored) in
    the backward pass. ``rate`` must be in [0, 1)."""
    scale = 1.0 / (1.0 - rate)
    mask = _keep_mask(key, x.shape, rate)
    return jnp.where(mask, x * jnp.asarray(scale, x.dtype),
                     jnp.zeros((), x.dtype))


def _fwd(x, key, rate):
    return dropout_recompute(x, key, rate), (key,)


def _bwd(rate, res, g):
    (key,) = res
    scale = 1.0 / (1.0 - rate)
    mask = _keep_mask(key, g.shape, rate)
    dx = jnp.where(mask, g * jnp.asarray(scale, g.dtype),
                   jnp.zeros((), g.dtype))
    return dx, None


dropout_recompute.defvjp(_fwd, _bwd)
