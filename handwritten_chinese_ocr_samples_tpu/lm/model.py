"""First-party decoder-only character transformer LM (replaces fairseq).

The reference depends on fairseq's ``TransformerLanguageModel`` for beam-search
fusion (`transformer_infer.py:17-39`; trained per `third-party/README.md`,
target perplexity ~29 on the HWDB2.x page corpus). This is a from-scratch JAX
equivalent sized like fairseq's ``transformer_lm`` base preset (512d, 6
layers, 8 heads, 2048 FFN) and exposing the same inference surface through
``lm.infer.LMScorer``.

TPU notes: pre-norm blocks (stable in bf16), causal masking via
``nn.make_causal_mask``, static (B, L) shapes — callers bucket L. Weight
tying between the embedding and output projection is on by default.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class TransformerBlock(nn.Module):
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, *, train: bool):
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            qkv_features=self.d_model,
            dropout_rate=self.dropout,
            deterministic=not train,
            dtype=self.dtype,
            name="attn",
        )(h, h, mask=mask)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h

        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ff1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class CharTransformerLM(nn.Module):
    vocab_size: int
    d_model: int = 512
    n_layers: int = 6
    n_heads: int = 8
    d_ff: int = 2048
    max_len: int = 512
    dropout: float = 0.1
    tie_embeddings: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, *, train: bool = False
                 ) -> jnp.ndarray:
        """tokens (B, L) int -> logits (B, L, V); position t predicts t+1."""
        B, L = tokens.shape
        embed = nn.Embed(self.vocab_size, self.d_model,
                         dtype=self.dtype, name="embed")
        x = embed(tokens) * jnp.asarray(
            self.d_model ** 0.5, self.dtype)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (self.max_len, self.d_model))
        x = x + pos[None, :L].astype(self.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        mask = nn.make_causal_mask(tokens)
        for i in range(self.n_layers):
            x = TransformerBlock(self.d_model, self.n_heads, self.d_ff,
                                 self.dropout, dtype=self.dtype,
                                 name=f"layer{i}")(x, mask, train=train)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_f")(x)
        if self.tie_embeddings:
            logits = embed.attend(x)
        else:
            logits = nn.Dense(self.vocab_size, use_bias=False,
                              dtype=self.dtype, name="lm_head")(x)
        return logits.astype(jnp.float32)
