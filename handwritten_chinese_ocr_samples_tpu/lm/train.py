"""Training loop for the first-party char LM.

Replaces the reference's external fairseq recipe (`third-party/README.md:
54-95`: ``fairseq-train --task language_modeling --arch transformer_lm`` on
the char-spaced news2016 corpus, target PPL ~29 on the HWDB2.x page corpus).
Next-token cross-entropy with eos-fill semantics matching the tokenizer:
position ``t`` predicts token ``t+1``; loss is masked to each sentence's
``len + 1`` positions (its characters plus the closing ``</s>``).
"""

from __future__ import annotations

import time
from typing import Iterable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .model import CharTransformerLM
from .tokenizer import Tokenizer


def make_lm_train_step(model, tx):
    @jax.jit
    def step(params, opt_state, tokens, lengths, rng):
        def loss_fn(p):
            logits = model.apply({"params": p}, tokens, train=True,
                                 rngs={"dropout": rng})
            logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            tgt = tokens[:, 1:]
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            L = nll.shape[1]
            mask = jnp.arange(L)[None, :] < (lengths[:, None] + 1)
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def batches_from_corpus(
    lines: Sequence[str],
    tokenizer: Tokenizer,
    batch_size: int,
    max_len: int,
    seed: int = 0,
    char_based: bool = True,
) -> Iterable[tuple]:
    """Shuffle lines, bucket-pad per batch to a multiple of 32."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(lines))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        chunk = [lines[j][: max_len - 2] for j in order[i: i + batch_size]]
        longest = max(len(s) for s in chunk) + 2
        L = min(-(-longest // 32) * 32, max_len)
        toks = tokenizer.tokenize(chunk, char_based=char_based, fixed_len=L)
        lengths = np.array([min(len(s), L - 2) for s in chunk], np.int32)
        yield jnp.asarray(toks), jnp.asarray(lengths)


def train_char_lm(
    corpus_lines: List[str],
    characters: str,
    epochs: int = 1,
    batch_size: int = 64,
    max_len: int = 256,
    lr: float = 5e-4,
    warmup_steps: int = 4000,
    d_model: int = 512,
    n_layers: int = 6,
    seed: int = 0,
    log_every: int = 100,
    dtype=jnp.bfloat16,
):
    """Train a CharTransformerLM; returns (model, params, tokenizer)."""
    tokenizer = Tokenizer.from_characters(characters)
    model = CharTransformerLM(vocab_size=tokenizer.vocab_size,
                              d_model=d_model, n_layers=n_layers,
                              max_len=max_len, dtype=dtype)
    rng = jax.random.key(seed)
    init_toks = jnp.zeros((2, 32), jnp.int32)
    params = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng}, init_toks, train=False)["params"]

    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.cosine_decay_schedule(
             lr, max(1, epochs * max(1, len(corpus_lines) // batch_size)))],
        [warmup_steps])
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(schedule, weight_decay=0.01))
    opt_state = tx.init(params)
    step_fn = make_lm_train_step(model, tx)

    step = 0
    t0 = time.time()
    for epoch in range(epochs):
        for toks, lengths in batches_from_corpus(
                corpus_lines, tokenizer, batch_size, max_len,
                seed=seed + epoch):
            params, opt_state, loss = step_fn(
                params, opt_state, toks, lengths,
                jax.random.fold_in(jax.random.key(seed + 1), step))
            step += 1
            if step % log_every == 0:
                print(f"lm step {step} epoch {epoch} "
                      f"loss {float(loss):.4f} ppl {float(jnp.exp(loss)):.1f} "
                      f"({time.time() - t0:.0f}s)")
    return model, params, tokenizer
