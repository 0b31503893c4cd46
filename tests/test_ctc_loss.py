"""CTC loss parity vs torch.nn.CTCLoss (the reference criterion)."""

import numpy as np
import pytest

import jax.numpy as jnp

from handwritten_chinese_ocr_samples_tpu.ops.ctc import (
    ctc_loss_mean, widths_to_paddings,
)


def _torch_ctc(logits, labels, label_lengths, input_lengths):
    torch = pytest.importorskip("torch")
    lp = torch.from_numpy(logits).log_softmax(2).transpose(0, 1)  # (T,B,K)
    crit = torch.nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)
    targets = torch.from_numpy(
        np.concatenate([lab[:n] for lab, n in zip(labels, label_lengths)]))
    return float(crit(lp, targets,
                      torch.from_numpy(np.asarray(input_lengths)),
                      torch.from_numpy(np.asarray(label_lengths))))


@pytest.mark.parametrize("seed", [0, 1])
def test_ctc_loss_matches_torch(seed):
    rng = np.random.default_rng(seed)
    B, T, K, L = 3, 24, 12, 6
    logits = rng.normal(size=(B, T, K)).astype(np.float32)
    label_lengths = rng.integers(1, L + 1, B)
    labels = np.zeros((B, L), np.int32)
    paddings = np.ones((B, L), np.float32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.integers(
            1, K - 1, label_lengths[b])
        paddings[b, : label_lengths[b]] = 0.0

    want = _torch_ctc(logits, labels, label_lengths, [T] * B)
    got = float(ctc_loss_mean(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(paddings)))
    assert got == pytest.approx(want, rel=1e-4)


def test_ctc_loss_with_width_mask_matches_torch():
    rng = np.random.default_rng(2)
    B, T, K, L = 2, 20, 10, 4
    logits = rng.normal(size=(B, T, K)).astype(np.float32)
    widths = np.array([14, 20], np.int32)
    label_lengths = np.array([3, 4])
    labels = np.zeros((B, L), np.int32)
    paddings = np.ones((B, L), np.float32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.integers(
            1, K - 1, label_lengths[b])
        paddings[b, : label_lengths[b]] = 0.0

    want = _torch_ctc(logits, labels, label_lengths, widths.tolist())
    lp = widths_to_paddings(jnp.asarray(widths), T)
    got = float(ctc_loss_mean(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(paddings), lp))
    assert got == pytest.approx(want, rel=1e-4)


def test_widths_to_paddings():
    lp = np.asarray(widths_to_paddings(jnp.asarray([2, 4]), 4))
    np.testing.assert_array_equal(lp, [[0, 0, 1, 1], [0, 0, 0, 0]])


def test_infeasible_sequence_zeroed():
    """Target longer than the input -> infinite NLL -> zeroed
    (zero_infinity, `main.py:205`)."""
    B, T, K, L = 2, 3, 6, 5
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(B, T, K)).astype(np.float32))
    labels = jnp.asarray(
        np.tile(np.array([1, 2, 3, 4, 5], np.int32), (B, 1)))
    paddings = jnp.zeros((B, L), jnp.float32)  # 5 labels, 3 frames
    loss = float(ctc_loss_mean(logits, labels, paddings))
    assert np.isfinite(loss)
