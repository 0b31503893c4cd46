"""Headline benchmark: text lines/sec/chip, batch 32, end-to-end greedy OCR.

Measures the production inference path on one TPU chip: uint8 H2D (4x less
transfer than f32; normalization fused on device) -> bf16 SE-ResNet forward
(7375-class head) -> on-device greedy CTC collapse -> compact-index D2H ->
host string join, with the next batch's H2D overlapped with compute
(double buffering). Width 1200 matches the reference's production
``max_width`` cap (`Debug_Notebook.ipynb` cells 5-6).

Baseline (``vs_baseline``): the torch reference model (same 38M-param
architecture, ``models/handwritten_ctr_model.py``) measured on this host's
CPU at W=1200: 0.0603 lines/sec/core (single-core host; the reference
publishes no absolute latency numbers — `test.py:197-198` and
`deploy.py:114-125` only print unrecorded wall-clock).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

TORCH_CPU_BASELINE_LINES_PER_SEC = 0.0603

BATCH = 32
WIDTH = 1200
HEIGHT = 128
NUM_CLASSES = 7375
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.models.hctr import hctr_model
    from handwritten_chinese_ocr_samples_tpu.ops.decode import (
        greedy_decode_device)

    model = hctr_model(num_classes=NUM_CLASSES, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    init_x = jnp.zeros((BATCH, HEIGHT, WIDTH, 1), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng}, init_x, train=False)

    unknown_id = NUM_CLASSES - 1

    @jax.jit
    def infer(variables, x_u8):
        # Normalization on device (`dataset.py:85`: (x/255 - 0.5) / 0.5).
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        logits = model.apply(variables, x, train=False)
        return greedy_decode_device(logits, None, unknown_id=unknown_id)

    codec = CTCCodec("".join(chr(0x4E00 + i) for i in range(NUM_CLASSES - 2)))

    host_rng = np.random.default_rng(0)
    batches = [
        host_rng.integers(0, 256, (BATCH, HEIGHT, WIDTH, 1), dtype=np.uint8)
        for _ in range(3)
    ]

    # Warm up the transfer path and compile.
    dev = jax.devices()[0]
    x = jax.device_put(batches[0], dev)
    chars, lengths = infer(variables, x)
    np.asarray(chars)

    from concurrent.futures import ThreadPoolExecutor
    xfer = ThreadPoolExecutor(max_workers=1)

    t0 = time.perf_counter()
    total_lines = 0
    next_fut = xfer.submit(jax.device_put, batches[0], dev)
    for i in range(ITERS):
        x = next_fut.result()
        # Overlap the next batch's H2D with this batch's compute.
        next_fut = xfer.submit(jax.device_put,
                               batches[(i + 1) % len(batches)], dev)
        chars, lengths = infer(variables, x)
        # Host string conversion (the only irreducible host work).
        codec.compact_to_texts(np.asarray(chars), np.asarray(lengths))
        total_lines += BATCH
    dt = time.perf_counter() - t0
    xfer.shutdown(wait=False)

    lines_per_sec = total_lines / dt
    print(json.dumps({
        "metric": "ocr_greedy_lines_per_sec_per_chip_b32_w1200",
        "value": round(lines_per_sec, 2),
        "unit": "lines/sec/chip",
        "vs_baseline": round(
            lines_per_sec / TORCH_CPU_BASELINE_LINES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
