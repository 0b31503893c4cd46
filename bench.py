"""Headline benchmarks: end-to-end OCR throughput on one TPU chip, batch 32.

Two metrics, both at production shape (H=128, W=1200 — the reference's
``max_width`` cap, `Debug_Notebook.ipynb` cells 5-6 — 7,375 classes):

1. **Greedy** (BASELINE config #1-3 path): uint8 H2D (4x less transfer than
   f32; normalization fused on device) -> bf16 SE-ResNet forward -> on-device
   greedy CTC collapse -> compact-index D2H -> host string join, with the
   next batch's H2D overlapped with compute.

2. **LM-fused beam search** (BASELINE config #5, the reference's dominant
   bottleneck: per-(sample, timestep) Python beam loop with synchronous
   transformer-LM calls, `ctc_codec.py:183-285`): the same uint8 H2D + bf16
   forward, then Pallas top-K/log-softmax prep and the KV-cached LM-fused
   device skip-search through ``decode.adaptive.AdaptiveLMBeam`` — the
   identical code path `test.py -bm -dm beam-search -utp -uts -ss` serves —
   with a full-size (512d/6L) char LM. Decode cost depends on posterior
   peakiness, and an UNTRAINED recognizer is maximally un-peaky, so the
   decoder consumes synthesized trained-model-statistics posteriors
   (``utils.posteriors``) injected on device as ``peaky + 1e-30 * forward``:
   the forward still executes inside the timed program (the scaled add keeps
   the data dependence without perturbing the decode), and the timing is the
   true pipeline cost a trained checkpoint would see.

Baseline (``vs_baseline``): the torch reference model (same 38M-param
architecture) measured on this host's CPU at W=1200: 0.0603 lines/sec/core,
greedy (the reference publishes no absolute latency numbers — `test.py:
197-198`, `deploy.py:114-125` print unrecorded wall-clock). The LM-beam
metric's reference point is the round-2 decode-only number (10.55 lines/sec)
recorded in ``extra``.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import time

import numpy as np

TORCH_CPU_BASELINE_LINES_PER_SEC = 0.0603

BATCH = 32
WIDTH = 1200
HEIGHT = 128
NUM_CLASSES = 7375
ITERS_GREEDY = 20
ITERS_LM = 6


def _bench_greedy(jax, jnp, model, variables, codec, batches, dev,
                  quant=None):
    from handwritten_chinese_ocr_samples_tpu.ops.decode import (
        greedy_decode_device)
    unknown_id = NUM_CLASSES - 1

    @jax.jit
    def infer(variables, x_u8):
        # Normalization on device (`dataset.py:85`: (x/255 - 0.5) / 0.5).
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        logits = model.apply(variables, x, train=False, quant=quant)
        return greedy_decode_device(logits, None, unknown_id=unknown_id)

    # Warm up the transfer path and compile.
    x = jax.device_put(batches[0], dev)
    chars, lengths = infer(variables, x)
    np.asarray(chars)

    from concurrent.futures import ThreadPoolExecutor
    xfer = ThreadPoolExecutor(max_workers=1)
    t0 = time.perf_counter()
    total_lines = 0
    next_fut = xfer.submit(jax.device_put, batches[0], dev)
    pending = None
    for i in range(ITERS_GREEDY):
        x = next_fut.result()
        # Overlap the next batch's H2D with this batch's compute.
        next_fut = xfer.submit(jax.device_put,
                               batches[(i + 1) % len(batches)], dev)
        outs = infer(variables, x)         # async dispatch — don't sync yet
        if pending is not None:
            # Convert the PREVIOUS batch while this one computes: the
            # blocking D2H sync (~26 ms round-trip on the tunnel) hides
            # behind device time instead of serializing with it.
            codec.compact_to_texts(np.asarray(pending[0]),
                                   np.asarray(pending[1]))
            total_lines += BATCH
        pending = outs
    codec.compact_to_texts(np.asarray(pending[0]), np.asarray(pending[1]))
    total_lines += BATCH
    dt = time.perf_counter() - t0
    xfer.shutdown(wait=False)
    return total_lines / dt


def _bench_lm_beam(jax, jnp, model, variables, codec, batches, dev,
                   quant=None):
    from handwritten_chinese_ocr_samples_tpu.decode.adaptive import (
        AdaptiveLMBeam)
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        make_id_tables)
    from handwritten_chinese_ocr_samples_tpu.lm.cached import CachedLM
    from handwritten_chinese_ocr_samples_tpu.lm.model import CharTransformerLM
    from handwritten_chinese_ocr_samples_tpu.lm.tokenizer import Tokenizer
    from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
        topk_logsoftmax)
    from handwritten_chinese_ocr_samples_tpu.utils.posteriors import (
        synth_peaky_logits)

    tokenizer = Tokenizer.from_characters("".join(codec.chars_list))
    lm_model = CharTransformerLM(vocab_size=tokenizer.vocab_size)
    lm_params = jax.jit(lm_model.init, static_argnames=("train",))(
        {"params": jax.random.key(1)},
        jnp.zeros((1, 8), jnp.int32), train=False)["params"]
    clm = CachedLM(lm_model, lm_params, dtype=jnp.bfloat16)
    c2l, l2c = make_id_tables(codec, tokenizer)
    beam = AdaptiveLMBeam(
        clm, c2l, l2c, unknown_id=codec.unknown_id,
        lm_panelty=0.8, len_bonus=4.8, skip_search=True, verbose=True)

    depth = 10

    @jax.jit
    def prep(variables, x_u8, peaky):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        fwd = model.apply(variables, x, train=False, quant=quant)
        # Decode consumes trained-statistics posteriors; the scaled add
        # keeps the forward inside the timed program without affecting
        # the decoded text (see module docstring).
        logits = peaky + fwd * jnp.float32(1e-30)
        cv, ci, blank_lp, n_above = topk_logsoftmax(logits, k=depth)
        logz = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1)
        return cv, ci, logits, logz, blank_lp, n_above

    peakies = [
        jax.device_put(jnp.asarray(synth_peaky_logits(
            BATCH, WIDTH, NUM_CLASSES, seed=s)), dev)
        for s in range(2)
    ]

    def run_once(i, x):
        outs = prep(variables, x, peakies[i % len(peakies)])
        prefixes, lengths = beam.decode(*outs)
        return codec.compact_to_texts(np.asarray(prefixes),
                                      np.asarray(lengths))

    def dispatch(i, x):
        outs = prep(variables, x, peakies[i % len(peakies)])
        return beam.decode_async(*outs)

    def finalize(pending):
        prefixes, lengths = pending.result()
        return codec.compact_to_texts(np.asarray(prefixes),
                                      np.asarray(lengths))

    # Warm up/compile both posterior variants (auto knobs settle here).
    x = jax.device_put(batches[0], dev)
    for i in range(len(peakies)):
        texts = run_once(i, x)
    n_chars = [len(t) for t in texts[:4]]

    from concurrent.futures import ThreadPoolExecutor
    xfer = ThreadPoolExecutor(max_workers=1)
    t0 = time.perf_counter()
    total_lines = 0
    next_fut = xfer.submit(jax.device_put, batches[0], dev)
    pending = None
    for i in range(ITERS_LM):
        x = next_fut.result()
        next_fut = xfer.submit(jax.device_put,
                               batches[(i + 1) % len(batches)], dev)
        pd = dispatch(i, x)
        if pending is not None:
            # Convert the PREVIOUS batch's strings (and run its overflow
            # check) while this batch decodes — same pipelining as greedy.
            finalize(pending)
            total_lines += BATCH
        pending = pd
    finalize(pending)
    total_lines += BATCH
    dt = time.perf_counter() - t0
    xfer.shutdown(wait=False)
    print(f"lm-beam e2e: decoded ~{n_chars} chars/line; "
          f"{total_lines / dt:.2f} lines/sec", flush=True)
    return total_lines / dt


def main():
    import jax
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.models.hctr import hctr_model

    model = hctr_model(num_classes=NUM_CLASSES, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    init_x = jnp.zeros((BATCH, HEIGHT, WIDTH, 1), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng}, init_x, train=False)
    codec = CTCCodec("".join(chr(0x4E00 + i) for i in range(NUM_CLASSES - 2)))

    host_rng = np.random.default_rng(0)
    batches = [
        host_rng.integers(0, 256, (BATCH, HEIGHT, WIDTH, 1), dtype=np.uint8)
        for _ in range(3)
    ]
    dev = jax.devices()[0]

    greedy_lps = _bench_greedy(jax, jnp, model, variables, codec, batches,
                               dev)

    # int8 serving mode (`--int8` on test.py/deploy.py): calibrate conv
    # scales on one batch, then the same greedy pipeline with s8xs8->s32
    # convs on the MXU (~1.9x bf16 conv rate on v5e).
    from handwritten_chinese_ocr_samples_tpu.serve.quant import (
        calibrate_for_model)
    x_cal = jax.device_put(batches[0], dev).astype(jnp.float32) / 127.5 - 1.0
    quant = calibrate_for_model(model, variables, [x_cal])
    del x_cal
    greedy_i8_lps = _bench_greedy(jax, jnp, model, variables, codec,
                                  batches, dev, quant=quant)

    lm_lps = _bench_lm_beam(jax, jnp, model, variables, codec, batches, dev)
    lm_i8_lps = _bench_lm_beam(jax, jnp, model, variables, codec, batches,
                               dev, quant=quant)

    print(json.dumps({
        "metric": "ocr_greedy_lines_per_sec_per_chip_b32_w1200",
        "value": round(greedy_lps, 2),
        "unit": "lines/sec/chip",
        "vs_baseline": round(
            greedy_lps / TORCH_CPU_BASELINE_LINES_PER_SEC, 1),
        "extra": {
            "greedy_int8_lines_per_sec_per_chip_b32_w1200": round(
                greedy_i8_lps, 2),
            "lm_beam_e2e_lines_per_sec_per_chip_b32_w1200": round(lm_lps, 2),
            "lm_beam_e2e_int8_lines_per_sec_per_chip_b32_w1200": round(
                lm_i8_lps, 2),
            "lm_beam_decode_only_r3_lines_per_sec": 18.77,
            "lm_beam_path": "test.py -bm -dm beam-search -utp -uts -ss "
                            "(forward + Pallas top-K + adaptive LM-fused "
                            "skip-search, 512d/6L LM)",
        },
    }))


if __name__ == "__main__":
    main()
