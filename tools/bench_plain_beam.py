"""Re-measure the non-LM rows of the README table on the live TPU.

Four measurements at production shape (b32, W=1200, 7,375 classes):

  forward        uint8 normalize -> bf16 SE-ResNet forward (scalar-reduced
                 so only 4 bytes cross the tunnel per sync)
  beam-sorted    device beam search alone on synthetic peaky posteriors
                 (keys-only sort merge — the default)
  beam-dense     same, per-frame dense hash merge (HCTR_DENSE_MERGE arm)
  e2e-sorted /   forward + Pallas top-K/log-softmax + device beam search,
  e2e-dense      compact indices D2H + host string join (the
                 `test.py -bm -dm beam-search` serving path)

The sorted and dense arms must decode identically (asserted) — the merge
is exact data movement, not a regrouping of float math.

Usage: python tools/bench_plain_beam.py [--iters 8]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NUM_CLASSES = 7375


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.decode.beam_device import (
        beam_search_from_topk)
    from handwritten_chinese_ocr_samples_tpu.models.hctr import hctr_model
    from handwritten_chinese_ocr_samples_tpu.ops.topk_logsoftmax import (
        topk_logsoftmax)
    from handwritten_chinese_ocr_samples_tpu.utils.posteriors import (
        synth_peaky_logits)

    B, W, D = args.batch, args.width, NUM_CLASSES
    dev = jax.devices()[0]
    codec = CTCCodec("".join(chr(0x4E00 + i) for i in range(D - 2)))
    model = hctr_model(num_classes=D, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)},
        jnp.zeros((B, 128, W, 1), jnp.float32), train=False)

    x_u8 = jax.device_put(
        np.random.default_rng(0).integers(0, 256, (B, 128, W, 1),
                                          dtype=np.uint8), dev)
    peaky = jax.device_put(
        jnp.asarray(synth_peaky_logits(B, W, D)), dev)

    def timed(fn, sync, label):
        out = fn()
        sync(out)                       # compile + path warmup
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"  {label:12s} {B / dt:7.2f} lines/sec  "
              f"({dt / B * 1000:5.1f} ms/line)", flush=True)
        return out, B / dt

    @jax.jit
    def forward_sum(variables, x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        logits = model.apply(variables, x, train=False)
        # full reduction: XLA must compute every logit, and only one f32
        # scalar crosses the tunnel (D2H sync latency ~30 ms otherwise)
        return jnp.sum(logits.astype(jnp.float32))

    print(f"forward only (b{B} w{W}):", flush=True)
    timed(lambda: forward_sum(variables, x_u8),
          lambda o: np.asarray(o), "forward")

    @jax.jit
    def prep(peaky):
        cv, ci, _blank, _n = topk_logsoftmax(peaky, k=10)
        return cv, ci

    cv, ci = prep(peaky)
    np.asarray(ci[0, 0])

    print(f"beam decode alone (synthetic posteriors, T={W}):", flush=True)
    decode_texts = {}
    for dense in (False, True):
        def run(dense=dense):
            return beam_search_from_topk(
                cv, ci, beam_size=10, unknown_id=codec.unknown_id,
                dense_merge=dense)
        (p, l), _ = timed(lambda: run(),
                          lambda o: (np.asarray(o[0]), np.asarray(o[1])),
                          "dense" if dense else "sorted")
        decode_texts[dense] = codec.compact_to_texts(np.asarray(p),
                                                     np.asarray(l))
    assert decode_texts[False] == decode_texts[True], \
        "dense merge changed the decode — it must be exact data movement"

    print(f"e2e: forward + top-K + beam + host strings (b{B} w{W}):",
          flush=True)
    for dense in (False, True):
        @jax.jit
        def infer(variables, x_u8, dense=dense):
            x = x_u8.astype(jnp.float32) / 127.5 - 1.0
            logits = model.apply(variables, x, train=False)
            cv, ci, _blank, _n = topk_logsoftmax(logits, k=10)
            return beam_search_from_topk(
                cv, ci, beam_size=10, unknown_id=codec.unknown_id,
                dense_merge=dense)

        timed(lambda: infer(variables, x_u8),
              lambda o: codec.compact_to_texts(np.asarray(o[0]),
                                               np.asarray(o[1])),
              "e2e-dense" if dense else "e2e-sorted")


if __name__ == "__main__":
    main()
