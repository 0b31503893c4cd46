#!/usr/bin/env python
"""Serving-daemon load benchmark: throughput + per-request latency tails.

The reference's deployment story is a synchronous one-image loop whose
average latency it prints but never published (`deploy.py:109-125`). The
production question for continuous serving is different: under a
concurrent request stream, what throughput does deadline batching
sustain and what do the latency TAILS look like? This drives the real
``ServingDaemon`` (deadline-batched queue over AOT executables) with a
Poisson-ish open-loop arrival process from worker threads, then reports
lines/sec and p50/p90/p99 submit-to-result latency.

    python tools/bench_serving.py [--requests 256] [--rate 120]
        [--batch 8] [--delay-ms 30] [--width 1200] [--int8]

Defaults exercise the full 38M-param hctr model at the production width
on whatever device JAX provides (the tunneled v5e here).
"""

import argparse
import os
import sys
import tempfile
import threading
import time

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

NUM_CLASSES = 7375


def make_images(tmpdir: str, n: int, height: int, max_width: int):
    """Write n random grayscale line PNGs of varied width (distinct widths
    exercise the bucket queues)."""
    from PIL import Image
    rng = np.random.default_rng(0)
    files = []
    for i in range(n):
        w = int(rng.integers(max_width // 3, max_width))
        img = rng.integers(0, 256, (height, w), dtype=np.uint8)
        path = os.path.join(tmpdir, f"line_{i:04d}.png")
        Image.fromarray(img).save(path)
        files.append(path)
    return files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--rate", type=float, default=120.0,
                    help="target arrivals/sec (open loop)")
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--delay-ms", type=float, default=30.0)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--n-files", type=int, default=48)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="hctr-tiny-sized model + small shapes (CPU smoke)")
    args = ap.parse_args()
    if args.tiny:
        args.width, args.n_files = 256, 12
        args.requests = min(args.requests, 24)

    import jax.numpy as jnp
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.models.hctr import hctr_model
    from handwritten_chinese_ocr_samples_tpu.serve.daemon import ServingDaemon
    from handwritten_chinese_ocr_samples_tpu.serve.engine import ServingEngine

    import jax
    if args.tiny:
        from handwritten_chinese_ocr_samples_tpu.models.hctr import HCTRModel
        n_classes = 64
        model = HCTRModel(num_classes=n_classes, backbone_channels=64,
                          num_blocks=(1, 1, 1, 1), dtype=jnp.bfloat16)
    else:
        n_classes = NUM_CLASSES
        model = hctr_model(num_classes=n_classes, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 128, args.width, 1), jnp.float32), train=False)
    codec = CTCCodec("".join(chr(0x4E00 + i) for i in range(n_classes - 2)))

    print(f"compiling serving executables (b{args.batch}, w{args.width}, "
          f"int8={args.int8})...", flush=True)
    engine = ServingEngine(model, variables, codec, widths=(args.width,),
                           batch_sizes=(args.batch,), int8=args.int8)

    with tempfile.TemporaryDirectory() as td:
        files = make_images(td, args.n_files, model.img_height, args.width)
        # warm the pipeline (and calibrate under --int8) before timing
        engine.infer_files_batched(files[: args.batch],
                                   batch_size=args.batch)

        daemon = ServingDaemon(engine, batch_size=args.batch,
                               max_delay_ms=args.delay_ms)
        lat, lock = [], threading.Lock()
        rng = np.random.default_rng(7)
        per_client = args.requests // args.clients
        interval = args.clients / args.rate

        def client(cid: int):
            local_rng = np.random.default_rng(100 + cid)
            for k in range(per_client):
                t0 = time.monotonic()
                f = files[int(local_rng.integers(len(files)))]
                fut = daemon.submit(f)
                text = fut.result(timeout=120)
                dt = time.monotonic() - t0
                assert isinstance(text, str)
                with lock:
                    lat.append(dt)
                # open-ish loop: pace the next arrival
                sleep = interval * float(local_rng.exponential(1.0))
                time.sleep(min(sleep, 0.5))

        del rng
        t0 = time.monotonic()
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        daemon.close()

    lat_ms = np.sort(np.asarray(lat)) * 1e3
    n = len(lat_ms)
    print(f"served {n} requests in {wall:.1f}s -> "
          f"{n / wall:.1f} lines/sec sustained")
    for q in (50, 90, 99):
        print(f"  p{q} latency: {np.percentile(lat_ms, q):.0f} ms")
    print(f"  max latency: {lat_ms[-1]:.0f} ms "
          f"(batch {args.batch}, deadline {args.delay_ms} ms, "
          f"{args.clients} clients)")


if __name__ == "__main__":
    main()
