"""Speed-of-light analysis for the hctr train step (VERDICT round-2 #4).

Measures every conv shape in the SE-ResNet backbone (`models/hctr.py`)
in isolation — forward and backward — at the training batch/width, and
sums the best-case times into a conv-only floor for the full train step.
If the measured full step is close to (floor + measured dropout/BN/CTC
overheads), the step is compositionally near-optimal and the remaining
gap to any ms target is XLA's conv kernel efficiency at these shapes,
not framework overhead.

Shapes: NHWC, bf16, f32 accumulation (the MXU native path). FLOPs are
2 * 9 * Cin * Cout * H * W * B per 3x3 conv (1x1 for downsample).

Usage: python tools/conv_ceiling.py [--batch 16] [--width 1200] [-k 5]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


# (name, Cin, Cout, H, kernel, count) at b16/w1200 — H is the height the
# conv runs at; counts aggregate identical shapes across blocks.
def backbone_convs():
    convs = [
        ("stem 1->64 @H128", 1, 64, 128, 3, 1),
        ("stem 64->64 @H128", 64, 64, 128, 3, 1),
        # stage1 (H=64): block1_0 conv1 64->128, 3x conv 128->128
        # (b1_0.conv2, b1_1 conv1+conv2), transition; down 1x1
        ("s1 64->128 @H64", 64, 128, 64, 3, 1),
        ("s1 128->128 @H64", 128, 128, 64, 3, 4),
        ("s1 down 64->128 @H64", 64, 128, 64, 1, 1),
        # stage2 (H=32): b2_0 conv1 128->256, 7x 256->256, down
        ("s2 128->256 @H32", 128, 256, 32, 3, 1),
        ("s2 256->256 @H32", 256, 256, 32, 3, 8),
        ("s2 down 128->256 @H32", 128, 256, 32, 1, 1),
        # stage3 (H=16): b3_0 conv1 256->512, 10x 512->512, down
        ("s3 256->512 @H16", 256, 512, 16, 3, 1),
        ("s3 512->512 @H16", 512, 512, 16, 3, 10),
        ("s3 down 256->512 @H16", 256, 512, 16, 1, 1),
        # stage4 (H=8): b4_0 conv1+conv2, transition
        ("s4 512->512 @H8", 512, 512, 8, 3, 3),
    ]
    return convs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("-k", "--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, W = args.batch, args.width
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    peak = 197e12 if "v5 lite" in dev.device_kind else float("nan")

    # Per-dispatch latency on the tunneled TPU is ~8-10 ms — larger than
    # many of the convs being measured. Time N iterations INSIDE one
    # compiled fori_loop instead, with a scalar carried from each output
    # into the next input so XLA can neither hoist the conv out of the
    # loop nor dead-code it (profile_lm_step --scan methodology, NOTES.md).
    N_IN = 24

    def timed(per_iter, x):
        @jax.jit
        def loop(x):
            def body(_, carry):
                x, s = carry
                y = per_iter(x + s)
                # FULL reduction: consuming a slice lets XLA compute just
                # that slice of the conv (first version measured >100% MFU)
                s2 = (jnp.sum(y, dtype=jnp.float32)
                      .astype(x.dtype) * jnp.asarray(1e-30, x.dtype))
                return (x, s2)
            _, s = jax.lax.fori_loop(
                0, N_IN, body, (x, jnp.zeros((), x.dtype)))
            return s

        out = loop(x)     # compile + warm
        np.asarray(jax.device_get(out))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = loop(x)
        np.asarray(jax.device_get(out))
        return (time.perf_counter() - t0) / (args.steps * N_IN)

    total_fwd = total_bwd = total_flops = 0.0
    print(f"{'conv':26s} {'n':>2s} {'GF':>7s} {'fwd ms':>7s} {'TF/s':>6s} "
          f"{'MFU':>4s} {'bwd ms':>7s} {'TF/s':>6s} {'MFU':>4s}")
    for name, cin, cout, h, ksz, count in backbone_convs():
        x = jnp.zeros((B, h, W, cin), jnp.bfloat16)
        w = jnp.zeros((ksz, ksz, cin, cout), jnp.bfloat16)
        pad = "SAME" if ksz == 3 else "VALID"

        def conv2(x, w):
            # bf16 in/out (f32 MXU accumulate), as in the model's convs
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv(x):
            return conv2(x, w)

        def grads(x):
            dx, dw = jax.grad(
                lambda x, w: jnp.sum(conv2(x, w), dtype=jnp.float32),
                argnums=(0, 1))(x, w)
            # fold dw into a dx-shaped "y" so the timing carry sees both
            return dx + jnp.sum(dw, dtype=jnp.float32).astype(dx.dtype)

        gflop = 2 * ksz * ksz * cin * cout * h * W * B / 1e9
        t_f = timed(conv, x)
        t_b = timed(grads, x)
        tf_f, tf_b = gflop / t_f / 1e3, 2 * gflop / t_b / 1e3
        print(f"{name:26s} {count:2d} {gflop:7.0f} {t_f * 1e3:7.2f} "
              f"{tf_f:6.1f} {tf_f * 1e12 / peak:4.0%} {t_b * 1e3:7.2f} "
              f"{tf_b:6.1f} {tf_b * 1e12 / peak:4.0%}")
        total_fwd += count * t_f
        total_bwd += count * t_b
        total_flops += count * 3 * gflop * 1e9  # fwd + dgrad + wgrad

    print(f"\nconv-only floor (sum of isolated best): "
          f"fwd {total_fwd * 1e3:.0f} ms + bwd {total_bwd * 1e3:.0f} ms = "
          f"{(total_fwd + total_bwd) * 1e3:.0f} ms "
          f"({total_flops / 1e12:.1f} TFLOP, "
          f"{total_flops / (total_fwd + total_bwd) / 1e12:.0f} TFLOP/s = "
          f"{total_flops / (total_fwd + total_bwd) / peak:.0%} MFU)")
    print("compare: tools/profile_train_step.py full-step ms at the same "
          "batch/width; the difference is non-conv work (BN stats, "
          "dropout, CTC, optimizer, pools, SE) plus fusion wins/losses.")


if __name__ == "__main__":
    main()
