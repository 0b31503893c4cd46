"""Export CLI — the reference's ONNX export entry (`utils/export_onnx.py`)
re-targeted at StableHLO bundles.

    python -m handwritten_chinese_ocr_samples_tpu.cli.export \
        -m hctr -f <ckpt> -o exported/ -w 512,1024,1600
"""

from __future__ import annotations

import argparse


def build_argparser():
    parser = argparse.ArgumentParser(description="TPU OCR model export")
    args = parser.add_argument_group("Options")
    args.add_argument("-m", "--model-type", type=str, default="hctr",
                      choices=["hctr", "hctr-tiny"], help="model tag")
    args.add_argument("-f", "--model-file", type=str, default="",
                      metavar="PATH", help="checkpoint (orbax or .pth.tar)")
    args.add_argument("-o", "--out-dir", type=str, default="exported",
                      help="output directory")
    args.add_argument("-w", "--widths", type=str, default="512,1024,1600",
                      help="comma-separated export width buckets")
    args.add_argument("-b", "--batch-sizes", type=str, default="1",
                      help="comma-separated export batch sizes")
    args.add_argument("-cl", "--chars-list", type=str, default=None,
                      help="chars_list.txt path")
    args.add_argument("--int8-calib", dest="int8_calib", type=str,
                      default="", metavar="DIR",
                      help="folder of calibration line images: export "
                           "int8-conv artifacts with the scales baked in")
    # LM export (counterpart of `export_onnx.py:56-105`)
    args.add_argument("-tp", "--tfm-path", dest="tfm_path", type=str,
                      default="", help="char-LM dir to export alongside")
    args.add_argument("--lm-lengths", type=str, default="32,64",
                      help="comma-separated LM token-length buckets")
    args.add_argument("--lm-batch-sizes", type=str, default="1,10",
                      help="comma-separated LM batch buckets")
    return parser


def main():
    args = build_argparser().parse_args()
    if not args.model_file and not args.tfm_path:
        raise SystemExit("nothing to export: pass -f and/or -tp")
    import jax.numpy as jnp

    if args.model_file:
        from ..eval.driver import load_recognizer_variables
        from ..models.registry import get_model_info
        from ..serve.export import export_model

        model, characters = get_model_info(
            args.model_type, chars_list_file=args.chars_list,
            dtype=jnp.bfloat16)
        variables = load_recognizer_variables(args.model_file)
        widths = tuple(int(w) for w in args.widths.split(","))

        quant = None
        if args.int8_calib:
            import os
            import numpy as np
            from ..serve.engine import preprocess_fixed_shape
            from ..serve.quant import calibrate_for_model
            files = sorted(
                os.path.join(args.int8_calib, f)
                for f in os.listdir(args.int8_calib)
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))
            if not files:
                raise SystemExit(f"--int8-calib: no images in "
                                 f"{args.int8_calib}")
            batch = np.concatenate(
                [preprocess_fixed_shape(f, model.img_height, widths[0])
                 for f in files[:16]], axis=0)
            x = (jnp.asarray(batch).astype(jnp.float32) - 127.5) / 127.5
            quant = calibrate_for_model(model, variables, [x])

        meta = export_model(
            model, variables, args.out_dir, tag=args.model_type,
            widths=widths,
            batch_sizes=tuple(int(b) for b in args.batch_sizes.split(",")),
            unknown_id=len(characters) + 1, quant=quant)
        print(f"exported: {meta['artifacts']} -> {args.out_dir}")

    if args.tfm_path:
        from ..lm.io import load_lm
        from ..serve.export import export_lm

        lm_model, lm_vars, tokenizer = load_lm(args.tfm_path)
        meta = export_lm(
            lm_model, lm_vars, tokenizer, args.out_dir,
            batch_sizes=tuple(
                int(b) for b in args.lm_batch_sizes.split(",")),
            lengths=tuple(int(x) for x in args.lm_lengths.split(",")))
        print(f"exported LM: {meta['artifacts']} -> {args.out_dir}")


if __name__ == "__main__":
    main()
