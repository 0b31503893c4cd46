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
                      choices=["hctr"], help="model tag")
    args.add_argument("-f", "--model-file", type=str, required=True,
                      metavar="PATH", help="checkpoint (orbax or .pth.tar)")
    args.add_argument("-o", "--out-dir", type=str, default="exported",
                      help="output directory")
    args.add_argument("-w", "--widths", type=str, default="512,1024,1600",
                      help="comma-separated export width buckets")
    args.add_argument("-b", "--batch-sizes", type=str, default="1",
                      help="comma-separated export batch sizes")
    args.add_argument("-cl", "--chars-list", type=str, default=None,
                      help="chars_list.txt path")
    return parser


def main():
    args = build_argparser().parse_args()
    import jax.numpy as jnp
    from ..eval.driver import load_recognizer_variables
    from ..models.registry import get_model_info
    from ..serve.export import export_model

    model, characters = get_model_info(
        args.model_type, chars_list_file=args.chars_list, dtype=jnp.bfloat16)
    variables = load_recognizer_variables(args.model_file)
    meta = export_model(
        model, variables, args.out_dir, tag=args.model_type,
        widths=tuple(int(w) for w in args.widths.split(",")),
        batch_sizes=tuple(int(b) for b in args.batch_sizes.split(",")),
        unknown_id=len(characters) + 1)
    print(f"exported: {meta['artifacts']} -> {args.out_dir}")


if __name__ == "__main__":
    main()
