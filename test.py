#!/usr/bin/env python
"""Eval/inference entry point (mirrors the reference repo's root ``test.py``)."""
from handwritten_chinese_ocr_samples_tpu.cli.test import main

if __name__ == "__main__":
    main()
