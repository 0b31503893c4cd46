#!/usr/bin/env python
"""Training entry point (mirrors the reference repo's root ``main.py``)."""
from handwritten_chinese_ocr_samples_tpu.cli.train import main

if __name__ == "__main__":
    main()
