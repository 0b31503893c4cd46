#!/usr/bin/env python
"""Serving entry point (mirrors the reference repo's root ``deploy.py``)."""
from handwritten_chinese_ocr_samples_tpu.cli.deploy import main

if __name__ == "__main__":
    main()
