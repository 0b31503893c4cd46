"""Offline CASIA-HWDB dataset preparation tools.

  * ``dgrl``  — HWDB2.x DGRL page extractor (text lines + labels)
  * ``gnt``   — HWDB1.x GNT isolated-character extractor
  * ``flow``  — code<->char mapping, manifest + vocabulary builders
  * native ``dgr2png`` (C++) — legacy DGR extractor + line synthesizer,
    see ``handwritten_chinese_ocr_samples_tpu/native/``
"""

from .dgrl import dgrl2png, iter_dgrl_lines  # noqa: F401
from .gnt import gnt2png, iter_gnt_samples  # noqa: F401
from .flow import (  # noqa: F401
    map_code_to_char, generate_char_img_gt, generate_text_img_gt,
    generate_codes_list, select_alpha_symbol_codes,
)
