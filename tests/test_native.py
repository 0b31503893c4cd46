"""Native components: editdistance parity, dgr2png round trip."""

import os
import struct
import subprocess

import numpy as np
import pytest
from PIL import Image

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "handwritten_chinese_ocr_samples_tpu", "native")


def brute_levenshtein(a, b):
    m, n = len(a), len(b)
    D = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        D[i][0] = i
    for j in range(n + 1):
        D[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            D[i][j] = min(D[i - 1][j] + 1, D[i][j - 1] + 1,
                          D[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return D[m][n]


def test_levenshtein_matches_bruteforce():
    from handwritten_chinese_ocr_samples_tpu.eval.metrics import levenshtein
    rng = np.random.default_rng(0)
    alphabet = "ab汉字"
    for _ in range(30):
        a = "".join(rng.choice(list(alphabet), rng.integers(0, 12)))
        b = "".join(rng.choice(list(alphabet), rng.integers(0, 12)))
        assert levenshtein(a, b) == brute_levenshtein(a, b), (a, b)


def test_native_lib_agrees_with_numpy():
    from handwritten_chinese_ocr_samples_tpu.eval import metrics
    if metrics._load_native() is None:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(1)
    for _ in range(20):
        a = "".join(chr(0x4E00 + int(x)) for x in rng.integers(0, 50, 15))
        b = "".join(chr(0x4E00 + int(x)) for x in rng.integers(0, 50, 15))
        aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
        bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
        assert metrics._levenshtein_np(aa, bb) == metrics.levenshtein(a, b)


def _write_dgr(path, lines, code_len=2, doc_h=400, doc_w=800):
    """Synthesize a DGR file: lines = [[(hex_label, top, left, bitmap)]]."""
    illustr = b"#test\x00"
    header_size = 36 + len(illustr)
    with open(path, "wb") as f:
        f.write(struct.pack("<i", header_size))
        f.write(b"DGR\x00\x00\x00\x00\x00")
        f.write(illustr)
        f.write(b"GB".ljust(20, b"\x00"))
        f.write(struct.pack("<hh", code_len, 8))
        f.write(struct.pack("<iii", doc_h, doc_w, len(lines)))
        for words in lines:
            f.write(struct.pack("<i", len(words)))
            for hex_label, top, left, bitmap in words:
                f.write(bytes.fromhex(hex_label))
                h, w = bitmap.shape
                f.write(struct.pack("<hhhh", top, left, h, w))
                f.write(bitmap.tobytes())


@pytest.mark.skipif(
    not os.path.exists(os.path.join(NATIVE_DIR, "dgr2png")),
    reason="dgr2png not built")
def test_dgr2png_extraction(tmp_path):
    rng = np.random.default_rng(0)
    glyph1 = np.full((40, 40), 255, np.uint8)
    glyph1[5:35, 5:35] = 10
    glyph2 = np.full((60, 50), 255, np.uint8)
    glyph2[10:50, 10:40] = 80
    dgr = tmp_path / "page1.dgr"
    _write_dgr(str(dgr), [
        [("B0A1", 100, 50, glyph1), ("B0A2", 95, 100, glyph2)],
        [("C5F7", 200, 60, glyph1)],
    ])
    lst = tmp_path / "list.txt"
    lst.write_text(str(dgr) + "\n")
    out = tmp_path / "out"
    out.mkdir()
    r = subprocess.run([os.path.join(NATIVE_DIR, "dgr2png"),
                        str(lst), str(out)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr

    png1 = out / "page1-L1.png"
    txt1 = out / "page1-L1.txt"
    assert png1.exists() and txt1.exists()
    assert txt1.read_text().split() == ["B0A1", "B0A2"]
    img = np.array(Image.open(png1))
    assert img.shape[0] == 128  # height normalized
    # line 1 spans x 50..150 -> width 100; height 65 < 128 -> centered
    assert img.shape[1] == 100
    assert (img < 128).any()  # ink present

    txt2 = out / "page1-L2.txt"
    assert txt2.read_text().split() == ["C5F7"]


@pytest.mark.skipif(
    not os.path.exists(os.path.join(NATIVE_DIR, "dgr2png")),
    reason="dgr2png not built")
def test_dgr2png_synthesis(tmp_path):
    rng = np.random.default_rng(1)
    glyph = np.full((48, 48), 255, np.uint8)
    glyph[8:40, 8:40] = 20
    dgr = tmp_path / "page.dgr"
    _write_dgr(str(dgr), [
        [("A3A1", 50, 10, glyph), ("B0A1", 50, 70, glyph)],
    ])
    lst = tmp_path / "list.txt"
    lst.write_text(str(dgr) + "\n")

    # replacement glyph images (HWDB1.x-style isolated chars)
    repl_img = tmp_path / "repl.png"
    arr = np.full((30, 30), 255, np.uint8)
    arr[5:25, 5:25] = 99
    Image.fromarray(arr).save(repl_img)
    gt = tmp_path / "img_gt.txt"
    gt.write_text(f"{repl_img},D2BB\n{repl_img},D2BC\n")
    alpha = tmp_path / "alpha.txt"
    alpha.write_text("A3A1\n")  # keep the first word

    out = tmp_path / "out"
    out.mkdir()
    r = subprocess.run([os.path.join(NATIVE_DIR, "dgr2png"), str(lst),
                        str(out), str(gt), str(alpha)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # first pass: A3A1 kept, B0A1 replaced by D2BB
    txt = (out / "page-L1-S1.txt").read_text().split()
    assert txt == ["A3A1", "D2BB"]
    # second pass consumed D2BC, then source ran dry
    assert (out / "page-L1-S2.txt").exists()
