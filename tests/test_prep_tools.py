"""Dataset preparation tools: DGRL/GNT parsing + flow parity vs reference."""

import importlib.util
import os
import struct
import zipfile

import numpy as np
import pytest
from PIL import Image

from tests.conftest import REFERENCE_PATH, reference_available

from handwritten_chinese_ocr_samples_tpu.data.prep import dgrl as our_dgrl
from handwritten_chinese_ocr_samples_tpu.data.prep import gnt as our_gnt
from handwritten_chinese_ocr_samples_tpu.data.prep import flow as our_flow

PREP_DIR = os.path.join(REFERENCE_PATH, "utils", "casia-hwdb-data-preparation")


def _load_ref_module(name):
    path = os.path.join(PREP_DIR, name + ".py")
    spec = importlib.util.spec_from_file_location("ref_" + name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------- DGRL
def _write_dgrl(path, lines, bits_per_pixel=8, code_type=b"GB"):
    """lines: list of (text:str, top, left, img (H,W) uint8)."""
    illustr = b"#synthetic\x00"
    header_size = 36 + len(illustr)
    page_h = max(l[1] + l[3].shape[0] for l in lines) + 10
    page_w = max(l[2] + l[3].shape[1] for l in lines) + 10
    with open(path, "wb") as f:
        f.write(struct.pack("<I", header_size))
        f.write(b"DGRL\x00\x00\x00\x00")
        f.write(illustr)
        f.write(code_type.ljust(20, b"\x00"))
        f.write(struct.pack("<HH", 2, bits_per_pixel))
        f.write(struct.pack("<III", page_h, page_w, len(lines)))
        for text, top, left, img in lines:
            label = text.encode("gb18030")
            assert len(label) == 2 * len(text)
            f.write(struct.pack("<I", len(text)))
            f.write(label)
            h, w = img.shape
            f.write(struct.pack("<IIII", top, left, h, w))
            if bits_per_pixel == 1:
                bits = (img < 128).astype(np.uint8)  # ink = 1
                packed = np.packbits(bits, axis=1)
                f.write(packed.tobytes())
            else:
                f.write(img.tobytes())


def _glyph(seed, h=60, w=200):
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 255, np.uint8)
    img[10:50, 10:190] = rng.integers(0, 100, (40, 180), dtype=np.uint8)
    return img


def test_dgrl_roundtrip_gray(tmp_path):
    lines = [("你好世界", 20, 15, _glyph(0)),
             ("测试", 100, 30, _glyph(1))]
    p = tmp_path / "page.dgrl"
    _write_dgrl(str(p), lines)
    with open(p, "rb") as fp:
        got = list(our_dgrl.iter_dgrl_lines(fp))
    assert [g.text for g in got] == ["你好世界", "测试"]
    np.testing.assert_array_equal(got[0].image, lines[0][3])


def test_dgrl_roundtrip_1bit(tmp_path):
    img = np.full((40, 100), 255, np.uint8)
    img[5:35, 5:95] = 0
    p = tmp_path / "bw.dgrl"
    _write_dgrl(str(p), [("黑白", 0, 0, img)], bits_per_pixel=1)
    with open(p, "rb") as fp:
        got = list(our_dgrl.iter_dgrl_lines(fp))
    assert got[0].text == "黑白"
    want = np.where(img < 128, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got[0].image, want)


@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
def test_dgrl_parity_vs_reference(tmp_path):
    ref = _load_ref_module("dgrl2png")
    lines = [("汉字识别测试", 20, 15, _glyph(2)),
             ("第二行文本", 120, 30, _glyph(3))]
    p = tmp_path / "page.dgrl"
    _write_dgrl(str(p), lines)

    with open(p, "rb") as fp:
        hs, fmt, ctype, clen, bpp = ref.read_dgrl_header(fp)
        ref_lines = ref.read_dgrl_page(fp, clen, ctype, bpp)
    with open(p, "rb") as fp:
        got = list(our_dgrl.iter_dgrl_lines(fp))
    assert [g.text for g in got] == [r["text"] for r in ref_lines]
    for g, r in zip(got, ref_lines):
        np.testing.assert_array_equal(g.image, r["image"])

    # full tool output parity: png + label + manifest
    out_ref = tmp_path / "out_ref"
    out_our = tmp_path / "out_our"
    out_our.mkdir()
    ref.dgrl2png(str(p), str(out_ref), 128)
    our_dgrl.dgrl2png(str(p), str(out_our), 128)
    ref_png = np.array(Image.open(out_ref / "page-L1.png"))
    our_png = np.array(Image.open(out_our / "page-L1.png"))
    np.testing.assert_array_equal(ref_png, our_png)
    assert ((out_ref / "page-L1.txt").read_text()
            == (out_our / "page-L1.txt").read_text())
    assert ((out_ref / "dgrl_img_gt.txt").read_text()
            == (out_our / "dgrl_img_gt.txt").read_text())


# ---------------------------------------------------------------------- GNT
def _write_gnt_zip(zip_path, samples):
    """samples: list of (tag:int, img (H,W) uint8)."""
    payload = b""
    for tag, img in samples:
        h, w = img.shape
        payload += struct.pack("<I", 10 + h * w)
        payload += struct.pack(">H", tag)
        payload += struct.pack("<HH", w, h)
        payload += img.tobytes()
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.writestr("001-f.gnt", payload)


def test_gnt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img1 = rng.integers(0, 255, (30, 20), dtype=np.uint8)
    img2 = rng.integers(0, 255, (25, 40), dtype=np.uint8)
    zp = tmp_path / "gnt.zip"
    _write_gnt_zip(str(zp), [(0xB0A1, img1), (0xB0A2, img2)])
    out = tmp_path / "out"
    out.mkdir()
    n = our_gnt.gnt2png(str(zp), 64, str(out))
    assert n == 2
    files = sorted(os.listdir(out))
    assert files == [f"001-f.gnt_{0xB0A1}.png", f"001-f.gnt_{0xB0A2}.png"]
    arr = np.array(Image.open(out / files[0]))
    assert arr.shape == (64, 64)


# --------------------------------------------------------------------- flow
@pytest.mark.skipif(not reference_available(),
                    reason="reference checkout not present")
def test_flow_parity_vs_reference(tmp_path):
    ref = _load_ref_module("preparation_flow")
    for code in ["B0A1", "D2BB", "A3FD", "4E00"]:
        assert our_flow.map_code_to_char(code) == ref.map_code_to_char(code)

    codes = ["B0A1", "A1A1", "A9F0", "4E00", "D2BB", "3000"]
    assert (our_flow.select_alpha_symbol_codes(codes)
            == ref.select_alpha_symbol_codes(codes))

    merged_ours = our_flow.generate_codes_list(
        ["B0A1", "A1A1"], ["A1A1", "D2BB"], ["D2BB", "4E00"])
    merged_ref = ref.generate_codes_list(
        ["B0A1", "A1A1"], ["A1A1", "D2BB"], ["D2BB", "4E00"])
    assert merged_ours == merged_ref


def test_generate_text_img_gt(tmp_path):
    d = tmp_path / "extracted"
    d.mkdir()
    Image.fromarray(np.zeros((10, 10), np.uint8)).save(d / "a-L1.png")
    (d / "a-L1.txt").write_text("B0A1\nFFFF\nFDA3\n")
    (d / "orphan.txt").write_text("B0A1\n")  # no matching png -> skipped
    out = tmp_path / "gt.txt"
    codes = our_flow.generate_text_img_gt(str(d), str(out))
    line = out.read_text().strip()
    name, chars = line.split(",", 1)
    assert name == "a-L1.png"
    assert chars == our_flow.map_code_to_char("B0A1") + \
        our_flow.map_code_to_char("A3FD")
    assert codes == ["B0A1", "A3FD"]


def test_build_split(tmp_path):
    m = tmp_path / "manifest.txt"
    rows = [f"img{i}.png,label{i}" for i in range(20)]
    m.write_text("\n".join(rows) + "\n")
    our_flow.build_split([str(m)], str(tmp_path), val_fraction=0.1, seed=42)
    train = (tmp_path / "train_img_id_gt.txt").read_text().strip().split("\n")
    val = (tmp_path / "val_img_id_gt.txt").read_text().strip().split("\n")
    assert len(train) == 18 and len(val) == 2
    assert set(train) | set(val) == set(rows)


def test_dgrl_zip_input(tmp_path):
    import zipfile as zf
    p1 = tmp_path / "a.dgrl"
    _write_dgrl(str(p1), [("你好", 5, 5, _glyph(7))])
    archive = tmp_path / "pages.zip"
    with zf.ZipFile(archive, "w") as z:
        z.write(p1, "a.dgrl")
    out = tmp_path / "out"
    n, manifest = our_dgrl.dgrl2png(str(archive), str(out), 128)
    assert n == 1
    assert (out / "a-L1.png").exists()
    assert "你好" in open(manifest, encoding="utf-8").read()
