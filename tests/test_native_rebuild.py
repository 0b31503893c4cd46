"""Pin the committed native binaries to their committed sources.

The prebuilt artifacts (`native/libcbsdecoder.so`, `native/libeditdistance.so`,
`native/dgr2png`) are checked in because the target environment may lack a
toolchain. When a compiler IS present, these tests recompile every native
source into a scratch directory and verify the fresh builds behave
identically to the committed binaries — so silent source/binary drift fails
CI instead of shipping.
"""

import ctypes
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest
from scipy.special import log_softmax

from tests.test_native import NATIVE_DIR, _write_dgr
from tests.test_native_cbs import CHARS, _peaky, arpa_path  # noqa: F401

HAVE_GXX = shutil.which("g++") is not None
HAVE_OPENCV = (
    HAVE_GXX
    and subprocess.run(["pkg-config", "--exists", "opencv4"],
                       capture_output=True).returncode == 0
    if shutil.which("pkg-config") else False)

pytestmark = pytest.mark.skipif(not HAVE_GXX, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def fresh_build(tmp_path_factory):
    """Compile all native sources from scratch in a temp dir."""
    build = tmp_path_factory.mktemp("native_rebuild")
    for name in ("Makefile", "editdistance.cc", "cbs_decoder.cc",
                 "dgr2png.cc"):
        shutil.copy(Path(NATIVE_DIR) / name, build / name)
    targets = ["libeditdistance.so", "libcbsdecoder.so"]
    if HAVE_OPENCV:
        targets.append("dgr2png")
    subprocess.run(["make", "-C", str(build)] + targets, check=True,
                   capture_output=True)
    return build


def test_editdistance_rebuild_matches_committed(fresh_build):
    lib = ctypes.CDLL(str(fresh_build / "libeditdistance.so"))
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.edit_distance_u32.argtypes = [u32p, ctypes.c_int, u32p, ctypes.c_int]
    lib.edit_distance_u32.restype = ctypes.c_int

    from handwritten_chinese_ocr_samples_tpu.eval.metrics import levenshtein
    rng = np.random.default_rng(7)
    for _ in range(25):
        a = "".join(chr(0x4E00 + int(x)) for x in rng.integers(0, 60, 20))
        b = "".join(chr(0x4E00 + int(x)) for x in rng.integers(0, 60, 20))
        aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
        bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
        got = lib.edit_distance_u32(aa.ctypes.data_as(u32p), aa.size,
                                    bb.ctypes.data_as(u32p), bb.size)
        assert got == levenshtein(a, b), (a, b)


def test_cbs_rebuild_matches_committed(fresh_build, arpa_path,  # noqa: F811
                                       monkeypatch):
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.decode import beam_host_native
    from handwritten_chinese_ocr_samples_tpu.decode.beam_host import (
        BeamSearchConfig)
    from handwritten_chinese_ocr_samples_tpu.decode.beam_host_native import (
        NativeBeamSearchDecoder)

    codec = CTCCodec(CHARS)
    cfg = BeamSearchConfig(
        beam_size=5, search_depth=4, lm_panelty=1.3, len_bonus=0.9,
        use_lm_pred=False, use_lm_score=True, skip_search=True)
    logp = log_softmax(_peaky(T=24, B=3, D=len(CHARS) + 2, seed=11), axis=2)

    committed = NativeBeamSearchDecoder(codec, cfg, arpa_path=arpa_path)
    want = committed.decode(logp, already_log=True)

    fresh_lib = beam_host_native._bind(
        ctypes.CDLL(str(fresh_build / "libcbsdecoder.so")))
    monkeypatch.setattr(beam_host_native, "_LIB", fresh_lib)
    monkeypatch.setattr(beam_host_native, "_LIB_TRIED", True)
    fresh = NativeBeamSearchDecoder(codec, cfg, arpa_path=arpa_path)
    assert fresh.decode(logp, already_log=True) == want


@pytest.mark.skipif(not HAVE_OPENCV, reason="no OpenCV dev package")
def test_dgr2png_rebuild_matches_committed(fresh_build, tmp_path):
    committed_bin = Path(NATIVE_DIR) / "dgr2png"
    if not committed_bin.exists():
        pytest.skip("committed dgr2png not present")
    glyph = np.full((40, 40), 255, np.uint8)
    glyph[5:35, 5:35] = 10
    dgr = tmp_path / "page.dgr"
    _write_dgr(str(dgr), [
        [("B0A1", 100, 50, glyph), ("B0A2", 95, 110, glyph)],
        [("C5F7", 200, 60, glyph)],
    ])
    lst = tmp_path / "list.txt"
    lst.write_text(str(dgr) + "\n")

    outs = {}
    for tag, binary in (("committed", committed_bin),
                        ("fresh", fresh_build / "dgr2png")):
        out = tmp_path / tag
        out.mkdir()
        r = subprocess.run([str(binary), str(lst), str(out)],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        outs[tag] = {p.name: p.read_bytes() for p in sorted(out.iterdir())}
    assert outs["committed"].keys() == outs["fresh"].keys()
    for name in outs["committed"]:
        assert outs["committed"][name] == outs["fresh"][name], name
