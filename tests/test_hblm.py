"""HBLM binary n-gram format: build/load round-trip + scorer equality.

The binary format plays the role of KenLM's ``.klm`` (`ctc_codec.py:
120-122` + the third-party ``build_binary`` recipe): instant mmap load
for host serving. Correctness contract: ``HblmLM`` scores exactly like
the text-ARPA reader ``ArpaLM`` (itself kenlm-verified), through every
consumer — the Python scorer, ``KenLMBackend`` dispatch, the native C++
loader (magic-sniffed by ``cbs_arpa_load``), and the native CBS beam
decode end-to-end.
"""

import numpy as np
import pytest
from scipy.special import log_softmax

from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
from handwritten_chinese_ocr_samples_tpu.decode.beam_host import (
    BeamSearchConfig, BeamSearchDecoder,
)
from handwritten_chinese_ocr_samples_tpu.decode.lm_interface import (
    KenLMBackend,
)
from handwritten_chinese_ocr_samples_tpu.lm.arpa import ArpaLM
from handwritten_chinese_ocr_samples_tpu.lm.hblm import (
    HblmLM, build_hblm, is_hblm, load_ngram_lm, ngram_hash,
)

from tests.test_native_cbs import (  # noqa: F401  (fixtures)
    CHARS, _peaky, arpa_path, build_lib,
)


@pytest.fixture(scope="module")
def hblm_path(arpa_path, tmp_path_factory):  # noqa: F811
    out = tmp_path_factory.mktemp("hblm") / "gap.hblm"
    build_hblm(arpa_path, str(out))
    return str(out)


def _sentences(rng, n=24, max_len=14):
    """Random char sentences incl. OOV symbols and empties."""
    alphabet = list(CHARS + "xyz")  # x/y/z are OOV -> <unk>
    out = ["", "a", "z"]
    for _ in range(n):
        k = int(rng.integers(1, max_len))
        out.append(" ".join(rng.choice(alphabet, k)))
    return out


def test_python_scorer_matches_arpa(arpa_path, hblm_path):  # noqa: F811
    src = ArpaLM(arpa_path)
    lm = HblmLM(hblm_path)
    assert lm.order == src.order == 3
    rng = np.random.default_rng(7)
    for s in _sentences(rng):
        for eos in (False, True):
            assert lm.score(s, eos=eos) == pytest.approx(
                src.score(s, eos=eos), abs=1e-4), (s, eos)
    lm.close()


def test_logprob_backoff_chain(arpa_path, hblm_path):  # noqa: F811
    src = ArpaLM(arpa_path)
    lm = HblmLM(hblm_path)
    rng = np.random.default_rng(11)
    vocab = ["<s>", "</s>", "<unk>"] + list(CHARS)
    for _ in range(200):
        n_ctx = int(rng.integers(0, 3))
        ctx = tuple(rng.choice(vocab, n_ctx))
        w = str(rng.choice(vocab))
        assert lm.logprob(ctx, w) == pytest.approx(
            src.logprob(ctx, w), abs=1e-5), (ctx, w)
    lm.close()


def test_native_loader_matches_python(hblm_path, arpa_path):  # noqa: F811
    from handwritten_chinese_ocr_samples_tpu.decode.beam_host_native import (
        NativeArpaLM, native_available)
    if not native_available():
        pytest.skip("libcbsdecoder.so not built")
    py = HblmLM(hblm_path)
    cc = NativeArpaLM(hblm_path)       # magic-sniffed binary load
    cc_text = NativeArpaLM(arpa_path)  # text path, same model
    assert cc.order == py.order
    rng = np.random.default_rng(3)
    for s in _sentences(rng):
        for eos in (False, True):
            want = py.score(s, eos=eos)
            assert cc.score(s, eos=eos) == pytest.approx(
                want, abs=1e-5), (s, eos)
            assert cc_text.score(s, eos=eos) == pytest.approx(
                want, abs=1e-4), (s, eos, "text-vs-binary")
    py.close()


def test_backend_dispatch_and_beam_parity(arpa_path, hblm_path):  # noqa: F811
    """KenLMBackend(.hblm) drives the host beam search identically to the
    text-ARPA backend (transcription equality on peaky posteriors)."""
    assert is_hblm(hblm_path) and not is_hblm(arpa_path)
    assert isinstance(load_ngram_lm(hblm_path), HblmLM)
    assert isinstance(load_ngram_lm(arpa_path), ArpaLM)

    codec = CTCCodec(CHARS)
    cfg = BeamSearchConfig(
        beam_size=5, search_depth=4, lm_panelty=1.3, len_bonus=0.9,
        use_lm_pred=False, use_lm_score=True, skip_search=True)
    dec_arpa = BeamSearchDecoder(codec, KenLMBackend(arpa_path), cfg)
    dec_hblm = BeamSearchDecoder(codec, KenLMBackend(hblm_path), cfg)
    for seed in range(3):
        logp = log_softmax(
            _peaky(T=18, B=2, D=len(CHARS) + 2, seed=seed), axis=2)
        assert dec_hblm.decode(logp, already_log=True) == \
            dec_arpa.decode(logp, already_log=True), seed


def test_native_cbs_decodes_from_hblm(arpa_path, hblm_path):  # noqa: F811
    """The native CBS decoder produces identical transcriptions whether its
    LM came from the ARPA text or the HBLM binary."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_host_native import (
        NativeBeamSearchDecoder, native_available)
    if not native_available():
        pytest.skip("libcbsdecoder.so not built")
    codec = CTCCodec(CHARS)
    cfg = BeamSearchConfig(
        beam_size=5, search_depth=4, lm_panelty=1.3, len_bonus=0.9,
        use_lm_pred=False, use_lm_score=True, skip_search=False)
    dec_text = NativeBeamSearchDecoder(codec, cfg, arpa_path=arpa_path)
    dec_bin = NativeBeamSearchDecoder(codec, cfg, arpa_path=hblm_path)
    for seed in range(3):
        logp = log_softmax(
            _peaky(T=20, B=3, D=len(CHARS) + 2, seed=seed), axis=2)
        assert dec_bin.decode(logp, already_log=True) == \
            dec_text.decode(logp, already_log=True), seed


def test_binarize_cli(arpa_path, tmp_path):  # noqa: F811
    from handwritten_chinese_ocr_samples_tpu.cli.lm_binarize import main
    out = tmp_path / "cli.hblm"
    assert main([arpa_path, str(out), "--check"]) == 0
    assert is_hblm(str(out))


def test_hash_twin_stability():
    """The id-sequence hash is part of the on-disk format: these pins must
    only ever change together with a format version bump (and the C++ twin
    in ``native/cbs_decoder.cc``)."""
    assert ngram_hash([0]) == ngram_hash((0,))
    assert ngram_hash([1, 2, 3]) != ngram_hash([3, 2, 1])
    assert ngram_hash([0]) == HASH_PIN_0
    assert ngram_hash([1, 2]) == HASH_PIN_1_2


# regression pins for test_hash_twin_stability (format v1)
HASH_PIN_0 = 0xFDED414231369A92
HASH_PIN_1_2 = 0x472AB3D0ED5C79C7


def test_rejects_truncated_file(hblm_path, tmp_path):
    import struct
    clipped = tmp_path / "clipped.hblm"
    data = open(hblm_path, "rb").read()
    clipped.write_bytes(data[: len(data) // 3])
    with pytest.raises((ValueError, struct.error)):
        HblmLM(str(clipped))


def test_fuzz_orders_estimator_hblm_native(tmp_path):
    """Random corpora -> Witten-Bell ARPA (orders 1..5) -> HBLM: the
    Python mmap loader and the native C++ loader must score exactly like
    the text-ARPA reader on random sentences (incl. OOV), across orders
    and vocabulary sizes."""
    from handwritten_chinese_ocr_samples_tpu.decode.beam_host_native import (
        NativeArpaLM, native_available)
    from handwritten_chinese_ocr_samples_tpu.lm.ngram_train import (
        train_ngram_arpa)

    rng = np.random.default_rng(21)
    for order in (1, 2, 3, 5):
        vocab = [chr(0x4E00 + i) for i in range(int(rng.integers(5, 40)))]
        corpus = tmp_path / f"c{order}.txt"
        with open(corpus, "w", encoding="utf-8") as f:
            for _ in range(120):
                k = int(rng.integers(1, 12))
                f.write(" ".join(rng.choice(vocab, k)) + "\n")
        arpa = str(tmp_path / f"m{order}.arpa")
        hblm = str(tmp_path / f"m{order}.hblm")
        train_ngram_arpa(str(corpus), arpa, order=order)
        build_hblm(arpa, hblm)

        src, lm = ArpaLM(arpa), HblmLM(hblm)
        cc = NativeArpaLM(hblm) if native_available() else None
        alphabet = vocab + ["䷿", "䷾"]        # OOV chars
        for _ in range(30):
            k = int(rng.integers(0, 14))
            s = " ".join(rng.choice(alphabet, k)) if k else ""
            for eos in (False, True):
                want = src.score(s, eos=eos)
                assert lm.score(s, eos=eos) == pytest.approx(
                    want, abs=1e-4), (order, s, eos)
                if cc is not None:
                    assert cc.score(s, eos=eos) == pytest.approx(
                        want, abs=1e-4), (order, s, eos, "native")
        lm.close()
