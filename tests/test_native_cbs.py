"""Native C++ CBS decoder + ARPA scorer vs the Python host oracle.

The C++ implementation (`native/cbs_decoder.cc`) must be transcription-
identical to `decode/beam_host.BeamSearchDecoder` (itself oracle-equal to
the reference `ctc_codec.py` decoder) across: no-LM full beam search,
no-LM skip search, and n-gram-scored full/skip search; and its ARPA
scorer must match `lm/arpa.ArpaLM` (kenlm ``score`` semantics) on
arbitrary sentences including OOV and backoff chains.
"""

import os
import subprocess

import numpy as np
import pytest
from scipy.special import log_softmax

from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
from handwritten_chinese_ocr_samples_tpu.decode.beam_host import (
    BeamSearchConfig, BeamSearchDecoder,
)
from handwritten_chinese_ocr_samples_tpu.decode.lm_interface import (
    KenLMBackend, NullLM,
)
from handwritten_chinese_ocr_samples_tpu.lm.arpa import ArpaLM

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "handwritten_chinese_ocr_samples_tpu", "native")

CHARS = "abcdef"


@pytest.fixture(scope="module", autouse=True)
def build_lib():
    so = os.path.join(NATIVE_DIR, "libcbsdecoder.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", NATIVE_DIR, "libcbsdecoder.so"],
                       check=True)
    yield


@pytest.fixture(scope="module")
def arpa_path(tmp_path_factory):
    """A 3-gram model over the test alphabet, with gaps that force real
    backoff chains (some bigrams/trigrams deliberately missing)."""
    rng = np.random.default_rng(3)
    lines = ["\\data\\"]
    uni, bi, tri = [], [], []
    vocab = ["<unk>", "<s>", "</s>"] + list(CHARS)
    for w in vocab:
        uni.append((w, -round(rng.uniform(0.4, 2.0), 4),
                    -round(rng.uniform(0.05, 0.6), 4)))
    for a in vocab[1:2] + list(CHARS):
        for b in list(CHARS) + ["</s>"]:
            if rng.random() < 0.5:
                bi.append((f"{a} {b}", -round(rng.uniform(0.2, 1.6), 4),
                           -round(rng.uniform(0.05, 0.5), 4)))
    for a in list(CHARS):
        for b in list(CHARS):
            for c in list(CHARS):
                if rng.random() < 0.12:
                    tri.append((f"{a} {b} {c}",
                                -round(rng.uniform(0.1, 1.2), 4)))
    lines.append(f"ngram 1={len(uni)}")
    lines.append(f"ngram 2={len(bi)}")
    lines.append(f"ngram 3={len(tri)}")
    lines.append("")
    lines.append("\\1-grams:")
    for w, p, b in uni:
        lines.append(f"{p}\t{w}\t{b}")
    lines.append("")
    lines.append("\\2-grams:")
    for w, p, b in bi:
        lines.append(f"{p}\t{w}\t{b}")
    lines.append("")
    lines.append("\\3-grams:")
    for w, p in tri:
        lines.append(f"{p}\t{w}")
    lines.append("")
    lines.append("\\end\\")
    p = tmp_path_factory.mktemp("arpa") / "gap.arpa"
    p.write_text("\n".join(lines), encoding="utf-8")
    return str(p)


def _peaky(T, B, D, seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(T, B, D)).astype(np.float32) * 0.3
    for b in range(B):
        for t in range(T):
            r = rng.random()
            if r < 0.45:
                logits[t, b, 0] += 11.0
            elif r < 0.8:
                logits[t, b, rng.integers(1, D - 1)] += 11.0
            else:
                ids = rng.choice(np.arange(D - 1), 2, replace=False)
                logits[t, b, ids] += 11.0
    return logits


def test_arpa_scorer_matches_python(arpa_path):
    from handwritten_chinese_ocr_samples_tpu.decode.beam_host_native import (
        NativeArpaLM)
    py = ArpaLM(arpa_path)
    cc = NativeArpaLM(arpa_path)
    assert cc.order == py.order == 3
    rng = np.random.default_rng(0)
    sents = ["", "a", "a b c", "f f f f", "z q a",
             "".join(rng.choice(list(CHARS + "xy"), 12))]
    sents = [" ".join(s) if " " not in s else s for s in sents]
    for s in sents:
        for eos in (False, True):
            assert cc.score(s, eos=eos) == pytest.approx(
                py.score(s, eos=eos), abs=1e-9), (s, eos)


@pytest.mark.parametrize("skip", [False, True])
@pytest.mark.parametrize("use_lm", [False, True])
def test_native_cbs_matches_host_oracle(arpa_path, skip, use_lm):
    from handwritten_chinese_ocr_samples_tpu.decode.beam_host_native import (
        NativeBeamSearchDecoder)
    codec = CTCCodec(CHARS)
    cfg = BeamSearchConfig(
        beam_size=5, search_depth=4, lm_panelty=1.3, len_bonus=0.9,
        use_lm_pred=False, use_lm_score=use_lm, skip_search=skip)
    lm = KenLMBackend(arpa_path) if use_lm else NullLM()
    oracle = BeamSearchDecoder(codec, lm, cfg)
    native = NativeBeamSearchDecoder(
        codec, cfg, arpa_path=arpa_path if use_lm else None)

    for seed in range(4):
        logits = _peaky(T=20, B=3, D=len(CHARS) + 2, seed=seed)
        logp = log_softmax(logits, axis=2)
        want = oracle.decode(logp, already_log=True)
        got = native.decode(logp, already_log=True)
        assert got == want, (skip, use_lm, seed)
        # raw-logit entry point (log-softmax inside C++)
        got_raw = native.decode(logits, already_log=False)
        assert got_raw == want, (skip, use_lm, seed, "raw")


def test_native_cbs_rejects_lm_pred(arpa_path):
    from handwritten_chinese_ocr_samples_tpu.decode.beam_host_native import (
        NativeBeamSearchDecoder)
    codec = CTCCodec(CHARS)
    cfg = BeamSearchConfig(use_lm_pred=True)
    with pytest.raises(ValueError):
        NativeBeamSearchDecoder(codec, cfg, arpa_path=arpa_path)
