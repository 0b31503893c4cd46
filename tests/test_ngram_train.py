"""First-party n-gram estimator (`lm/ngram_train.py`) — the lmplz role.

Properties locked: every conditional distribution of the written ARPA
sums to one (the estimate is a valid probability model, so downstream
beam fusion compares apples to apples), higher order never hurts
training-set likelihood, the model prefers corpus-like text over
shuffled text, vocab restriction maps to <unk>, the HBLM round trip
scores identically, and real kenlm accepts/matches the file when the
package is installed.
"""

import math
import os

import numpy as np
import pytest

from handwritten_chinese_ocr_samples_tpu.lm.arpa import ArpaLM
from handwritten_chinese_ocr_samples_tpu.lm.ngram_train import (
    NgramCounts, estimate_witten_bell, train_ngram_arpa, write_arpa,
)

rng = np.random.default_rng(5)
ALPHABET = list("abcdefgh")


def _chain_sentences(n=400, lo=3, hi=12):
    """Deterministic-ish bigram chain: a->b->c ... with occasional jumps."""
    out = []
    for _ in range(n):
        k = int(rng.integers(lo, hi))
        w = ALPHABET[int(rng.integers(len(ALPHABET)))]
        s = [w]
        for _ in range(k - 1):
            if rng.random() < 0.85:
                w = ALPHABET[(ALPHABET.index(w) + 1) % len(ALPHABET)]
            else:
                w = ALPHABET[int(rng.integers(len(ALPHABET)))]
            s.append(w)
        out.append(s)
    return out


SENTS = _chain_sentences()


@pytest.fixture(scope="module", params=[1, 2, 3, 5])
def arpa_file(request, tmp_path_factory):
    order = request.param
    path = tmp_path_factory.mktemp("ng") / f"wb{order}.arpa"
    counts = NgramCounts(order).add_corpus(SENTS)
    probs, backoffs = estimate_witten_bell(counts)
    write_arpa(probs, backoffs, order, str(path))
    return order, str(path)


def _entropy(lm, sents):
    tot, n = 0.0, 0
    for s in sents:
        tot += lm.score(" ".join(s))
        n += len(s) + 1  # + </s>
    return -tot / n


def test_conditionals_sum_to_one(arpa_file):
    order, path = arpa_file
    lm = ArpaLM(path)
    words = [w for (w,) in (k for k in lm.probs if len(k) == 1)]
    predictable = [w for w in words if w != "<s>"]
    hists = [(), ("<s>",), ("a",), ("zz",), ("a", "b"),
             ("h", "zz", "a"), ("c", "d", "e", "f")]
    for h in hists:
        h = h[-(order - 1):] if order > 1 else ()
        total = sum(10.0 ** lm.logprob(h, w) for w in predictable)
        assert total == pytest.approx(1.0, abs=1e-6), (order, h)


def test_higher_order_fits_training_text_better(tmp_path):
    ents = []
    for order in (1, 2, 3):
        path = tmp_path / f"o{order}.arpa"
        counts = NgramCounts(order).add_corpus(SENTS)
        probs, backoffs = estimate_witten_bell(counts)
        write_arpa(probs, backoffs, order, str(path))
        ents.append(_entropy(ArpaLM(str(path)), SENTS))
    assert ents[1] < ents[0] and ents[2] <= ents[1] + 1e-9, ents


def test_prefers_chain_text_over_shuffled(arpa_file):
    order, path = arpa_file
    if order == 1:
        pytest.skip("unigram carries no order information")
    lm = ArpaLM(path)
    chain = _chain_sentences(n=40)
    local = np.random.default_rng(9)
    shuffled = [list(local.permutation(s)) for s in chain]
    e_chain = _entropy(lm, chain)
    e_shuf = _entropy(lm, shuffled)
    assert e_chain < e_shuf, (order, e_chain, e_shuf)


def test_bos_is_context_only(arpa_file):
    _, path = arpa_file
    lm = ArpaLM(path)
    assert lm.probs[("<s>",)] <= -90.0
    # but as context it conditions normally
    assert lm.logprob(("<s>",), "a") > -90.0


def test_vocab_restriction_maps_oov_to_unk(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text("a b Z\nZ a b\n", encoding="utf-8")
    out = tmp_path / "m.arpa"
    train_ngram_arpa(str(corpus), str(out), order=2, vocab=["a", "b"])
    lm = ArpaLM(str(out))
    assert ("Z",) not in lm.probs
    # Z occurred twice -> <unk> has real (not floor) mass
    assert 10.0 ** lm.probs[("<unk>",)] > 0.1


def test_hblm_roundtrip_scores_equal(arpa_file, tmp_path):
    from handwritten_chinese_ocr_samples_tpu.lm.hblm import (
        HblmLM, build_hblm)
    order, path = arpa_file
    out = tmp_path / "m.hblm"
    build_hblm(path, str(out))
    src, lm = ArpaLM(path), HblmLM(str(out))
    assert lm.order == order
    for s in SENTS[:20]:
        text = " ".join(s)
        assert lm.score(text) == pytest.approx(src.score(text), abs=1e-4)
    lm.close()


def test_real_kenlm_agrees(arpa_file):
    kenlm = pytest.importorskip("kenlm")
    order, path = arpa_file
    if order == 1:
        pytest.skip("kenlm requires order >= 2")
    ken = kenlm.Model(path)
    lm = ArpaLM(path)
    for s in SENTS[:20]:
        text = " ".join(s)
        assert ken.score(text) == pytest.approx(lm.score(text), abs=1e-3)


def test_cli(tmp_path):
    from handwritten_chinese_ocr_samples_tpu.cli.lm_train_ngram import main
    corpus = tmp_path / "c.txt"
    corpus.write_text(
        "\n".join(" ".join(s) for s in SENTS) + "\n", encoding="utf-8")
    chars = tmp_path / "chars_list.txt"
    chars.write_text("\n".join(ALPHABET) + "\n", encoding="utf-8")
    arpa, hblm = tmp_path / "m.arpa", tmp_path / "m.hblm"
    assert main([str(corpus), str(arpa), "-o", "3",
                 "--chars-list", str(chars), "--hblm", str(hblm)]) == 0
    assert os.path.exists(arpa) and os.path.exists(hblm)
    from handwritten_chinese_ocr_samples_tpu.lm.hblm import load_ngram_lm
    lm = load_ngram_lm(str(hblm))
    assert lm.order == 3
    assert math.isfinite(lm.score("a b c"))


def test_empty_corpus_raises():
    with pytest.raises(ValueError, match="empty corpus"):
        estimate_witten_bell(NgramCounts(2))
