import numpy as np
import pytest

from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec


CHARS = "abcdef汉字测试"


def test_class_space():
    codec = CTCCodec(CHARS)
    assert codec.num_classes == len(CHARS) + 2
    assert codec.blank_id == 0
    assert codec.unknown_id == len(CHARS) + 1
    assert codec.characters[0] == "<blank>"
    assert codec.characters[-1] == "<unknown>"
    assert codec.dict["a"] == 1


def test_encode_flat_and_unknown():
    codec = CTCCodec(CHARS)
    flat, lengths = codec.encode(["ab", "汉Z"])
    assert lengths.tolist() == [2, 2]
    assert flat.tolist() == [1, 2, codec.dict["汉"], codec.unknown_id]
    assert flat.dtype == np.int32


def test_encode_padded():
    codec = CTCCodec(CHARS)
    labels, paddings = codec.encode_padded(["abc", "d"], max_len=5)
    assert labels.shape == (2, 5)
    assert labels[0, :3].tolist() == [1, 2, 3]
    assert paddings[0].tolist() == [0, 0, 0, 1, 1]
    assert paddings[1].tolist() == [0, 1, 1, 1, 1]


def test_greedy_collapse_rules():
    codec = CTCCodec(CHARS)
    unk = codec.unknown_id
    # blank(0) drops, repeats collapse, blank splits repeats, unknown drops
    row = np.array([0, 1, 1, 0, 1, 2, 2, unk, 3])
    # blank | a, repeat-skip | blank | a again | b, repeat-skip | unk | c
    assert codec.indices_to_text(row) == "aabc"


def test_greedy_matches_reference_semantics():
    codec = CTCCodec("ab")
    unk = codec.unknown_id
    cases = [
        (np.array([1, 1, 1]), "a"),
        (np.array([1, 0, 1]), "aa"),
        (np.array([0, 0, 0]), ""),
        (np.array([1, 2, 1]), "aba"),
        (np.array([unk, 1, unk, 1]), "aa"),
        # unknown between repeats does NOT split them (reference keeps
        # comparing against the previous frame, ctc_codec.py:91-92)
        (np.array([1, unk, 1]), "aa"),
        (np.array([], dtype=np.int64), ""),
    ]
    for row, want in cases:
        assert codec.indices_to_text(row) == want, row


def test_decode_greedy_from_logits_matches_host():
    rng = np.random.default_rng(0)
    codec = CTCCodec(CHARS)
    T, B, D = 37, 4, codec.num_classes
    preds = rng.normal(size=(T, B, D)).astype(np.float32)
    texts = codec.decode_greedy(preds)
    assert len(texts) == B

    from handwritten_chinese_ocr_samples_tpu.ops.decode import greedy_texts
    import jax.numpy as jnp
    texts_dev = greedy_texts(codec, jnp.array(preds.transpose(1, 0, 2)))
    assert texts_dev == texts


@pytest.mark.skipif(
    not __import__("tests.conftest", fromlist=["reference_available"]
                   ).reference_available(),
    reason="reference checkout not present")
def test_greedy_parity_vs_reference_codec():
    """Oracle check: our greedy decode == the reference ctc_codec on the
    same random logits (reference imported at runtime, never copied)."""
    import sys
    from tests.conftest import REFERENCE_PATH
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from utils.ctc_codec import ctc_codec as RefCodec
    finally:
        sys.path.remove(REFERENCE_PATH)

    rng = np.random.default_rng(42)
    chars = "abc def 汉字测试甲乙丙丁".replace(" ", "")
    ref = RefCodec(chars)
    ours = CTCCodec(chars)
    preds = rng.normal(size=(61, 5, len(chars) + 2)).astype(np.float32)
    assert ours.decode_greedy(preds) == ref.decode(preds)

    flat_r, len_r = ref.encode(["ab汉", "Z测"])
    flat_o, len_o = ours.encode(["ab汉", "Z测"])
    assert flat_r.tolist() == flat_o.tolist()
    assert len_r.tolist() == len_o.tolist()
