"""Post-training int8 quantization (`serve/quant.py`, QuantizableConv).

Locks: the float path of ``QuantizableConv`` IS ``nn.Conv`` (identical
params and outputs, so existing checkpoints/parity are untouched), the
int8 path matches a numpy reference of the documented scheme, the
calibration tree covers every conv site, and on the committed hard-demo
checkpoint int8 greedy decoding matches float CER (line-level identity
up to the demo's engineered Bayes-boundary ties) through both the raw
model and the serving engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from handwritten_chinese_ocr_samples_tpu.models.hctr import (
    HCTRModel, QuantizableConv,
)
from handwritten_chinese_ocr_samples_tpu.serve.quant import (
    calibrate_conv_amax, conv_site_count,
)


def test_float_path_is_nn_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 9, 3)).astype(np.float32))
    q = QuantizableConv(8, (3, 3), padding=1, dtype=jnp.bfloat16)
    r = nn.Conv(8, (3, 3), padding=1, dtype=jnp.bfloat16)
    vq = q.init({"params": jax.random.key(7)}, x)
    vr = r.init({"params": jax.random.key(7)}, x)
    assert jax.tree.structure(vq["params"]) == jax.tree.structure(
        vr["params"])
    chex_equal = jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)), vq["params"], vr["params"])
    assert all(jax.tree.leaves(chex_equal))
    assert bool(jnp.all(q.apply(vq, x) == r.apply(vr, x)))


def test_int8_path_matches_numpy_reference():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 5, 7, 4)).astype(np.float32) * 3.0
    conv = QuantizableConv(6, (3, 3), padding=1, dtype=jnp.float32)
    v = conv.init({"params": jax.random.key(1)}, jnp.asarray(x))
    amax = jnp.asarray(float(np.max(np.abs(x))))
    got = np.asarray(conv.apply(v, jnp.asarray(x), amax))

    w = np.asarray(v["params"]["kernel"], np.float32)
    b = np.asarray(v["params"]["bias"], np.float32)
    s_x = max(float(amax), 1e-8) / 127.0
    s_w = np.maximum(np.max(np.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    xq = np.clip(np.round(x / s_x), -127, 127).astype(np.int32)
    wq = np.clip(np.round(w / s_w), -127, 127).astype(np.int32)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros_like(got)
    for i in range(5):
        for j in range(7):
            patch = xp[0, i:i + 3, j:j + 3, :]           # (3,3,4)
            acc = np.einsum("hwc,hwco->o", patch, wq)    # int32 accum
            ref[0, i, j] = acc * (s_x * s_w) + b
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_model():
    model = HCTRModel(num_classes=24, backbone_channels=64,
                      num_blocks=(1, 1, 1, 1), dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 128, 64, 1)).astype(np.float32))
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": jax.random.key(0)}, x, train=False)
    return model, variables, x


def test_calibration_covers_every_conv_site(tiny_model):
    model, variables, x = tiny_model
    q = calibrate_conv_amax(model, variables, [x])
    # stem 2 + 4 stages x (blocks x {conv1, conv2} + stage conv)
    # + downsample convs where channels change (stages 1-4 here: 8->16,
    # 16->32, 32->64, 64==64 -> 3 downsamples)
    assert conv_site_count(q) == 2 + 4 * (1 * 2 + 1) + 3
    assert all(float(v) > 0 for v in jax.tree.leaves(q))


def test_quant_forward_close_to_float(tiny_model):
    model, variables, x = tiny_model
    q = calibrate_conv_amax(model, variables, [x])
    yf = np.asarray(model.apply(variables, x, train=False))
    yq = np.asarray(model.apply(variables, x, train=False, quant=q))
    assert yq.shape == yf.shape
    # int8 noise must be small relative to the logit scale
    scale = float(np.max(np.abs(yf))) or 1.0
    assert float(np.max(np.abs(yq - yf))) / scale < 0.15


def test_hard_demo_int8_accuracy_parity():
    """On the committed trained checkpoint, int8 greedy CER matches float
    within noise. Exact transcription identity is NOT the contract: the
    hard demo's member marks sit AT the visual Bayes boundary by design,
    so its near-tie logits flip under ~2% quant noise — measured, those
    flips land on characters float already gets wrong half the time
    (frame-argmax agreement 99.97%)."""
    import os
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.data.bucketing import (
        AlignCollate, BucketSpec)
    from handwritten_chinese_ocr_samples_tpu.data.dataset import ImageDataset
    from handwritten_chinese_ocr_samples_tpu.eval.driver import (
        load_recognizer_variables)
    from handwritten_chinese_ocr_samples_tpu.models.registry import (
        get_model_info)
    from handwritten_chinese_ocr_samples_tpu.ops.decode import (
        greedy_decode_device)

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "demo", "hard")
    if not os.path.isdir(os.path.join(root, "checkpoint")):
        pytest.skip("hard demo artifact not present")
    model, characters = get_model_info(
        "hctr-tiny", data_dir=os.path.join(root, "data"),
        dtype=jnp.bfloat16)
    codec = CTCCodec(characters)
    variables = load_recognizer_variables(os.path.join(root, "checkpoint"))

    dataset = ImageDataset(os.path.join(root, "data"),
                           (1, model.img_height), "test", batch_size=16)
    collate = AlignCollate(imgH=model.img_height, PAD=model.pad_mode,
                           bucket_spec=BucketSpec())
    batch = collate([dataset[i] for i in range(16)])
    x = jnp.asarray(batch["images"])

    q = calibrate_conv_amax(model, variables, [x])

    @jax.jit
    def decode(variables, x, quant=None):
        logits = model.apply(variables, x, train=False, quant=quant)
        return greedy_decode_device(logits, None,
                                    unknown_id=codec.unknown_id)

    from handwritten_chinese_ocr_samples_tpu.eval.metrics import cer_counts
    tf = codec.compact_to_texts(*decode(variables, x))
    tq = codec.compact_to_texts(*decode(variables, x, q))
    labels = list(batch["labels"])
    df, nf = cer_counts(tf, labels)
    dq, nq = cer_counts(tq, labels)
    cer_f, cer_q = df / nf, dq / nq
    assert any(t for t in tf)  # real transcriptions, not empties
    # most lines identical; the rest differ only at Bayes-boundary marks
    assert sum(a == b for a, b in zip(tf, tq)) >= len(tf) - 3
    assert cer_q <= cer_f + 0.02, (cer_f, cer_q)


def test_engine_int8_batched_serving():
    """ServingEngine(int8=True) calibrates on the first batch and serves
    transcriptions matching the float engine (up to Bayes-boundary tie
    flips on this dataset)."""
    import os
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.eval.driver import (
        load_recognizer_variables)
    from handwritten_chinese_ocr_samples_tpu.models.registry import (
        get_model_info)
    from handwritten_chinese_ocr_samples_tpu.serve.engine import ServingEngine

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "demo", "hard")
    if not os.path.isdir(os.path.join(root, "checkpoint")):
        pytest.skip("hard demo artifact not present")
    model, characters = get_model_info(
        "hctr-tiny", data_dir=os.path.join(root, "data"),
        dtype=jnp.bfloat16)
    codec = CTCCodec(characters)
    variables = load_recognizer_variables(os.path.join(root, "checkpoint"))
    test_dir = os.path.join(root, "data", "test")
    files = sorted(os.path.join(test_dir, f)
                   for f in os.listdir(test_dir))[:8]

    kw = dict(widths=(512,), batch_sizes=(4,))
    t_f, _ = ServingEngine(model, variables, codec,
                           **kw).infer_files_batched(files, batch_size=4)
    eng_q = ServingEngine(model, variables, codec, int8=True, **kw)
    assert eng_q._quant is None           # lazy: no data yet
    t_q, _ = eng_q.infer_files_batched(files, batch_size=4)
    assert eng_q._quant is not None       # calibrated on first batch
    assert all(t for t in t_f)
    assert sum(a == b for a, b in zip(t_f, t_q)) >= len(t_f) - 2
