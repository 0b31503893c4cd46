"""Numerical parity of the JAX models vs the torch reference (oracle).

Random-init torch reference model -> state_dict -> ``compat`` converter ->
flax apply; outputs must agree to float tolerance in eval mode. This validates
the architecture (layer topology, pooling, SE, BN, head flatten order) and the
checkpoint converter in one shot.
"""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_PATH, reference_available

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from handwritten_chinese_ocr_samples_tpu.compat.torch_convert import (  # noqa: E402
    convert_state_dict,
)
from handwritten_chinese_ocr_samples_tpu.models.hctr import hctr_model  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

NUM_CLASSES = 32  # small head keeps the test fast; trunk is full size


def _torch_reference_model():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from models.handwritten_ctr_model import hctr_model as ref_model
    finally:
        sys.path.remove(REFERENCE_PATH)
    torch.manual_seed(0)
    m = ref_model(num_classes=NUM_CLASSES)
    m.eval()
    return torch, m


@pytest.fixture(scope="module")
def parity_pair():
    torch, tmodel = _torch_reference_model()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_state_dict(sd)
    jmodel = hctr_model(num_classes=NUM_CLASSES)
    apply = jax.jit(lambda v, x: jmodel.apply(v, x, train=False))
    return torch, tmodel, apply, variables


def test_param_count_38m(parity_pair):
    """~38M params at the full 7375-class head (`Debug_Notebook.ipynb`)."""
    _, tmodel, _, variables = parity_pair
    t_count = sum(p.numel() for p in tmodel.parameters())
    j_count = sum(np.asarray(p).size
                  for p in jax.tree.leaves(variables["params"]))
    assert j_count == t_count


@pytest.mark.parametrize("width", [64])
def test_forward_parity_eval(parity_pair, width):
    torch, tmodel, apply, variables = parity_pair
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(2, 1, 128, width)).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()  # (W, B, D)

    x_nhwc = x.transpose(0, 2, 3, 1)  # NCHW -> NHWC
    out = apply(variables, jnp.asarray(x_nhwc))
    out = np.asarray(out).transpose(1, 0, 2)  # (B, W, D) -> (W, B, D)

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def test_transcription_parity(parity_pair):
    """Greedy transcriptions are identical even where float noise differs."""
    torch, tmodel, apply, variables = parity_pair
    from handwritten_chinese_ocr_samples_tpu.core.codec import CTCCodec
    from handwritten_chinese_ocr_samples_tpu.ops.decode import greedy_texts

    codec = CTCCodec("".join(chr(ord("a") + i) for i in range(NUM_CLASSES - 2)))
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, size=(3, 1, 128, 80)).astype(np.float32)
    with torch.no_grad():
        ref_logits = tmodel(torch.from_numpy(x)).numpy()
    ref_texts = codec.decode_greedy(ref_logits)

    out = apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    texts = greedy_texts(codec, out)
    assert texts == ref_texts
