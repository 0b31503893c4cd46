"""Innovation (isolated-character classifier) parity vs the reference."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_PATH, reference_available

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from handwritten_chinese_ocr_samples_tpu.compat.torch_convert import (  # noqa: E402
    convert_state_dict,
)
from handwritten_chinese_ocr_samples_tpu.models.innovation import (  # noqa: E402
    innovation_model,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")

NUM_CLASSES = 20


@pytest.fixture(scope="module")
def pair():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import innovation as ref_mod
    finally:
        sys.path.remove(REFERENCE_PATH)
    torch.manual_seed(0)
    tmodel = ref_mod.hctr_model(use_multiscale=False, use_spatial_attn=False)
    tmodel.set_num_classes(NUM_CLASSES)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_state_dict(sd)
    jmodel = innovation_model(NUM_CLASSES)
    apply = jax.jit(lambda v, x: jmodel.apply(v, x, train=False))
    return torch, tmodel, apply, variables


def test_param_count(pair):
    _, tmodel, _, variables = pair
    t = sum(p.numel() for p in tmodel.parameters())
    j = sum(np.asarray(p).size for p in jax.tree.leaves(variables["params"]))
    assert j == t


def test_classification_forward_parity(pair):
    torch, tmodel, apply, variables = pair
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(2, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()     # (B, C)
    got = np.asarray(apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    # same predicted classes
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))


def test_full_variant_parity():
    """use_multiscale + use_spatial_attn: fusion/attention weights convert
    and the forward matches."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_PATH)
    try:
        import innovation as ref_mod
    finally:
        sys.path.remove(REFERENCE_PATH)
    torch.manual_seed(1)
    tmodel = ref_mod.hctr_model(use_multiscale=True, use_spatial_attn=True)
    tmodel.set_num_classes(NUM_CLASSES)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_state_dict(sd)
    jmodel = innovation_model(NUM_CLASSES, use_multiscale=True,
                              use_spatial_attn=True)
    apply = jax.jit(lambda v, x: jmodel.apply(v, x, train=False))

    t_count = sum(p.numel() for p in tmodel.parameters())
    j_count = sum(np.asarray(p).size
                  for p in jax.tree.leaves(variables["params"]))
    assert j_count == t_count

    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, size=(2, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=3e-3, rtol=1e-3)
