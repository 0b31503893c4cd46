"""Data-parallel LM-fused beam decode over the device mesh.

Lines are independent, so the decode batch shards over the mesh's ``data``
axis with zero collectives (``parallel.mesh.shard_batched_fn``): the
serving/eval scaling story for the reference's bottleneck path
(`ctc_codec.py:183-285` — its DDP covers training only; inference is
single-process). Runs on the 8-virtual-CPU-device mesh (conftest).
"""

import numpy as np
import pytest

from handwritten_chinese_ocr_samples_tpu.decode.adaptive import AdaptiveLMBeam
from handwritten_chinese_ocr_samples_tpu.decode.beam_lm_device import (
    make_lm_beam_search,
)
from handwritten_chinese_ocr_samples_tpu.parallel.mesh import (
    make_mesh, shard_batched_fn,
)

from tests.test_adaptive_lm import _prep
from tests.test_beam_skip_device import (  # noqa: F401
    CHARS, PRUNE, _peaky_preds, setup,
)


def test_sharded_decode_matches_single_device(setup):  # noqa: F811
    codec, clm, scorer, c2l, l2c = setup
    args = _prep(_peaky_preds(T=16, B=8, seed=11).astype(np.float32))
    fn = make_lm_beam_search(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, lm_ctx=64, use_lm_pred=True,
        skip_search=True, prune=PRUNE)
    want = codec.compact_to_texts(*fn(*args))

    mesh = make_mesh(data=8, model=1)
    got = codec.compact_to_texts(*shard_batched_fn(fn, mesh)(*args))
    assert got == want


def test_adaptive_with_mesh_matches_single_device(setup):  # noqa: F811
    codec, clm, scorer, c2l, l2c = setup
    args = _prep(_peaky_preds(T=16, B=8, seed=12).astype(np.float32))
    kw = dict(beam_size=4, depth=6, unknown_id=codec.unknown_id,
              lm_panelty=0.7, len_bonus=1.5, skip_search=True)
    want = AdaptiveLMBeam(clm, c2l, l2c, **kw).decode(*args)

    mesh = make_mesh(data=4, model=2)     # groups form per local shard
    beam = AdaptiveLMBeam(clm, c2l, l2c, mesh=mesh, **kw)
    got = beam.decode(*args)
    assert (codec.compact_to_texts(*got)
            == codec.compact_to_texts(*want))


def test_adaptive_mesh_indivisible_batch_raises(setup):  # noqa: F811
    codec, clm, scorer, c2l, l2c = setup
    args = _prep(_peaky_preds(T=16, B=6, seed=13).astype(np.float32))
    beam = AdaptiveLMBeam(
        clm, c2l, l2c, beam_size=4, depth=6, unknown_id=codec.unknown_id,
        lm_panelty=0.7, len_bonus=1.5, skip_search=True,
        mesh=make_mesh(data=4, model=2))
    with pytest.raises(ValueError, match="not divisible"):
        beam.decode(*args)
