"""bench.py full-size artifact mode (VERDICT r3 #1/#5).

When the committed full-size demo artifacts exist (``demo/full/{checkpoint,
lm,data}`` from ``tools/make_fullsize_demo.py``), bench.py's config-#5
metric must run on the trained checkpoint's REAL posteriors: these tests
pin the loader contract the benchmark depends on (without timing anything —
the bench itself runs on the TPU driver side).
"""

import os

import numpy as np
import pytest

import bench

_HAVE = all(
    os.path.isdir(os.path.join(bench.FULL, d))
    for d in ("checkpoint", "lm", "data"))

pytestmark = pytest.mark.skipif(
    not _HAVE, reason="demo/full artifacts not present")


def test_real_batches_shape_and_padding():
    batches = bench._load_real_batches(os.path.join(bench.FULL, "data"))
    assert len(batches) == 3
    for b in batches:
        assert b.shape == (bench.BATCH, bench.HEIGHT, bench.WIDTH, 1)
        assert b.dtype == np.uint8
    # Right-edge replication: the last padded column equals the last real
    # column (never all-zero), matching NormalizePAD (`dataset.py:89-92`).
    col = batches[0][0, :, -1, 0]
    assert col.max() > 0


def test_fullsize_loader_returns_trained_variables():
    out = bench._try_load_fullsize()
    assert out is not None
    variables, lm_dir, batches, chars = out
    assert set(variables) >= {"params", "batch_stats"}
    assert len(chars) + 2 == bench.NUM_CLASSES
    assert os.path.isfile(os.path.join(lm_dir, "dict.txt"))
    # The committed checkpoint is trained, not init: batch_stats must have
    # moved away from the init mean of zero.
    leaves = [np.asarray(x) for x in
              __import__("jax").tree.leaves(variables["batch_stats"])]
    assert any(np.abs(a).max() > 1e-3 for a in leaves)


def test_fullsize_loader_serves_f32():
    """The serving dtype contract (utils.ckpt_io.normalize_serving_dtype):
    whatever the artifact stores (bf16 transport), loaders hand f32 to the
    compiled program — bf16-stored leaves compile a ~7.7x slower forward."""
    out = bench._try_load_fullsize()
    assert out is not None
    variables = out[0]
    import jax
    dts = {np.asarray(a).dtype.name for a in jax.tree.leaves(variables)}
    assert "bfloat16" not in dts, dts
