"""Topology-free orbax restore.

A plain ``PyTreeCheckpointer().restore(path)`` re-creates arrays with the
sharding recorded at save time. That binds the checkpoint to the saving
topology: a checkpoint written on a CPU host fails to restore in a process
whose default backend is a TPU (and vice versa) with
``ValueError: sharding passed to deserialization should be specified ...``.
The reference's ``torch.load(map_location='cpu')`` (`test.py:152`) never had
this problem — checkpoints are plain host tensors.

``restore_pytree_host`` is the equivalent: every leaf is restored as a host
``np.ndarray`` regardless of the current jax backend or the topology the
checkpoint was saved under; callers ``device_put`` wherever they like.
"""

from __future__ import annotations

import numpy as np


def restore_pytree_host(path: str):
    """Restore an orbax PyTree checkpoint entirely as numpy host arrays."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, restore_args=restore_args)
