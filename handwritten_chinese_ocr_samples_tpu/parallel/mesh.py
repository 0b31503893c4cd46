"""Device mesh and sharding utilities.

The reference's entire distributed runtime — ``mp.spawn`` one process per GPU,
``MASTER_ADDR``/``MASTER_PORT`` env bootstrap, NCCL process group,
``DistributedDataParallel`` wrapping, ``DistributedSampler``
(`main.py:157-237,280-282`) — collapses on TPU into sharding annotations on a
``jax.sharding.Mesh``: XLA emits the gradient all-reduce over ICI (and DCN for
multi-slice) automatically from a ``pjit``-partitioned train step.

Mesh axes:
  * ``data``  — batch (data parallel); the reference's only strategy (SURVEY
    §2.3).
  * ``model`` — reserved tensor-parallel axis: the 2048 x num_classes head and
    its 7375-way logits shard over it (demonstrated in ``train/step.py`` and
    exercised by ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Multi-host bootstrap; replaces `main.py:185-187,222-237`.

    On a single-process run this is a no-op; on a multi-host TPU slice it
    wires up the JAX distributed runtime (the `jax.process_index()==0` gate
    then replaces rank-0-only checkpointing, `main.py:542-543`).
    """
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-process / local run


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def width_sharding(mesh: Mesh) -> NamedSharding:
    """Shard NHWC images over batch (``data``) AND width (``model``).

    The sequence-parallel analogue for this workload (SURVEY.md §2.3): the
    CTC time axis is the pixel width, so very long text lines shard their
    width across chips. XLA GSPMD spatially partitions the convolutions and
    inserts the halo exchanges for the 3x3 kernels automatically — no manual
    collectives (the asymmetric (2,1) pooling never reduces width, so the
    layout is stable through the trunk).
    """
    return NamedSharding(mesh, P("data", None, "model", None))


def shard_batched_fn(fn, mesh: Mesh):
    """Data-parallel wrapper for an embarrassingly batch-parallel function:
    every argument and result is batch-leading and rows are independent, so
    each device runs the per-shard program on its local rows — zero
    collectives.

    Exists for the device beam searches: their sequential ``lax.scan`` /
    ``lax.map``-over-groups structure cannot be partitioned by GSPMD from
    sharding annotations alone (a scan axis never shards), but the batch
    axis can — ``shard_map`` over ``data`` turns one decode program into
    ``data``-many independent ones. This is the serving/eval scaling story
    for the reference's bottleneck path (`ctc_codec.py:183-285`): its DDP
    covers training only, inference is single-process.
    """
    try:
        from jax import shard_map as _shard_map  # jax >= 0.4.35 spelling

        def _smap(f):
            return _shard_map(f, mesh=mesh, in_specs=P("data"),
                              out_specs=P("data"), check_vma=False)
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _shard_map

        def _smap(f):
            return _shard_map(f, mesh=mesh, in_specs=P("data"),
                              out_specs=P("data"), check_rep=False)

    return jax.jit(_smap(lambda *args: fn(*args)))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "shape") and x.ndim >= 1 else x,
        batch,
        is_leaf=lambda x: hasattr(x, "shape"),
    )
