"""Checkpoint save/load with the reference's naming + resume semantics.

Reference behavior (`main.py:349-356,540-558`):
  * every checkpoint carries ``{epoch, state_dict, best_acc, optimizer}``;
  * latest is always ``<model>_checkpoint.pth.tar``; when it is the best so
    far it is additionally copied to
    ``<model>_{epoch}ep_{acc:.4f}acc_checkpoint.pth.tar`` (``val_`` prefix for
    validation-time checkpoints);
  * only rank 0 writes (`main.py:542-543`) — here ``jax.process_index()==0``;
  * resume restores epoch, best_acc and optimizer state (`main.py:251-269`).

Implementation: orbax ``PyTreeCheckpointer`` into a directory per checkpoint
(the TPU-world ``torch.save``), with scalar metadata stored alongside.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from .step import TrainState


def _ckpt_dir(out_dir: str, model_type: str) -> str:
    return os.path.join(out_dir, f"{model_type}_checkpoint")


_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None
_PENDING_BEST: Optional[Tuple[str, str]] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoint() -> None:
    """Block until the in-flight async save (if any) is durable, then
    perform the deferred best-copy."""
    global _PENDING_BEST
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    if _PENDING_BEST is not None:
        src, dst = _PENDING_BEST
        _PENDING_BEST = None
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)


def save_checkpoint(
    state: TrainState,
    epoch: int,
    best_acc: float,
    out_dir: str = ".",
    model_type: str = "hctr",
    is_best: bool = False,
    acc: float = 0.0,
    is_val: bool = False,
    use_async: bool = True,
) -> str:
    """Write latest checkpoint; copy to a best-tagged name when ``is_best``.

    With ``use_async`` the device->host transfer and disk write run in the
    background (orbax AsyncCheckpointer) so the train loop keeps stepping;
    the previous save is awaited first, and the best-copy of an async save
    is deferred until it is durable. ``HCTR_SYNC_CKPT=1`` forces synchronous
    saves: on the tunneled single-chip platform a background D2H of the full
    train state can wedge against concurrent train-step dispatch (observed
    as an axon-conn stall right after an epoch save), and a synchronous
    save serializes the two at ~15-30 s/epoch cost.
    """
    if jax.process_index() != 0:
        return ""
    if os.environ.get("HCTR_SYNC_CKPT") == "1":
        use_async = False
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "best_acc": float(best_acc),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    path = os.path.abspath(_ckpt_dir(out_dir, model_type))
    wait_for_checkpoint()  # previous save must be durable before overwrite
    if os.path.exists(path):
        shutil.rmtree(path)

    best_path = ""
    if is_best:
        prefix = "val_" if is_val else ""
        best_path = os.path.abspath(os.path.join(
            out_dir,
            f"{prefix}{model_type}_{epoch}ep_{acc:.4f}acc_checkpoint"))

    if use_async:
        global _PENDING_BEST
        _async_checkpointer().save(path, payload)
        if is_best:
            _PENDING_BEST = (path, best_path)
    else:
        ocp.PyTreeCheckpointer().save(path, payload)
        if is_best:
            if os.path.exists(best_path):
                shutil.rmtree(best_path)
            shutil.copytree(path, best_path)
    return path


def load_checkpoint(
    path: str,
    state: Optional[TrainState] = None,
) -> Tuple[Any, int, float]:
    """Load a checkpoint; returns ``(state_or_payload, epoch, best_acc)``.

    With a template ``state``, params/batch_stats/opt_state/step are restored
    into it (full resume, `main.py:257-263`); without one the raw payload tree
    is returned (eval path, `test.py:151-153`).
    """
    wait_for_checkpoint()  # make any in-flight save visible first
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    if state is not None:
        template = {
            "epoch": 0,
            "best_acc": 0.0,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        try:
            payload = ckptr.restore(path, item=template)
        except Exception:
            return _warm_start(ckptr, path, state)
        new_state = state.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=payload["step"],
        )
        return new_state, int(payload["epoch"]), float(payload["best_acc"])
    payload = ckptr.restore(path)
    return payload, int(payload.get("epoch", 0)), float(
        payload.get("best_acc", 0.0))


def _warm_start(
    ckptr: ocp.PyTreeCheckpointer,
    path: str,
    state: TrainState,
) -> Tuple[TrainState, int, float]:
    """Warm-start resume from a *stripped* serving artifact.

    Serving checkpoints (e.g. ``tools/make_fullsize_demo.py --step strip``)
    carry only ``{params, batch_stats}`` — no optimizer moments, no step.
    The reference's resume (`main.py:257-263`) assumes a full training
    checkpoint; fine-tuning from a deployed artifact is the TPU-framework
    extra. Params/batch_stats are cast to the train state's dtypes (stripped
    artifacts store bf16 transport; training runs f32 master weights), the
    optimizer starts fresh, and the epoch counter restarts at 0 so the LR
    schedule applies from the configured base LR.
    """
    import numpy as np

    raw = ckptr.restore(path)
    if not isinstance(raw, dict) or "params" not in raw:
        raise ValueError(
            f"checkpoint at {path} is neither a full training checkpoint "
            "nor a stripped params+batch_stats artifact")

    def _cast_like(t, a):
        return np.asarray(a, dtype=np.asarray(t).dtype)

    new_state = state.replace(
        params=jax.tree.map(_cast_like, state.params, raw["params"]),
        batch_stats=jax.tree.map(_cast_like, state.batch_stats,
                                 raw["batch_stats"]),
    )
    best_acc = float(raw.get("best_acc", 0.0))
    print(f"=> warm start from stripped artifact {path} "
          f"(fresh optimizer, epoch 0, best_acc {best_acc:.4f})")
    return new_state, 0, best_acc
