"""End-to-end training driver (the reference's `main.py:180-537` equivalent).

Flow per epoch: step-decay LR -> hot loop (host collate -> device put ->
fused jit train step) -> periodic validation with best-checkpoint tracking ->
per-epoch test + checkpoint. Differences from the reference are TPU-idiomatic:

  * one process drives all local chips through a ``data``-sharded mesh — no
    ``mp.spawn``/DDP/NCCL (`main.py:157-237`);
  * batches are width-bucketed so XLA compiles a bounded executable set;
  * decode-for-display runs on device (compact indices only cross to host);
  * bf16 activations replace AMP/GradScaler (`main.py:246,382-438`) — bf16
    needs no loss scaling; CTC stays f32.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.codec import CTCCodec
from ..data.bucketing import AlignCollate, BucketSpec
from ..data.dataset import ImageDataset
from ..data.loader import DataLoader
from ..eval.metrics import AverageMeter, cer_counts
from ..parallel.mesh import batch_sharding, make_mesh
from .checkpoint import load_checkpoint, save_checkpoint, wait_for_checkpoint
from .step import (adjust_learning_rate, create_train_state,
                   make_classify_eval_step, make_classify_train_step,
                   make_eval_step, make_train_step, shard_train_state)


@dataclass
class TrainerConfig:
    data: str
    model_type: str = "hctr"
    batch_size: int = 8
    lr: float = 0.001
    momentum: float = 0.9
    weight_decay: float = 1e-4
    epochs: int = 90
    lr_decay_epochs: int = 30   # reference: x0.1 every 30 (`main.py:579`)
    start_epoch: int = 0
    print_freq: int = 1000
    val_freq: int = 50000
    workers: int = 4
    seed: Optional[int] = None
    resume: str = ""
    test_only: bool = False
    test_verbose: bool = False
    max_width: int = 1600
    bucket_step: int = 128
    use_width_mask: bool = False
    out_dir: str = "."
    max_label_len: int = 160
    dtype: str = "bfloat16"
    # Optimizer override. Empty = the model attribute decides (reference
    # pattern: `handwritten_ctr_model.py:161` optimizer='SGD',
    # `innovation.py:235` optimizer='Adam', dispatched at `main.py:209-218`).
    optimizer: str = ""
    # jax.profiler trace capture (utils.profiling.profile_trace): steps
    # [10, 30) of the first trained epoch — past compile/warmup, bounded
    # so the trace stays viewable. Empty = off.
    profile_dir: str = ""


class Trainer:
    def __init__(self, cfg: TrainerConfig, model, characters: str):
        self.cfg = cfg
        self.model = model
        self.codec = CTCCodec(characters)
        self.best_acc = 0.0

        # Data axis = largest device count the global batch divides over
        # (the reference divides batch by ngpus, `main.py:235`).
        import math
        n_dev = math.gcd(jax.device_count(), cfg.batch_size)
        self.mesh = make_mesh(data=n_dev, model=1,
                              devices=jax.devices()[:n_dev])
        self.batch_sharding = batch_sharding(self.mesh)

        # Prediction mode travels as a model attribute (reference pattern:
        # `handwritten_ctr_model.py:162` pred='CTC',
        # `innovation.py:236` pred='Classification').
        self.pred_mode = getattr(model, "pred", "CTC")
        if self.pred_mode not in ("CTC", "Classification"):
            raise ValueError(f"not expected pred mode: {self.pred_mode}")
        is_classify = self.pred_mode == "Classification"

        seed = cfg.seed if cfg.seed is not None else 0
        self.rng = jax.random.key(seed)
        # Dropout draws ~10^8 bits/step across the trunk's dropout stack;
        # the rbg PRNG generates them ~16% faster per train step than
        # threefry on TPU (init keys stay threefry for reproducibility).
        self.dropout_rng = jax.random.key(seed + 1, impl="rbg")
        init_w = model.img_height if is_classify else 256
        from .step import make_optimizer
        tx_kind = {"sgd": "SGD", "adam": "Adam"}.get(
            cfg.optimizer.lower(), cfg.optimizer) or getattr(
            model, "optimizer", "SGD")
        self.state = create_train_state(
            model, self.rng,
            input_shape=(cfg.batch_size, model.img_height, init_w, 1),
            tx=make_optimizer(tx_kind, lr=cfg.lr, momentum=cfg.momentum,
                              weight_decay=cfg.weight_decay))
        if n_dev > 1:
            self.state = shard_train_state(self.state, self.mesh)

        if is_classify:
            self.train_step = make_classify_train_step(donate=True)
            self.eval_step = make_classify_eval_step(model)
        else:
            self.train_step = make_train_step(
                use_width_mask=cfg.use_width_mask, donate=True)
            self.eval_step = make_eval_step(model, self.codec.unknown_id,
                                            use_width_mask=cfg.use_width_mask)

        self.start_epoch = cfg.start_epoch
        if cfg.resume:
            self.state, epoch, self.best_acc = load_checkpoint(
                cfg.resume, self.state)
            self.start_epoch = epoch
            print(f"=> loaded checkpoint: {cfg.resume} (epoch {epoch})")

    # ------------------------------------------------------------- loaders
    def _loader(self, phase: str, shuffle: bool) -> DataLoader:
        cfg = self.cfg
        dataset = ImageDataset(cfg.data, (1, self.model.img_height), phase,
                               batch_size=cfg.batch_size)
        if self.pred_mode == "Classification":
            # Isolated-character squares (GNT layout, `gnt2png.py:46-60`):
            # one fixed (H, H) shape, so a single executable serves every
            # batch.
            h = self.model.img_height
            collate = AlignCollate(imgH=h, PAD=self.model.pad_mode,
                                   max_width=h, bucket_spec=BucketSpec((h,)))
        else:
            collate = AlignCollate(
                imgH=self.model.img_height, PAD=self.model.pad_mode,
                max_width=cfg.max_width,
                bucket_spec=BucketSpec(tuple(range(
                    cfg.bucket_step, cfg.max_width + 1, cfg.bucket_step))))
        return DataLoader(
            dataset, cfg.batch_size, collate, shuffle=shuffle,
            seed=cfg.seed or 0, group_by_width=shuffle,
            num_workers=cfg.workers,
            shard_id=jax.process_index(), num_shards=jax.process_count())

    def _device_batch(self, batch: dict) -> dict:
        if self.pred_mode == "Classification":
            out = {
                "images": batch["images"],
                "labels": self._class_ids(batch["labels"]),
            }
        else:
            labels, label_paddings = self.codec.encode_padded(
                batch["labels"], max_len=self.cfg.max_label_len)
            out = {
                "images": batch["images"],
                "labels": labels,
                "label_paddings": label_paddings,
                "widths": batch["widths"],
            }
        return {k: jax.device_put(jnp.asarray(v), self.batch_sharding)
                for k, v in out.items()}

    def _class_ids(self, labels) -> "jnp.ndarray":
        """Single-character ground truth -> class ids (same class space as
        the codec: chars at 1..N, unknown last)."""
        import numpy as np
        return np.array(
            [self.codec.dict.get(s[:1], self.codec.unknown_id)
             for s in labels], dtype=np.int32)

    def _device_iter(self, loader: DataLoader):
        """Iterate device-resident batches with the next batch's label
        encode + H2D overlapped with the current train step (the loader
        itself already prefetches host batches in a background thread)."""
        from concurrent.futures import ThreadPoolExecutor
        it = iter(loader)

        def fetch():
            batch = next(it, None)
            return None if batch is None else self._device_batch(batch)

        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(fetch)
            while True:
                cur = fut.result()
                if cur is None:
                    return
                fut = ex.submit(fetch)
                yield cur

    # --------------------------------------------------------------- train
    def fit(self):
        cfg = self.cfg
        if cfg.test_only:
            acc = self.evaluate("test")
            print(f"Test acc: {acc:.4f}")
            return

        train_loader = self._loader("train", shuffle=True)
        step_in_epoch = 0
        for epoch in range(self.start_epoch, cfg.epochs):
            self.state = adjust_learning_rate(self.state, cfg.lr, epoch,
                                              cfg.lr_decay_epochs)
            train_loader.set_epoch(epoch)
            self._train_epoch(train_loader, epoch)
            acc = self.evaluate("test")
            is_best = acc > self.best_acc
            self.best_acc = max(acc, self.best_acc)
            save_checkpoint(self.state, epoch + 1, self.best_acc,
                            out_dir=cfg.out_dir, model_type=cfg.model_type,
                            is_best=is_best, acc=acc)
            print(f"epoch {epoch}: test acc {acc:.4f} "
                  f"(best {self.best_acc:.4f})")
        wait_for_checkpoint()

    def _train_epoch(self, loader: DataLoader, epoch: int):
        cfg = self.cfg
        batch_time = AverageMeter("time", ":.3f")
        data_time = AverageMeter("data", ":.3f")
        losses = AverageMeter("loss", ":.4f")
        dropout_rng = jax.random.fold_in(self.dropout_rng, epoch)

        import contextlib
        trace = contextlib.ExitStack()
        do_profile = bool(cfg.profile_dir) and epoch == self.start_epoch
        tracing = False

        end = time.time()
        for i, dev_batch in enumerate(self._device_iter(loader)):
            if do_profile:
                if i == 10:          # past compile + pipeline warmup
                    from ..utils.profiling import profile_trace
                    trace.enter_context(profile_trace(cfg.profile_dir))
                    tracing = True
                elif i == 30 and tracing:
                    jax.block_until_ready(self.state.params)
                    trace.close()
                    tracing = False
                    print(f"profiler trace (steps 10-30) -> "
                          f"{cfg.profile_dir}")
            data_time.update(time.time() - end)
            n_items = int(dev_batch["images"].shape[0])
            self.state, metrics = self.train_step(
                self.state, dev_batch, dropout_rng)
            if (i + 1) % cfg.print_freq == 0:
                loss = float(metrics["loss"])  # sync point
                losses.update(loss, n_items)
                print(f"Epoch [{epoch}][{i + 1}/{len(loader)}] "
                      f"{batch_time} {data_time} {losses} "
                      f"grad_norm {float(metrics['grad_norm']):.2f} "
                      f"skipped {float(metrics['skipped']):.0f}")
            if cfg.val_freq and (i + 1) % cfg.val_freq == 0:
                acc = self.evaluate("val")
                is_best = acc > self.best_acc
                self.best_acc = max(acc, self.best_acc)
                save_checkpoint(self.state, epoch, self.best_acc,
                                out_dir=cfg.out_dir,
                                model_type=cfg.model_type,
                                is_best=is_best, acc=acc, is_val=True)
            batch_time.update(time.time() - end)
            end = time.time()
        if tracing:                            # epoch shorter than 30 steps
            jax.block_until_ready(self.state.params)
            trace.close()
            print(f"profiler trace -> {cfg.profile_dir}")

    # ---------------------------------------------------------------- eval
    def evaluate(self, phase: str = "test") -> float:
        """CTC: CER-based accuracy = 1 - CER (`main.py:516-537`).
        Classification: top-1 accuracy over single-character labels."""
        loader = self._loader(phase, shuffle=False)
        if self.pred_mode == "Classification":
            correct, total = 0, 0
            for batch in loader:
                images = jax.device_put(jnp.asarray(batch["images"]),
                                        self.batch_sharding)
                pred = self.eval_step(self.state.params,
                                      self.state.batch_stats, images)
                truth = self._class_ids(batch["labels"])
                pred = jnp.asarray(pred)
                correct += int((jnp.asarray(truth) == pred).sum())
                total += len(truth)
                if self.cfg.test_verbose:
                    for p, g in zip(pred, batch["labels"]):
                        c = self.codec.characters[int(p)]
                        print(f"PRE: {c}\nTRU: {g}")
            return correct / max(total, 1)
        dist_sum, len_sum = 0, 0
        for batch in loader:
            images = jax.device_put(jnp.asarray(batch["images"]),
                                    self.batch_sharding)
            widths = jax.device_put(jnp.asarray(batch["widths"]),
                                    self.batch_sharding)
            chars, lengths = self.eval_step(
                self.state.params, self.state.batch_stats, images, widths)
            preds = self.codec.compact_to_texts(chars, lengths)
            d, t = cer_counts(preds, list(batch["labels"]))
            dist_sum += d
            len_sum += t
            if self.cfg.test_verbose:
                for p, g in zip(preds, batch["labels"]):
                    print(f"PRE: {p}\nTRU: {g}")
        cer = dist_sum / max(len_sum, 1)
        return 1.0 - cer
