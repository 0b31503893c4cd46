"""Continuous serving daemon: a deadline-batched request queue per bucket.

The reference serves one image per synchronous inference call
(`deploy.py:109-125`). The TPU-native upgrade batches: fixed-shape
executables want full batches, but interactive requests arrive one at a
time — so the daemon accumulates requests per width bucket and flushes a
bucket when either a full batch has formed or the oldest request has
waited ``max_delay_ms`` (classic deadline batching). Results are delivered
through per-request futures and are identical to what
``ServingEngine.infer_files`` returns for the same file (the executable,
preprocessing, and decode routing are shared with the engine).

Threading model: callers preprocess on their own thread (``submit``), a
single dispatcher thread owns the device. This matches the platform —
XLA dispatch is not thread-safe per device stream, and one dispatcher
keeps executables hot without contention.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Deque, Dict, List, Tuple

import numpy as np

from .engine import ServingEngine


class ServingDaemon:
    """Deadline-batched continuous serving over a ``ServingEngine``.

    ``batch_size`` is the flush size per width bucket (partial flushes are
    padded by repetition, like ``infer_files_batched``); ``max_delay_ms``
    bounds per-request queueing latency.
    """

    def __init__(self, engine: ServingEngine, batch_size: int = 8,
                 max_delay_ms: float = 50.0):
        self.engine = engine
        self.batch_size = int(batch_size)
        self.max_delay = max_delay_ms / 1000.0
        self._lock = threading.Condition()
        # bucket width -> FIFO of (enqueue time, input array, future)
        self._queues: Dict[int, Deque[Tuple[float, np.ndarray, Future]]] = {}
        self._closing = False
        self._thread = threading.Thread(target=self._serve_loop,
                                        name="hctr-serving", daemon=True)
        self._thread.start()

    # ---------------------------------------------------------------- API
    def submit(self, image_file: str) -> "Future[str]":
        """Enqueue one image; resolves to its transcription."""
        w, x = self.engine.preprocess_bucketed(image_file)
        fut: Future = Future()
        with self._lock:
            if self._closing:
                raise RuntimeError("daemon is shut down")
            self._queues.setdefault(w, deque()).append(
                (time.monotonic(), x, fut))
            self._lock.notify()
        return fut

    def close(self, drain: bool = True) -> None:
        """Stop the dispatcher; ``drain=True`` serves queued requests
        first, else they fail with CancelledError."""
        with self._lock:
            self._closing = True
            self._drain = drain
            self._lock.notify()
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ----------------------------------------------------------- internals
    def _pick_flush(self, now: float):
        """Choose a bucket to flush. Deadline-expired heads win, oldest
        first — a sustained stream of full batches in one bucket must not
        starve a lone request in another past its latency bound. With no
        expiry due, any full batch flushes."""
        full, expired = None, None
        oldest = None
        for w, q in self._queues.items():
            if not q:
                continue
            head_t = q[0][0]
            if oldest is None or head_t < oldest:
                oldest = head_t
                if now - head_t >= self.max_delay:
                    expired = w
            if full is None and len(q) >= self.batch_size:
                full = w
        return (expired if expired is not None else full), oldest

    def _serve_loop(self) -> None:
        while True:
            with self._lock:
                while True:
                    now = time.monotonic()
                    w, oldest = self._pick_flush(now)
                    if w is not None:
                        q = self._queues[w]
                        n = min(len(q), self.batch_size)
                        items = [q.popleft() for _ in range(n)]
                        break
                    if self._closing:
                        pending = [it for q in self._queues.values()
                                   for it in q]
                        for q in self._queues.values():
                            q.clear()
                        if not getattr(self, "_drain", True):
                            for _, _, fut in pending:
                                fut.cancel()
                            return
                        if not pending:
                            return
                        # drain mode: serve everything left, bucket by
                        # bucket; -inf timestamps mark every head expired
                        for _, x, fut in pending:
                            self._queues.setdefault(
                                x.shape[2], deque()).append(
                                    (float("-inf"), x, fut))
                        continue
                    timeout = (None if oldest is None
                               else max(0.0, self.max_delay - (now - oldest)))
                    self._lock.wait(timeout=timeout)
            self._dispatch(w, items)

    def _dispatch(self, w: int,
                  items: List[Tuple[float, np.ndarray, Future]]) -> None:
        import jax.numpy as jnp
        engine = self.engine
        pad = self.batch_size - len(items)
        batch = np.concatenate([x for _, x, _ in items]
                               + [items[-1][1]] * pad, axis=0)
        try:
            engine._maybe_calibrate(batch)
            exe = engine._exe(self.batch_size, w)
            outputs = exe(engine.variables, jnp.asarray(batch))
            texts = engine._decode_outputs(outputs)
        except Exception as e:  # propagate to every waiter
            for _, _, fut in items:
                if not fut.done():
                    fut.set_exception(e)
            return
        for (_, _, fut), text in zip(items, texts):
            if not fut.done():
                fut.set_result(text)
