"""ServingDaemon: deadline-batched continuous serving over ServingEngine.

Per-request results must be identical to the engine's one-shot
``infer_files`` path; partial batches must flush by deadline; shutdown
drains the queue.
"""

import threading

import pytest

from handwritten_chinese_ocr_samples_tpu.serve.daemon import ServingDaemon
from handwritten_chinese_ocr_samples_tpu.serve.engine import ServingEngine

from tests.test_serve_beam import setup  # noqa: F401


@pytest.fixture(scope="module")
def engine(setup):  # noqa: F811
    codec, model, variables, files = setup
    return ServingEngine(model, variables, codec, widths=(128,),
                         batch_sizes=(4,), decode_method="greedy-search")


def test_concurrent_requests_match_infer_files(setup, engine):  # noqa: F811
    codec, model, variables, files = setup
    want = dict(zip(files, engine.infer_files(files)[0]))

    daemon = ServingDaemon(engine, batch_size=4, max_delay_ms=30)
    results = {}
    errors = []

    def client(i, f):
        try:
            results[i] = (f, daemon.submit(f).result(timeout=120))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i, files[i % len(files)]))
               for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    daemon.close()
    assert not errors
    assert len(results) == 10
    for i, (f, text) in results.items():
        assert text == want[f], (i, f)


def test_partial_batch_flushes_by_deadline(setup, engine):  # noqa: F811
    codec, model, variables, files = setup
    want = engine.infer_files(files[:1])[0][0]
    with ServingDaemon(engine, batch_size=4, max_delay_ms=20) as daemon:
        # a single request never fills the batch; the deadline must flush it
        assert daemon.submit(files[0]).result(timeout=120) == want


def test_close_drains_pending(setup, engine):  # noqa: F811
    codec, model, variables, files = setup
    want = dict(zip(files, engine.infer_files(files)[0]))
    daemon = ServingDaemon(engine, batch_size=4, max_delay_ms=10_000)
    futs = [daemon.submit(f) for f in files]
    daemon.close(drain=True)  # long deadline: only the drain can flush
    for f, fut in zip(files, futs):
        assert fut.result(timeout=0) == want[f]

    with pytest.raises(RuntimeError):
        daemon.submit(files[0])


def test_pick_flush_expired_beats_full():
    """A sustained stream of full batches in one bucket must not starve a
    deadline-expired request in another (max_delay_ms is a promise)."""
    from collections import deque

    d = ServingDaemon.__new__(ServingDaemon)
    d.batch_size = 4
    d.max_delay = 0.05
    now = 100.0
    full_q = deque((now, None, None) for _ in range(4))
    d._queues = {512: full_q, 1600: deque([(now - 1.0, None, None)])}
    w, oldest = d._pick_flush(now)
    assert w == 1600
    assert oldest == now - 1.0
    # with no expiry due, the full bucket flushes
    d._queues = {512: full_q, 1600: deque([(now, None, None)])}
    assert d._pick_flush(now)[0] == 512
