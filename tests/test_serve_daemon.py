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


def test_stdin_service_mode():
    """`deploy.py --daemon --stdin` is a continuous service: paths in,
    `path\\tprediction` out in resolution order, per-request errors
    reported inline, clean drain on EOF."""
    import os
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "demo", "hard")
    if not os.path.isdir(os.path.join(root, "checkpoint")):
        pytest.skip("hard demo artifact not present")
    test_dir = os.path.join(root, "data", "test")
    files = sorted(os.path.join(test_dir, f)
                   for f in os.listdir(test_dir))[:4]
    stdin_text = "\n".join(files + [os.path.join(test_dir, "missing.png")])

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, "deploy.py", "-lang", "hctr-tiny",
         "-m", os.path.join(root, "checkpoint"), "-i", test_dir,
         "-cl", os.path.join(root, "data", "chars_list.txt"),
         "-w", "320", "-b", "2", "--daemon", "--stdin",
         "--max-delay-ms", "20"],
        input=stdin_text, capture_output=True, text=True, timeout=540,
        cwd=os.path.dirname(os.path.dirname(root)), env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = dict(line.split("\t", 1) for line in proc.stdout.splitlines()
               if "\t" in line)
    for f in files:
        assert f in got and got[f] and not got[f].startswith("ERROR"), f
    missing = os.path.join(test_dir, "missing.png")
    assert got[missing].startswith("ERROR")
    assert "drained" in proc.stdout
