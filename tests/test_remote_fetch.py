"""Cross-machine fetch tier: real worker PROCESSES over localhost TCP.

The reference's equivalent (Ray actors + rpyc queues,
core/data/dataloader.py:269-784) never runs in its repo's tests; here the
full protocol — index queue, result queue, exception shipping, multi-epoch
reuse — is exercised with separate OS processes talking to the trainer-side
service over a socket, which is exactly the deployment shape (CPU fleet ->
TPU host).
"""

import multiprocessing as mp
import time

import numpy as np
import pytest

from x2i_tpu.data.remote import (FetchError, FetchService, FetchWorker,
                                 RemoteFetchLoader, run_worker)


def _fetch_square(index):
    return {"i": index, "x": np.full((4,), index * index, np.int32)}


def _fetch_flaky(index):
    if index == 3:
        raise ValueError(f"cannot decode sample {index}")
    return {"i": index}


def _worker_main(port, fetch_name, num_threads):
    fetch = {"square": _fetch_square, "flaky": _fetch_flaky}[fetch_name]
    run_worker("127.0.0.1", port, fetch, num_threads)


def _spawn_workers(port, fetch_name, n=2, num_threads=2):
    ctx = mp.get_context("fork")
    procs = [ctx.Process(target=_worker_main,
                         args=(port, fetch_name, num_threads), daemon=True)
             for _ in range(n)]
    for p in procs:
        p.start()
    return procs


def test_remote_fetch_two_processes():
    with FetchService() as svc:
        procs = _spawn_workers(svc.address[1], "square", n=2)
        loader = RemoteFetchLoader(range(20), svc)
        out = sorted((s["i"] for s in loader))
        assert out == list(range(20))
        # payloads computed in the worker processes, not locally
        svc.stop()
        for p in procs:
            p.join(timeout=10)
            assert p.exitcode == 0


def test_remote_fetch_second_epoch_reuses_service():
    with FetchService() as svc:
        procs = _spawn_workers(svc.address[1], "square", n=1)
        for _ in range(2):      # two finite epochs over one worker fleet
            got = sorted(s["i"] for s in RemoteFetchLoader(range(7), svc))
            assert got == list(range(7))
        svc.stop()
        for p in procs:
            p.join(timeout=10)


def test_remote_fetch_error_raises():
    with FetchService() as svc:
        _spawn_workers(svc.address[1], "flaky", n=1)
        with pytest.raises(FetchError, match="cannot decode sample 3"):
            list(RemoteFetchLoader(range(6), svc))


def test_remote_fetch_error_warn_skips():
    with FetchService() as svc:
        _spawn_workers(svc.address[1], "flaky", n=1)
        with pytest.warns(UserWarning, match="cannot decode sample 3"):
            got = sorted(s["i"] for s in
                         RemoteFetchLoader(range(6), svc, on_error="warn"))
        assert got == [0, 1, 2, 4, 5]


def test_remote_fetch_in_process_worker_thread():
    """FetchWorker can also run as a thread on the trainer host (the
    reference's colocated-actor mode, NodeAffinity :455-458)."""
    import threading

    with FetchService() as svc:
        t = threading.Thread(
            target=FetchWorker("127.0.0.1", svc.address[1],
                               _fetch_square, num_threads=2).run,
            daemon=True)
        t.start()
        got = sorted(s["i"] for s in RemoteFetchLoader(range(10), svc))
        assert got == list(range(10))
        svc.stop()
        t.join(timeout=10)
        assert not t.is_alive()
