"""Cross-machine sample-fetch tier — the reference's Ray/rpyc layer, rebuilt.

The reference scales CPU-side decode/preprocess beyond the trainer machine
with a Ray actor pool: the trainer exposes an index queue and a result
queue through an rpyc service, and RayQueueWorker actors on remote CPU
nodes loop get_index -> dataset_fetcher.fetch(index) -> put_result
(/root/reference/core/data/dataloader.py:269-784, RpycActor:304-330,
RayQueueWorker:349-407).

TPU redesign: per-host input pipelines already cover the common SPMD case
(each jax process feeds its own chips — data/webdataset.py ShardSampler),
so this tier exists for the reference's *disaggregated* topology: a fleet
of CPU-only machines doing heavy decode for a small TPU host group. The
Ray/rpyc dependency stack is replaced by the same queue protocol over
plain TCP with length-prefixed pickle frames:

  * ``FetchService`` (trainer side) — a thread-per-connection server
    owning a bounded index queue and a bounded result queue; the exact
    role of RpycActor (exposed_get_index / exposed_put_result).
  * ``FetchWorker`` (remote CPU side) — connects, then loops
    get_index -> fetch_fn(index) -> put_result on a small thread pool;
    the role of RayQueueWorker.fetch (:360-398) including its
    exception-wrapping (errors travel to the trainer, :378-381).
  * ``RemoteFetchLoader`` — iterator gluing a sampler to the service:
    feeds indices, yields fetched samples, terminates finite epochs
    cleanly (every sent index is accounted for before StopIteration).

Payloads are pickled — identical trust model to the reference's
rpyc/SyncManager queues (authkey patched out, :279-288): run this on a
private cluster network only.
"""

from __future__ import annotations

import pickle
import queue
import socket
import socketserver
import struct
import threading
import traceback
from typing import Any, Callable, Iterable, Iterator, Optional

_HDR = struct.Struct("!I")

# wire ops
_GET_INDEX = "get_index"
_PUT_RESULT = "put_result"
_INDEX = "index"
_EMPTY = "empty"
_STOP = "stop"
_OK = "ok"


def _send(sock: socket.socket, obj: Any) -> None:
    payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(_HDR.pack(len(payload)) + payload)


def _recv(sock: socket.socket) -> Any:
    hdr = _recv_exact(sock, _HDR.size)
    (n,) = _HDR.unpack(hdr)
    return pickle.loads(_recv_exact(sock, n))


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf.extend(chunk)
    return bytes(buf)


class FetchError(RuntimeError):
    """A remote worker's fetch raised; carries the remote traceback."""


class _RemoteException:
    """Exception surrogate that crosses the wire as a string traceback
    (the reference's ExceptionWrapper role, dataloader.py:380)."""

    def __init__(self, index):
        self.index = index
        self.tb = traceback.format_exc()


class FetchService:
    """Trainer-side queue server (the RpycActor role).

    Workers connect over TCP and speak two ops: ``get_index`` pops the
    next index to fetch (or ``empty``/``stop``), ``put_result`` pushes a
    fetched sample back. Bounded queues provide backpressure exactly like
    the reference's Queue(maxsize=...) pair (:481-484).
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 index_queue_size: int = 64, result_queue_size: int = 64):
        self._index_q: "queue.Queue" = queue.Queue(index_queue_size)
        self._result_q: "queue.Queue" = queue.Queue(result_queue_size)
        self._stopping = threading.Event()
        svc = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                sock = self.request
                sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                try:
                    while True:
                        msg = _recv(sock)
                        op = msg[0]
                        if op == _GET_INDEX:
                            if svc._stopping.is_set():
                                _send(sock, (_STOP,))
                                continue
                            try:
                                idx = svc._index_q.get(timeout=1.0)
                            except queue.Empty:
                                _send(sock, (_STOP,) if svc._stopping.is_set()
                                      else (_EMPTY,))
                                continue
                            if idx is _STOP:
                                # re-broadcast so every worker thread sees it
                                svc._index_q.put(_STOP)
                                _send(sock, (_STOP,))
                            else:
                                _send(sock, (_INDEX, idx))
                        elif op == _PUT_RESULT:
                            svc._result_q.put((msg[1], msg[2]))
                            _send(sock, (_OK,))
                        else:   # pragma: no cover - protocol violation
                            raise ValueError(f"unknown op {op!r}")
                except (ConnectionError, OSError):
                    return      # worker went away; its indices were either
                                # delivered or still queued for others

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.address = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, kwargs={"poll_interval": 0.1},
            daemon=True)
        self._thread.start()

    # trainer-side API -----------------------------------------------------
    def submit(self, index: Any) -> None:
        self._index_q.put(index)

    def get_result(self, timeout: Optional[float] = None):
        return self._result_q.get(timeout=timeout)

    def stop(self) -> None:
        """Tell workers the epoch/run is over (their next get_index after
        the queue drains returns ``stop``)."""
        self._stopping.set()
        try:
            self._index_q.put_nowait(_STOP)
        except queue.Full:
            pass

    def close(self) -> None:
        self.stop()
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FetchWorker:
    """Remote CPU worker (the RayQueueWorker role, :349-407).

    ``fetch_fn(index) -> sample`` is the dataset fetcher — typically a
    decode+cpu_preprocess closure. ``num_threads`` overlaps fetches the
    way the reference's per-actor ThreadPoolExecutor does (:357, :401).
    Exceptions inside fetch_fn are shipped to the trainer instead of
    killing the worker (:378-381).
    """

    def __init__(self, host: str, port: int,
                 fetch_fn: Callable[[Any], Any], num_threads: int = 1):
        self.host, self.port = host, port
        self.fetch_fn = fetch_fn
        self.num_threads = max(1, num_threads)

    def _loop(self) -> None:
        sock = socket.create_connection((self.host, self.port))
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        try:
            while True:
                _send(sock, (_GET_INDEX,))
                msg = _recv(sock)
                if msg[0] == _STOP:
                    return
                if msg[0] == _EMPTY:
                    continue
                index = msg[1]
                try:
                    result = self.fetch_fn(index)
                except Exception:
                    result = _RemoteException(index)
                _send(sock, (_PUT_RESULT, index, result))
                if _recv(sock)[0] != _OK:   # pragma: no cover
                    raise ConnectionError("put_result not acked")
        finally:
            sock.close()

    def run(self) -> None:
        """Blocking: fetch until the service says stop."""
        threads = [threading.Thread(target=self._loop, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()


def run_worker(host: str, port: int, fetch_fn: Callable[[Any], Any],
               num_threads: int = 1) -> None:
    """Entry point for a remote CPU machine:
    ``python -c "from x2i_tpu.data.remote import run_worker; ..."``."""
    FetchWorker(host, port, fetch_fn, num_threads).run()


class RemoteFetchLoader:
    """Iterator over remotely fetched samples (the trainer-side iter,
    _RayPreprocessMultiProcessingDataLoaderIter's role, :411-...).

    ``sampler`` yields indices (shard URLs, tar member ranges, sample
    keys...). A feeder thread keeps the service's index queue full; the
    consumer yields results as workers deliver them (unordered — the
    reference's result queue is unordered too). Finite samplers
    terminate cleanly: exactly one result per sent index is accounted
    for, then the epoch ends; workers idle on ``empty`` between epochs
    and exit only when the owner calls ``service.stop()``/``close()``.

    on_error: "raise" (default) surfaces a remote traceback as
    FetchError; "warn" skips the sample and continues — the reference's
    warn-and-continue robustness stance (SURVEY §4).
    """

    def __init__(self, sampler: Iterable, service: FetchService,
                 on_error: str = "raise", timeout: float = 600.0):
        if on_error not in ("raise", "warn"):
            raise ValueError(f"on_error={on_error!r}")
        self.sampler = sampler
        self.service = service
        self.on_error = on_error
        self.timeout = timeout

    def __iter__(self) -> Iterator[Any]:
        sent = 0
        done_feeding = threading.Event()

        def feed():
            nonlocal sent
            for idx in self.sampler:
                self.service.submit(idx)
                sent += 1
            done_feeding.set()

        feeder = threading.Thread(target=feed, daemon=True)
        feeder.start()
        received = 0
        try:
            while not (done_feeding.is_set() and received >= sent):
                try:
                    index, result = self.service.get_result(timeout=0.5)
                except queue.Empty:
                    continue
                received += 1
                if isinstance(result, _RemoteException):
                    if self.on_error == "raise":
                        raise FetchError(
                            f"remote fetch of index {index!r} failed:\n"
                            f"{result.tb}")
                    import warnings
                    warnings.warn(
                        f"skipping index {index!r}: remote fetch failed "
                        f"(on_error='warn'):\n{result.tb}")
                    continue
                yield result
        finally:
            feeder.join(timeout=5)
