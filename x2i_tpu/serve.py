"""Request-batching serving engine.

The reference serves one request at a time from CLI scripts; for production
TPU serving, throughput comes from batching requests into the fixed-shape
jitted generate program. This engine collects requests from concurrent
producers into fixed-size batches (padding the tail with the last request
to keep shapes static and compiles unique), runs the pipeline, and delivers
per-request results via futures.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional

import numpy as np


class BatchingServer:
    """Args:
      generate_batch: fn(list_of_request_dicts_padded_to_batch) ->
        np.ndarray images (B, H, W, 3); requests carry the encoder inputs.
      batch_size: static batch the jitted program was compiled for.
      max_wait_s: max latency to wait filling a batch before padding.
    """

    def __init__(self, generate_batch: Callable[[List[Dict]], np.ndarray],
                 batch_size: int = 1, max_wait_s: float = 0.05):
        self.generate_batch = generate_batch
        self.batch_size = batch_size
        self.max_wait_s = max_wait_s
        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, request: Dict[str, Any]) -> "Future[np.ndarray]":
        fut: "Future[np.ndarray]" = Future()
        self._queue.put((request, fut))
        return fut

    def generate(self, request: Dict[str, Any],
                 timeout: Optional[float] = None) -> np.ndarray:
        return self.submit(request).result(timeout)

    def _collect(self) -> List:
        import time
        items = [self._queue.get()]
        deadline = time.monotonic() + self.max_wait_s
        while len(items) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _loop(self):
        while not self._stop.is_set():
            try:
                items = self._collect()
            except Exception:             # noqa: BLE001
                continue
            requests = [r for r, _ in items]
            # pad to the static batch with copies of the last request
            padded = requests + [requests[-1]] * (
                self.batch_size - len(requests))
            try:
                images = self.generate_batch(padded)
                for i, (_, fut) in enumerate(items):
                    fut.set_result(np.asarray(images[i]))
            except Exception as exn:      # noqa: BLE001
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(exn)

    def close(self):
        self._stop.set()
        # unblock the collector
        self._queue.put(({}, Future()))
        self._thread.join(timeout=5)
