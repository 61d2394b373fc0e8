"""Request-batching serving engine.

The reference serves one request at a time from CLI scripts; for production
TPU serving, throughput comes from batching requests into fixed-shape
jitted generate programs. This engine collects requests from concurrent
producers into size-bucketed batches — a partial batch runs the smallest
compiled bucket that fits (e.g. {1, 2, 4}), so a lone request at batch_size
4 runs the size-1 program instead of padding 75% of the TPU step with
duplicate work. Each bucket size is one static shape, so XLA compiles each
once. Results are delivered per-request via futures.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional

import numpy as np


class BatchingServer:
    """Args:
      generate_batch: fn(list_of_request_dicts_padded_to_bucket) ->
        np.ndarray images (B, H, W, 3); requests carry the encoder inputs.
      batch_size: largest compiled batch (top bucket).
      max_wait_s: max latency to wait filling a batch before dispatching.
      buckets: compiled batch sizes (default: powers of two up to
        batch_size); a partial batch runs the smallest bucket that fits.
    """

    _STOP = object()

    def __init__(self, generate_batch: Callable[[List[Dict]], np.ndarray],
                 batch_size: int = 1, max_wait_s: float = 0.05,
                 buckets: Optional[List[int]] = None):
        self.generate_batch = generate_batch
        self.batch_size = batch_size
        self.max_wait_s = max_wait_s
        if buckets is None:
            # powers of two up to batch_size (plus batch_size itself)
            buckets, b = [], 1
            while b < batch_size:
                buckets.append(b)
                b *= 2
            buckets.append(batch_size)
        self.buckets = sorted(set(buckets))
        if self.buckets[-1] != batch_size:
            raise ValueError(f"buckets {buckets} must top out at "
                             f"batch_size {batch_size}")
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
            items = [(r, f) for r, f in items if r is not self._STOP]
            if not items:
                continue          # woken only by the close() sentinel
            requests = [r for r, _ in items]
            # run the smallest compiled bucket that fits; pad only the
            # (at most bucket/2 - 1) remainder slots
            bucket = next(b for b in self.buckets if b >= len(requests))
            padded = requests + [requests[-1]] * (bucket - len(requests))
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
        # unblock the collector; the _STOP marker is filtered out in _loop
        # (processing it as a request would leave a stray generate running
        # through interpreter shutdown)
        self._queue.put((self._STOP, Future()))
        self._thread.join(timeout=5)
