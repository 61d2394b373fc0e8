"""Prefetching device loader — the reference's data engine, TPU-shaped.

The reference wraps torch DataLoader with a `Preprocess` hook interface
(cpu_preprocess in the fetcher, gpu_preprocess on a dedicated CUDA stream in
a daemon thread with a bounded queue) and an optional Ray/rpyc distributed
fetch layer (/root/reference/core/data/dataloader.py:36-48,75-177,269-784).

TPU equivalents:
  * the "side CUDA stream" is simply JAX's async dispatch — device_put of
    the next batch overlaps with the running step;
  * the daemon thread + bounded Queue(2) design carries over directly
    (PrefetchLoader);
  * the Ray/rpyc remote-fetch tier maps to a local multiprocessing worker
    pool (MultiprocessLoader) feeding the same queue — same role
    (parallel decode/tokenize off the trainer thread) without the torch/ray
    dependency. For genuinely cross-machine fetch (CPU fleet -> TPU host)
    see data/remote.py, which speaks the reference's index/result-queue
    protocol over plain TCP.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import numpy as np


class Preprocess:
    """Hook interface mirroring core/data/dataloader.py:36-48."""

    def has_cpu_preprocess(self) -> bool:
        return False

    def cpu_preprocess(self, sample):
        return sample

    def has_device_preprocess(self) -> bool:
        return False

    def device_preprocess(self, batch):
        """Runs on the loader thread right before the batch is handed to the
        training step (the reference runs its NCCL exchange here; a TPU
        colocated trainer typically just device_puts)."""
        return batch


class PrefetchLoader:
    """Daemon-thread loader with a bounded queue (depth 2, like the
    reference) that overlaps host-side preprocessing and device transfer
    with the running step."""

    _DONE = object()

    def __init__(self, batches: Iterable, preprocess: Optional[Preprocess]
                 = None, device_put: Optional[Callable] = None,
                 prefetch: int = 2, timeout: float = 600.0):
        self.batches = batches
        self.preprocess = preprocess
        self.device_put = device_put
        self.prefetch = prefetch
        self.timeout = timeout

    def __iter__(self) -> Iterator[Any]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        error: list = []

        def worker():
            try:
                for batch in self.batches:
                    if self.preprocess is not None and \
                            self.preprocess.has_device_preprocess():
                        batch = self.preprocess.device_preprocess(batch)
                    if self.device_put is not None:
                        batch = self.device_put(batch)
                    q.put(batch)
            except Exception as exn:          # noqa: BLE001
                error.append(exn)
            finally:
                q.put(self._DONE)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get(timeout=self.timeout)
            if item is self._DONE:
                if error:
                    raise error[0]
                return
            yield item


def _mp_worker(make_iterable, cpu_preprocess, out_q, worker_id, num_workers):
    try:
        it = make_iterable(worker_id, num_workers)
        for sample in it:
            if cpu_preprocess is not None:
                sample = cpu_preprocess(sample)
            out_q.put(sample)
    except Exception as exn:                  # noqa: BLE001
        out_q.put(("__error__", repr(exn)))
    else:
        # completion sentinel: lets the consumer terminate finite
        # (resample=False single-epoch) streams instead of blocking on
        # out_q.get until the timeout (reference robustness stance,
        # core/data/dataloader.py:368-397 retries; we prefer clean EOS).
        out_q.put(("__done__", worker_id))


class MultiprocessLoader:
    """Parallel sample production across processes (the Ray/rpyc tier's
    local equivalent). `make_iterable(worker_id, num_workers)` builds each
    worker's shard stream (disjoint by worker id)."""

    def __init__(self, make_iterable: Callable[[int, int], Iterable],
                 num_workers: int = 4,
                 cpu_preprocess: Optional[Callable] = None,
                 queue_size: int = 64):
        self.make_iterable = make_iterable
        self.num_workers = num_workers
        self.cpu_preprocess = cpu_preprocess
        self.queue_size = queue_size

    def __iter__(self):
        ctx = mp.get_context("fork")
        out_q: "mp.Queue" = ctx.Queue(maxsize=self.queue_size)
        procs = [
            ctx.Process(target=_mp_worker,
                        args=(self.make_iterable, self.cpu_preprocess,
                              out_q, i, self.num_workers),
                        daemon=True)
            for i in range(self.num_workers)
        ]
        for p in procs:
            p.start()
        done = 0
        try:
            while done < self.num_workers:
                item = out_q.get(timeout=600.0)
                if isinstance(item, tuple) and len(item) == 2:
                    if item[0] == "__error__":
                        raise RuntimeError(
                            f"data worker failed: {item[1]}")
                    if item[0] == "__done__":
                        done += 1
                        continue
                yield item
        finally:
            # clean join for workers that finished; terminate stragglers
            # (early consumer exit or error paths)
            for p in procs:
                p.join(timeout=0.5 if done >= self.num_workers else 0.0)
            for p in procs:
                if p.is_alive():
                    p.terminate()
            for p in procs:
                p.join(timeout=5.0)


def stack_collate(samples, keys=None):
    """Default collate: np.stack shared keys (mirrors the reference's
    torch.cat collate, datamodule_minicpm.py:339-357)."""
    keys = keys or [k for k in samples[0] if not k.startswith("__")]
    batch = {}
    for k in keys:
        vals = [np.asarray(s[k]) for s in samples]
        batch[k] = np.stack(vals)
    return batch
