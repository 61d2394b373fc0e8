"""Flag-gated disaggregated teacher/student pools.

The reference's L1 layer splits each 8-GPU node into 2 inference ranks
(frozen MLLM + teachers + teacher FLUX) and 6 training ranks, exchanging
tensors with NCCL gather/scatter from inside the dataloader's side-stream
thread (/root/reference/core/pipeline/train_and_infer.py:31-122;
train/train_minicpm.py:292-370).

The default x2i_tpu design colocates both in one jitted step (SURVEY.md
§7.1.2). This module keeps the disaggregated topology available for
memory-constrained slices: the device set is partitioned into an `infer`
pool and a `train` pool; the teacher program runs jitted on the infer pool,
its outputs are transferred to the train pool (device-to-device through the
platform transfer path), and — like the reference — the exchange runs in
the prefetch loader's thread so it overlaps the training step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class DisaggregatedDistill:
    """Args:
      teacher_fn: (frozen_teacher_params, batch, rng) -> dict of teacher
        tensors (KD stacks, latents, mllm hidden states) — the infer-rank
        loop body (train_minicpm.py:663-825).
      student_fn: (state, frozen_student_params, batch, teacher_out, rng)
        -> (state, metrics) — the train-rank loop body.
      n_infer_devices: devices assigned to the infer pool (the reference
        uses 2 of 8 per node).
    """

    def __init__(self, teacher_fn: Callable, student_fn: Callable,
                 teacher_params, student_frozen_params, state,
                 n_infer_devices: int = 2,
                 devices: Optional[list] = None):
        devices = list(devices if devices is not None else jax.devices())
        if not 0 < n_infer_devices < len(devices):
            raise ValueError("need at least one device in each pool")
        self.infer_mesh = Mesh(
            np.asarray(devices[:n_infer_devices]), ("data",))
        self.train_mesh = Mesh(
            np.asarray(devices[n_infer_devices:]), ("data",))
        self._teacher = jax.jit(teacher_fn)
        self._student = jax.jit(student_fn)
        self.teacher_params = self._place(teacher_params, self.infer_mesh)
        self.student_frozen = self._place(student_frozen_params,
                                          self.train_mesh)
        self.state = self._place(state, self.train_mesh)

    @staticmethod
    def _place(tree, mesh):
        return jax.device_put(tree, NamedSharding(mesh, P()))

    def _shard_batch(self, batch, mesh):
        dp = mesh.shape["data"]

        def put(x):
            x = np.asarray(x)
            spec = (P("data", *([None] * (x.ndim - 1)))
                    if x.ndim and x.shape[0] % dp == 0 else P())
            return jax.device_put(x, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(put, batch)

    def teacher_step(self, batch, rng):
        """Run the teacher on the infer pool and ship results to the train
        pool (the reference's gather→infer→scatter round-trip)."""
        infer_batch = self._shard_batch(batch, self.infer_mesh)
        out = self._teacher(self.teacher_params, infer_batch, rng)
        return self._place(jax.device_get(out), self.train_mesh)

    def train_stream(self, batches: Iterable, rngs: Iterator,
                     prefetch: int = 2):
        """Iterator of (train_batch, teacher_out) with the teacher exchange
        running in a background thread, mirroring InferPreprocess
        (train_minicpm.py:292-370)."""
        from x2i_tpu.data.loader import PrefetchLoader

        def produce():
            for batch in batches:
                rng = next(rngs)
                yield (self._shard_batch(batch, self.train_mesh),
                       self.teacher_step(batch, rng))

        return PrefetchLoader(produce(), prefetch=prefetch)

    def step(self, train_batch, teacher_out, rng):
        self.state, metrics = self._student(
            self.state, self.student_frozen, train_batch, teacher_out, rng)
        return metrics
