"""Training loop runner: mesh placement, prefetch, checkpointing, metrics.

The orchestration layer the reference spreads across its torchrun main()
functions (/root/reference/train/train_minicpm.py:372-660,840-866):
auto-resume from the latest step directory, periodic checkpointing,
per-step metrics (step_loss, lr), plus first-class profiling hooks
(SURVEY.md §5.1 notes the reference has none).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from x2i_tpu.core.checkpointing import CheckpointManager
from x2i_tpu.core.mesh import make_mesh, replicate_tree, shard_batch
from x2i_tpu.core.profiling import StepTimer, trace

log = logging.getLogger("x2i_tpu.train")


class TrainLoop:
    """Generic step-function driver.

    Args:
      step_fn: (state, frozen_params, batch, rng) -> (state, metrics);
        jitted here.
      state: initial TrainState (params/opt_state/step).
      frozen_params: pytree closed over per step (already device-placed).
      batches: host iterable yielding dict batches.
      checkpoint_dir: step-directory checkpoints with latest-step
        auto-resume (train_minicpm.py:203-207,407-414 semantics).
    """

    def __init__(self, step_fn: Callable, state, frozen_params,
                 batches: Iterable, mesh=None,
                 checkpoint_dir: Optional[str] = None,
                 checkpointing_steps: int = 1000,
                 max_to_keep: Optional[int] = 5,
                 log_every: int = 50,
                 trace_dir: Optional[str] = None,
                 trace_steps: Optional[range] = None,
                 seed: int = 0,
                 on_metrics: Optional[Callable] = None,
                 aot_example_batch=None,
                 jit_step: bool = True):
        self.mesh = mesh or make_mesh()
        # jit_step=False: step_fn is already executable (e.g. the split
        # teacher/student two-program step from
        # train/single_chip.py::compile_single_chip_distill — the
        # colocated single program OOMs one 16 GB chip at full size);
        # the loop machinery (resume, checkpoints, metrics) is unchanged.
        self.jstep = jax.jit(step_fn) if jit_step else step_fn
        # on_metrics(step, metrics): per-step hook (metrics are device
        # arrays — the hook decides what to fetch); for loss curves /
        # external loggers without wrapping the batch iterator.
        self.on_metrics = on_metrics
        # aot_example_batch: compile the step ahead-of-time on this
        # batch's shapes at run() start. Runtime-jit dispatch of
        # 12B-scale programs through this environment's TPU relay takes
        # tens of minutes; .lower().compile() takes seconds and runs the
        # identical program (same pattern as bench.py).
        self._aot_batch = aot_example_batch
        self.state = state
        self.frozen_params = frozen_params
        self.batches = batches
        self.checkpointing_steps = checkpointing_steps
        self.log_every = log_every
        self.trace_dir = trace_dir
        self.trace_steps = trace_steps or range(0, 0)
        self.seed = seed
        self.ckpt = (CheckpointManager(checkpoint_dir, max_to_keep)
                     if checkpoint_dir else None)
        if self.ckpt is not None:
            restored = self.ckpt.restore(template=self.state)
            if restored is not None:
                self.state = restored
                log.info("resumed from step %s",
                         int(np.asarray(self.state.step)))
        # place trainable state + frozen weights on the mesh (replicated);
        # leaves already laid out across devices (e.g. FSDP-sharded by the
        # caller) are left untouched
        self.state = self._place(self.state)
        self.frozen_params = self._place(self.frozen_params)

    def _place(self, tree):
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(self.mesh, P())

        def put(x):
            sharding = getattr(x, "sharding", None)
            if sharding is not None and len(x.devices()) > 1:
                return x
            return jax.device_put(x, repl)

        return jax.tree_util.tree_map(put, tree)

    def run(self, max_steps: int) -> Dict[str, Any]:
        timer = StepTimer(warmup=1)
        rng = jax.random.key(self.seed)
        last_metrics: Dict[str, Any] = {}
        step0 = int(np.asarray(self.state.step))
        it = iter(self.batches)
        jstep = self.jstep
        if self._aot_batch is not None and hasattr(jstep, "lower"):
            ex = shard_batch(self._aot_batch, self.mesh)
            t0 = time.monotonic()
            jstep = self.jstep.lower(self.state, self.frozen_params, ex,
                                     jax.random.key(self.seed)).compile()
            log.info("AOT step compile: %.0fs", time.monotonic() - t0)
        for step in range(step0, max_steps):
            batch = shard_batch(next(it), self.mesh)
            rng, sub = jax.random.split(rng)
            tracing = step in self.trace_steps and self.trace_dir
            with trace(self.trace_dir if tracing else None):
                with timer:
                    self.state, metrics = jstep(
                        self.state, self.frozen_params, batch, sub)
                    jax.block_until_ready(metrics["loss"])
            if self.on_metrics is not None:
                self.on_metrics(step, metrics)
            if step % self.log_every == 0 or step == max_steps - 1:
                last_metrics = {k: float(np.asarray(v))
                                for k, v in metrics.items()}
                log.info("step %d %s", step, last_metrics)
            if self.ckpt is not None and \
                    (step + 1) % self.checkpointing_steps == 0:
                self.ckpt.save(step + 1, self.state)
        if self.ckpt is not None:
            self.ckpt.save(max_steps, self.state, wait=True)
        last_metrics["timing"] = timer.summary()
        return last_metrics
