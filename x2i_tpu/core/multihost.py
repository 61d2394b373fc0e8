"""Multi-host (multi-process) initialization.

The reference bootstraps its cluster from torchrun env vars + NCCL
(/root/reference/core/pipeline/train_and_infer.py:19-28,
train_minicpm.py:844-848). The TPU-native equivalent is
`jax.distributed.initialize` — afterwards `jax.devices()` spans the pod
slice, the mesh in core/mesh.py covers all hosts, and the SPMD programs are
unchanged. Data stays host-local: ShardSampler already splits shards by
jax.process_index().
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger("x2i_tpu")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. No-ops when single-process (no
    coordinator configured) so the same entry points run everywhere.

    Environment fallbacks mirror the torchrun convention the reference
    launchers use (MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK,
    train_minicpm.sh): COORDINATOR_ADDRESS > MASTER_ADDR:MASTER_PORT.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None and os.environ.get("MASTER_ADDR"):
        coordinator_address = (f"{os.environ['MASTER_ADDR']}:"
                               f"{os.environ.get('MASTER_PORT', '1234')}")
    if num_processes is None and os.environ.get("WORLD_SIZE"):
        num_processes = int(os.environ["WORLD_SIZE"])
    if process_id is None and os.environ.get("RANK"):
        process_id = int(os.environ["RANK"])

    if coordinator_address is None or (num_processes or 1) <= 1:
        log.info("single-process run (no coordinator configured)")
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info("multi-host initialized: process %d/%d, %d devices total",
             jax.process_index(), jax.process_count(),
             len(jax.devices()))


def is_main_process() -> bool:
    return jax.process_index() == 0
