"""Device mesh + sharding utilities.

The reference's distributed layer is torch.distributed/NCCL process groups
with manual gather/scatter (/root/reference/core/pipeline/train_and_infer.py).
The TPU-native replacement is a single `jax.sharding.Mesh` over ICI with
named-sharding annotations; XLA inserts the collectives (SURVEY.md §2.6/§5.8).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from x2i_tpu.core.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, fsdp, tensor) mesh over the available devices.

    Any axis set to -1 absorbs the remaining device count. Axis sizes must
    multiply to the device count.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [cfg.data, cfg.fsdp, cfg.tensor]
    fixed = math.prod(s for s in sizes if s != -1)
    if n % fixed != 0:
        raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
    sizes = [n // fixed if s == -1 else s for s in sizes]
    if math.prod(sizes) != n:
        raise ValueError(f"mesh {sizes} != {n} devices")
    grid = np.asarray(devices).reshape(sizes)
    return Mesh(grid, cfg.axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over data+fsdp, replicate the rest."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays on-device with batch-dim sharding.
    Batches not divisible by the dp axis are replicated instead (small
    smoke runs)."""
    dp = mesh.shape["data"] * mesh.shape["fsdp"]

    def _put(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % dp != 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = P(("data", "fsdp"), *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, batch)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a parameter pytree on every device of the mesh."""
    sharding = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def fsdp_shard_tree(tree, mesh: Mesh, min_size: int = 2 ** 18):
    """ZeRO-style sharding: shard the largest dim of each big leaf over the
    fsdp axis (used for optimizer state; SURVEY.md §2.6 'ZeRO-equivalent')."""
    fsdp_size = mesh.shape["fsdp"]

    def _shard(x):
        if x.ndim == 0 or x.size < min_size:
            return jax.device_put(x, replicate(mesh))
        dims = list(x.shape)
        # pick the largest dim divisible by the fsdp axis size
        cand = [i for i in range(len(dims)) if dims[i] % fsdp_size == 0]
        if not cand:
            return jax.device_put(x, replicate(mesh))
        axis = max(cand, key=lambda i: dims[i])
        spec = [None] * len(dims)
        spec[axis] = "fsdp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(_shard, tree)
