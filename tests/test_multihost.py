"""Multi-host execution: two real jax.distributed processes on localhost.

The reference runs its cluster bootstrap on every training launch
(torchrun env + NCCL, /root/reference/train/train_minicpm.py:844-848);
this is the executed TPU-native analogue — core/multihost.py has to
actually initialize a 2-process CPU cluster, the global mesh has to span
both processes, a sharded computation has to produce the right global
result, and ShardSampler's per-host split has to be disjoint.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import sys
import jax

rank = int(sys.argv[1])
port = sys.argv[2]
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from x2i_tpu.core import multihost
multihost.initialize(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())
assert multihost.is_main_process() == (rank == 0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from x2i_tpu.core.config import MeshConfig
from x2i_tpu.core.mesh import make_mesh

mesh = make_mesh(MeshConfig(data=4, fsdp=1, tensor=1))
sharding = NamedSharding(mesh, P("data"))

# host-local data -> global array -> global reduction over both processes
local = np.full((2, 4), float(rank + 1), np.float32)   # 2 local devices
glob = jax.make_array_from_process_local_data(sharding, local, (4, 4))
total = jax.jit(
    lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(glob)
# rows: [1,1,2,2] each summed over 4 cols -> 24
np.testing.assert_allclose(jax.device_get(total), 24.0)

# one real distill train step over the combined mesh
from x2i_tpu.train.harness import build_tiny_distill
step_fn, state, flux_params, batch = build_tiny_distill(batch_size=4)
repl = NamedSharding(mesh, P())
gbatch = {}
for k, v in batch.items():
    v = np.asarray(v)
    lv = v[rank * 2:(rank + 1) * 2]
    gbatch[k] = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", *[None] * (v.ndim - 1))), lv,
        v.shape)
state = jax.device_put(state, repl)
flux_params = jax.device_put(flux_params, repl)
state, metrics = jax.jit(step_fn)(state, flux_params, gbatch,
                                  jax.random.key(0))
loss = float(jax.device_get(metrics["loss"]))
assert np.isfinite(loss), loss

from x2i_tpu.data.webdataset import ShardSampler
shards = [f"s{i}.tar" for i in range(4)]
mine = list(ShardSampler(shards, resample=False, host_index=rank,
                         host_count=2))
print(f"RESULT rank={rank} loss={loss:.6f} shards={sorted(mine)}",
      flush=True)
"""


def test_two_process_distill_step(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    # the parent conftest forces an 8-device host platform via XLA_FLAGS;
    # the workers pin their own 2-device count via jax_num_cpu_devices
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    procs = [
        subprocess.Popen([sys.executable, str(script), str(rank),
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                fields = dict(
                    kv.split("=", 1)
                    for kv in line[len("RESULT "):].split(" ", 2))
                results[int(fields["rank"])] = fields
    assert set(results) == {0, 1}
    # SPMD: both processes compute the same global loss
    assert results[0]["loss"] == results[1]["loss"]
    # per-host shard split is disjoint and covers the set
    s0, s1 = eval(results[0]["shards"]), eval(results[1]["shards"])
    assert not (set(s0) & set(s1))
    assert set(s0) | set(s1) == {f"s{i}.tar" for i in range(4)}
