"""Train loop runner: steps advance, checkpoints save, resume restores the
step counter (reference auto-resume semantics)."""

import numpy as np
import pytest

from x2i_tpu.train.harness import build_tiny_distill
from x2i_tpu.train.runner import TrainLoop

pytestmark = pytest.mark.slow


def _batches(batch):
    while True:
        yield batch


def test_loop_runs_and_checkpoints(tmp_path):
    step_fn, state, flux_params, batch = build_tiny_distill(batch_size=8)
    loop = TrainLoop(step_fn, state, flux_params, _batches(batch),
                     checkpoint_dir=str(tmp_path / "ckpt"),
                     checkpointing_steps=2, log_every=1)
    metrics = loop.run(3)
    assert np.isfinite(metrics["loss"])
    assert metrics["timing"]["steps"] >= 1

    # resume: a fresh loop restores step=3 and continues to 5
    step_fn2, state2, flux_params2, _ = build_tiny_distill(batch_size=8)
    loop2 = TrainLoop(step_fn2, state2, flux_params2, _batches(batch),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      checkpointing_steps=100, log_every=1)
    assert int(np.asarray(loop2.state.step)) == 3
    m2 = loop2.run(5)
    assert np.isfinite(m2["loss"])


def test_train_cli_smoke(tmp_path):
    from x2i_tpu.train import cli
    rc = cli.main(["distill", "--tiny", "--synthetic", "--batch_size", "4",
                   "--max_train_steps", "2", "--checkpointing_steps", "100",
                   "--output_dir", str(tmp_path / "out")])
    assert rc == 0


def test_train_cli_rejects_full_without_ckpts():
    from x2i_tpu.train import cli
    rc = cli.main(["distill", "--max_train_steps", "1"])
    assert rc == 2


def test_multihost_initialize_noop_single_process(monkeypatch):
    from x2i_tpu.core import multihost
    for var in ("COORDINATOR_ADDRESS", "MASTER_ADDR", "WORLD_SIZE", "RANK"):
        monkeypatch.delenv(var, raising=False)
    multihost.initialize()          # must no-op without a coordinator
    assert multihost.is_main_process()


def test_multihost_env_parsing(monkeypatch):
    from x2i_tpu.core import multihost
    calls = {}

    def fake_init(coordinator_address, num_processes, process_id):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    monkeypatch.setattr(multihost.jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "4321")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "2")
    multihost.initialize()
    assert calls == {"addr": "10.0.0.1:4321", "n": 4, "pid": 2}


def test_lightcontrol_cli_smoke(tmp_path):
    from x2i_tpu.train import cli
    rc = cli.main(["lightcontrol", "--tiny", "--batch_size", "2",
                   "--max_train_steps", "2", "--checkpointing_steps", "100",
                   "--output_dir", str(tmp_path / "lc")])
    assert rc == 0
    rc2 = cli.main(["lightcontrol", "--max_train_steps", "1"])
    assert rc2 == 2


def test_checkpoint_roundtrip_sharded(tmp_path):
    """Multi-chip checkpoint parity (SURVEY §5.4): an fsdp-sharded param
    tree saves and restores with values intact (orbax handles the
    sharded arrays natively); restore works without a mesh too."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from x2i_tpu.core.checkpointing import CheckpointManager
    from x2i_tpu.core.config import MeshConfig
    from x2i_tpu.core.mesh import fsdp_shard_tree, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(data=2, fsdp=4, tensor=1),
                     devices=jax.devices()[:8])
    rng = np.random.default_rng(0)
    tree = {"w": jnp.asarray(rng.standard_normal((16, 64)), jnp.float32),
            "b": jnp.asarray(rng.standard_normal((64,)), jnp.float32)}
    sharded = fsdp_shard_tree(tree, mesh, min_size=1)

    ck = CheckpointManager(str(tmp_path / "ckpt"))
    ck.save(3, sharded, wait=True)
    ck.close()

    restored = CheckpointManager(str(tmp_path / "ckpt")).restore(
        template=jax.tree.map(np.zeros_like, tree))
    for k in tree:
        np.testing.assert_array_equal(np.asarray(restored[k]),
                                      np.asarray(tree[k]))
