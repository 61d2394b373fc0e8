"""User-facing pipeline + CLI smoke: full tokens->image flow with random
weights, task surface, and the CLI writing an image file."""

import numpy as np
import pytest

from x2i_tpu import cli
from x2i_tpu.pipeline import build_random_pipeline


@pytest.fixture(scope="module")
def pipe():
    return build_random_pipeline("tiny")


def test_text2image(pipe):
    img = pipe.text2image("a red cat", seed=1)
    assert img.shape == (1, 64, 64, 3) and img.dtype == np.uint8


def test_prompt_changes_image(pipe):
    a = pipe.text2image("a red cat", seed=1)
    b = pipe.text2image("a blue dog", seed=1)
    assert not np.array_equal(a, b)


def test_seed_changes_image(pipe):
    a = pipe.text2image("a red cat", seed=1)
    b = pipe.text2image("a red cat", seed=2)
    assert not np.array_equal(a, b)
    c = pipe.text2image("a red cat", seed=1)
    np.testing.assert_array_equal(a, c)   # deterministic per seed


@pytest.mark.slow
def test_task_surface(pipe):
    for task in ("text2image", "image2image", "imagetext2image",
                 "video2image", "audio2image", "x2image"):
        img = pipe.run_task(task, prompt="hi")
        assert img.shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_cli_writes_image(tmp_path):
    out = str(tmp_path / "img.png")
    rc = cli.main(["--task", "text2image", "--prompt", "a cat",
                   "--random-weights", "tiny", "--num_steps", "2",
                   "--output", out])
    assert rc == 0
    from PIL import Image
    img = Image.open(out)
    assert img.size == (64, 64)


@pytest.mark.slow
def test_cli_requires_prompt():
    rc = cli.main(["--task", "text2image", "--random-weights", "tiny"])
    assert rc == 2


def test_cli_requires_checkpoints_without_random():
    rc = cli.main(["--task", "text2image", "--prompt", "x"])
    assert rc == 2


@pytest.mark.slow
def test_lightcontrol_inference(pipe):
    """Attach tiny ControlNeXt branches and generate with a control image
    (instruction-editing inference path)."""
    import jax
    import jax.numpy as jnp
    from x2i_tpu.core.config import ControlNeXtConfig
    from x2i_tpu.models.controlnext import init_control_bank

    ctrl_cfg = ControlNeXtConfig(
        in_channels=(8, 8), out_channels=(8, 16), groups=(2, 2),
        time_embed_dim=16, final_out_channels=pipe.flux.cfg.inner_dim,
        dtype=jnp.float32, param_dtype=jnp.float32)
    bank = init_control_bank(ctrl_cfg, pipe.flux.cfg.num_layers,
                             jax.random.key(0), image_size=64)
    cpipe = pipe.with_controls(ctrl_cfg, bank)

    pooled, embeds = cpipe.encode({"prompt": "edit this", "task":
                                   "imagetext2image"})
    ctrl_px = jnp.zeros((1, 64, 64, 3), jnp.float32)
    img_ctrl = cpipe.generate(pooled, embeds, control_pixels=ctrl_px,
                              seed=3)
    img_plain = cpipe.generate(pooled, embeds, seed=3)
    assert img_ctrl.shape == (1, 64, 64, 3)
    assert not np.array_equal(img_ctrl, img_plain)

    # probe: control image without attached branches -> clear error
    with pytest.raises(ValueError, match="with_controls"):
        pipe.generate(pooled, embeds, control_pixels=ctrl_px)


def test_mesh_serving_matches_single(pipe):
    """with_mesh shards the batch over the 'data' axis; outputs equal the
    unsharded program (DP serving scales throughput, not semantics)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(0)
    B, s_txt = 8, 16
    embeds = jnp.asarray(rng.standard_normal(
        (B, s_txt, pipe.flux.cfg.joint_attention_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal(
        (B, pipe.flux.cfg.pooled_projection_dim)), jnp.float32)
    want = pipe.generate(pooled, embeds, seed=5)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    mpipe = pipe.with_mesh(mesh)
    got = mpipe.generate(pooled, embeds, seed=5)
    # the partitioned program reorders bf16 accumulations — pixel-level
    # noise only (measured max 5/255 on the tiny model)
    d = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert d.max() <= 8 and d.mean() < 1.0

    with pytest.raises(ValueError):
        mpipe.generate(pooled[:3], embeds[:3], seed=5)
