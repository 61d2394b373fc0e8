"""Full-size (12B) sharding consistency on the virtual mesh.

TP/SP were previously exercised only at toy scale; this AOT-lowers (not
runs) the full-size FluxConfig with shard_activations / shard_sequence
over an 8-device (data, tensor) mesh at the reference operating point
(4096 image + 512 text tokens, train_minicpm.py:553-557) to catch
sharding inconsistencies before real ICI ever appears. Lowering traces
the whole program and applies every with_sharding_constraint; only the
XLA backend compile is skipped.
"""

import jax
import jax.numpy as jnp

from x2i_tpu.core.config import FluxConfig, MeshConfig
from x2i_tpu.core.mesh import make_mesh
from x2i_tpu.diffusion.sampling import prepare_latent_image_ids
from x2i_tpu.models.flux import FluxTransformer2D


def _lower_fullsize(mesh, **cfg_kw):
    cfg = FluxConfig(quantized=True, guidance_embeds=False, **cfg_kw)
    model = FluxTransformer2D(cfg)
    grid, s_txt, b = 128, 512, 4          # 1024^2 operating point
    s_img = (grid // 2) ** 2

    args = (
        jnp.zeros((b, s_img, cfg.in_channels), cfg.dtype),
        jnp.zeros((b, s_txt, cfg.joint_attention_dim), cfg.dtype),
        jnp.zeros((b, cfg.pooled_projection_dim), cfg.dtype),
        jnp.zeros((b,), jnp.float32),
        prepare_latent_image_ids(grid, grid),
        jnp.zeros((s_txt, 3), jnp.float32))
    arg_structs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args)
    with jax.set_mesh(mesh):
        param_structs = jax.eval_shape(
            lambda: model.init(jax.random.key(0), *args))
        lowered = jax.jit(model.apply).lower(param_structs, *arg_structs)
    text = lowered.as_text()
    out = lowered.out_info
    assert out.shape == (b, s_img, cfg.out_channels if hasattr(
        cfg, "out_channels") else cfg.in_channels)
    return text


def test_fullsize_tensor_parallel_lowering():
    mesh = make_mesh(MeshConfig(data=4, fsdp=1, tensor=2))
    text = _lower_fullsize(mesh, shard_activations=True)
    assert "sharding" in text    # constraints survived into StableHLO


def test_fullsize_sequence_parallel_lowering():
    mesh = make_mesh(MeshConfig(data=4, fsdp=1, tensor=2))
    text = _lower_fullsize(mesh, shard_sequence=True)
    assert "sharding" in text
