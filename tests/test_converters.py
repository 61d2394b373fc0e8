"""Converter <-> model naming consistency: synthesize state dicts with the
upstream (diffusers/HF) names at tiny shapes, convert, and apply the model —
any param-tree mismatch fails at apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2i_tpu.convert.load import (internvl_params_from_hf,
                                  vae_params_from_diffusers)
from x2i_tpu.convert.torch_models import flux_params_from_diffusers
from x2i_tpu.core.config import (InternViTConfig, InternVLConfig, VAEConfig,
                                 tiny_flux_config, tiny_qwen2_config)
from x2i_tpu.diffusion.sampling import prepare_latent_image_ids
from x2i_tpu.models.flux import FluxTransformer2D
from x2i_tpu.models.internvl import InternVLEncoder
from x2i_tpu.models.vae import AutoencoderKL


def _fill(sd, rng):
    return {k: rng.standard_normal(v).astype(np.float32)
            for k, v in sd.items()}


def test_flux_converter_matches_model(rng):
    cfg = tiny_flux_config()
    d = cfg.inner_dim
    mlp = int(d * cfg.mlp_ratio)
    shapes = {}

    def lin(name, o, i):
        shapes[name + ".weight"] = (o, i)
        shapes[name + ".bias"] = (o,)

    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}."
        lin(p + "norm1.linear", 6 * d, d)
        lin(p + "norm1_context.linear", 6 * d, d)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj"):
            lin(p + f"attn.{nm}", d, d)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            shapes[p + f"attn.{nm}.weight"] = (cfg.attention_head_dim,)
        lin(p + "attn.to_out.0", d, d)
        lin(p + "attn.to_add_out", d, d)
        lin(p + "ff.net.0.proj", mlp, d)
        lin(p + "ff.net.2", d, mlp)
        lin(p + "ff_context.net.0.proj", mlp, d)
        lin(p + "ff_context.net.2", d, mlp)
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}."
        lin(p + "norm.linear", 3 * d, d)
        for nm in ("to_q", "to_k", "to_v"):
            lin(p + f"attn.{nm}", d, d)
        for nm in ("norm_q", "norm_k"):
            shapes[p + f"attn.{nm}.weight"] = (cfg.attention_head_dim,)
        lin(p + "proj_mlp", mlp, d)
        lin(p + "proj_out", d, d + mlp)
    lin("x_embedder", d, cfg.in_channels)
    lin("context_embedder", d, cfg.joint_attention_dim)
    lin("proj_out", cfg.in_channels, d)
    lin("norm_out.linear", 2 * d, d)
    lin("time_text_embed.timestep_embedder.linear_1", d, cfg.time_embed_dim)
    lin("time_text_embed.timestep_embedder.linear_2", d, d)
    lin("time_text_embed.text_embedder.linear_1", d,
        cfg.pooled_projection_dim)
    lin("time_text_embed.text_embedder.linear_2", d, d)

    sd = _fill(shapes, rng)
    params = {"params": flux_params_from_diffusers(sd, cfg)}

    model = FluxTransformer2D(cfg)
    grid, s_txt = 4, 4
    out = model.apply(params,
                      jnp.zeros((1, 4, cfg.in_channels)),
                      jnp.zeros((1, s_txt, cfg.joint_attention_dim)),
                      jnp.zeros((1, cfg.pooled_projection_dim)),
                      jnp.full((1,), 0.5),
                      prepare_latent_image_ids(grid, grid),
                      jnp.zeros((s_txt, 3)))
    assert out.shape == (1, 4, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_converter_matches_model(rng):
    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                    latent_channels=4, norm_num_groups=4,
                    dtype=jnp.float32, param_dtype=jnp.float32)
    shapes = {}

    def conv(name, o, i, k=3):
        shapes[name + ".weight"] = (o, i, k, k)
        shapes[name + ".bias"] = (o,)

    def gn(name, c):
        shapes[name + ".weight"] = (c,)
        shapes[name + ".bias"] = (c,)

    def lin(name, o, i):
        shapes[name + ".weight"] = (o, i)
        shapes[name + ".bias"] = (o,)

    def resnet(p, cin, cout):
        gn(p + ".norm1", cin)
        conv(p + ".conv1", cout, cin)
        gn(p + ".norm2", cout)
        conv(p + ".conv2", cout, cout)
        if cin != cout:
            conv(p + ".conv_shortcut", cout, cin, k=1)

    def attnb(p, c):
        gn(p + ".group_norm", c)
        for nm in ("to_q", "to_k", "to_v"):
            lin(p + f".{nm}", c, c)
        lin(p + ".to_out.0", c, c)

    ch = cfg.block_out_channels
    conv("encoder.conv_in", ch[0], 3)
    resnet("encoder.down_blocks.0.resnets.0", ch[0], ch[0])
    conv("encoder.down_blocks.0.downsamplers.0.conv", ch[0], ch[0])
    resnet("encoder.down_blocks.1.resnets.0", ch[0], ch[1])
    resnet("encoder.mid_block.resnets.0", ch[1], ch[1])
    resnet("encoder.mid_block.resnets.1", ch[1], ch[1])
    attnb("encoder.mid_block.attentions.0", ch[1])
    gn("encoder.conv_norm_out", ch[1])
    conv("encoder.conv_out", 2 * cfg.latent_channels, ch[1])

    conv("decoder.conv_in", ch[1], cfg.latent_channels)
    resnet("decoder.mid_block.resnets.0", ch[1], ch[1])
    resnet("decoder.mid_block.resnets.1", ch[1], ch[1])
    attnb("decoder.mid_block.attentions.0", ch[1])
    resnet("decoder.up_blocks.0.resnets.0", ch[1], ch[1])
    resnet("decoder.up_blocks.0.resnets.1", ch[1], ch[1])
    conv("decoder.up_blocks.0.upsamplers.0.conv", ch[1], ch[1])
    resnet("decoder.up_blocks.1.resnets.0", ch[1], ch[0])
    resnet("decoder.up_blocks.1.resnets.1", ch[0], ch[0])
    gn("decoder.conv_norm_out", ch[0])
    conv("decoder.conv_out", 3, ch[0])

    sd = _fill(shapes, rng)
    params = {"params": vae_params_from_diffusers(sd, cfg)}
    vae = AutoencoderKL(cfg)
    px = jnp.zeros((1, 16, 16, 3), jnp.float32)
    out = vae.apply(params, px)
    assert out.shape == (1, 16, 16, 3)


def test_internvl_converter_matches_model(rng):
    vit_cfg = InternViTConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=28, patch_size=7,
                              qk_normalization=True,
                              dtype=jnp.float32, param_dtype=jnp.float32)
    llm_cfg = tiny_qwen2_config(hidden_size=32, num_attention_heads=2,
                                num_key_value_heads=2, head_dim=16,
                                intermediate_size=64)
    cfg = InternVLConfig(vision=vit_cfg, llm=llm_cfg,
                         img_context_token_id=7)
    shapes = {}
    C = vit_cfg.hidden_size
    shapes["vision_model.embeddings.class_embedding"] = (1, 1, C)
    npos = (vit_cfg.image_size // vit_cfg.patch_size) ** 2 + 1
    shapes["vision_model.embeddings.position_embedding"] = (1, npos, C)
    shapes["vision_model.embeddings.patch_embedding.weight"] = (
        C, 3, vit_cfg.patch_size, vit_cfg.patch_size)
    shapes["vision_model.embeddings.patch_embedding.bias"] = (C,)
    for i in range(vit_cfg.num_hidden_layers):
        p = f"vision_model.encoder.layers.{i}."
        for nm, o, iin in (("attn.qkv", 3 * C, C), ("attn.proj", C, C),
                           ("mlp.fc1", 64, C), ("mlp.fc2", C, 64)):
            shapes[p + nm + ".weight"] = (o, iin)
            shapes[p + nm + ".bias"] = (o,)
        for nm in ("norm1", "norm2"):
            shapes[p + nm + ".weight"] = (C,)
            shapes[p + nm + ".bias"] = (C,)
        shapes[p + "attn.q_norm.weight"] = (C,)
        shapes[p + "attn.k_norm.weight"] = (C,)
        shapes[p + "ls1"] = (C,)
        shapes[p + "ls2"] = (C,)
    H = llm_cfg.hidden_size
    shapes["language_model.model.embed_tokens.weight"] = (
        llm_cfg.vocab_size, H)
    for i in range(llm_cfg.num_hidden_layers):
        p = f"language_model.model.layers.{i}."
        hq = llm_cfg.num_attention_heads * llm_cfg.head_dim
        hk = llm_cfg.num_key_value_heads * llm_cfg.head_dim
        for nm, o in (("q_proj", hq), ("k_proj", hk), ("v_proj", hk)):
            shapes[p + f"self_attn.{nm}.weight"] = (o, H)
            shapes[p + f"self_attn.{nm}.bias"] = (o,)
        shapes[p + "self_attn.o_proj.weight"] = (H, hq)
        shapes[p + "input_layernorm.weight"] = (H,)
        shapes[p + "post_attention_layernorm.weight"] = (H,)
        for nm, o, iin in (("gate_proj", 64, H), ("up_proj", 64, H),
                           ("down_proj", H, 64)):
            shapes[p + f"mlp.{nm}.weight"] = (o, iin)
    shapes["language_model.model.norm.weight"] = (H,)
    # mlp1: LN over vit C*(1/0.5)^2 = 4C, then -> llm hidden
    shapes["mlp1.0.weight"] = (4 * C,)
    shapes["mlp1.0.bias"] = (4 * C,)
    shapes["mlp1.1.weight"] = (H, 4 * C)
    shapes["mlp1.1.bias"] = (H,)
    shapes["mlp1.3.weight"] = (H, H)
    shapes["mlp1.3.bias"] = (H,)

    sd = _fill(shapes, rng)
    params = {"params": internvl_params_from_hf(sd, cfg)}
    enc = InternVLEncoder(cfg)
    ids = np.full((1, 12), 3)
    ids[0, 2:6] = 7
    px = jnp.zeros((1, 28, 28, 3), jnp.float32)
    out = enc.apply(params, jnp.asarray(ids), jnp.ones((1, 12), bool), px)
    assert out.shape == (1, llm_cfg.num_hidden_layers + 1, 12, H)
    assert np.isfinite(np.asarray(out)).all()


def test_minicpmo_converter_matches_model(rng):
    """Synthesized MiniCPM-o state dict (vpm/resampler/apm/projector/llm
    names) -> MiniCPMOEncoder params, applied end to end."""
    import jax
    from x2i_tpu.convert.load import minicpmo_params_from_hf
    from x2i_tpu.models.minicpmo import MiniCPMOConfig, MiniCPMOEncoder
    from x2i_tpu.models.siglip import SiglipVisionConfig
    from x2i_tpu.models.whisper_enc import WhisperConfig

    vis = SiglipVisionConfig(hidden_size=16, intermediate_size=32,
                             num_hidden_layers=3, num_attention_heads=4,
                             image_size=28, patch_size=7,
                             drop_last_layer=True, dtype=jnp.float32,
                             param_dtype=jnp.float32)
    aud = WhisperConfig(num_mel_bins=8, d_model=16, encoder_layers=1,
                        encoder_attention_heads=4, encoder_ffn_dim=32,
                        max_source_positions=64, dtype=jnp.float32,
                        param_dtype=jnp.float32)
    llm = tiny_qwen2_config(hidden_size=32, num_attention_heads=2,
                            num_key_value_heads=2, head_dim=16,
                            intermediate_size=64)
    cfg = MiniCPMOConfig(vision=vis, audio=aud, llm=llm, query_num=4,
                         resampler_heads=4)

    shapes = {}
    C = 16
    # vpm (2 effective layers converted)
    shapes["vpm.embeddings.patch_embedding.weight"] = (C, 3, 7, 7)
    shapes["vpm.embeddings.patch_embedding.bias"] = (C,)
    shapes["vpm.embeddings.position_embedding.weight"] = (16, C)
    for i in range(vis.effective_layers):
        p = f"vpm.encoder.layers.{i}."
        for nm, o, ii in (("self_attn.q_proj", C, C),
                          ("self_attn.k_proj", C, C),
                          ("self_attn.v_proj", C, C),
                          ("self_attn.out_proj", C, C),
                          ("mlp.fc1", 32, C), ("mlp.fc2", C, 32)):
            shapes[p + nm + ".weight"] = (o, ii)
            shapes[p + nm + ".bias"] = (o,)
        for nm in ("layer_norm1", "layer_norm2"):
            shapes[p + nm + ".weight"] = (C,)
            shapes[p + nm + ".bias"] = (C,)
    shapes["vpm.post_layernorm.weight"] = (C,)
    shapes["vpm.post_layernorm.bias"] = (C,)
    # resampler
    D = 32
    shapes["resampler.query"] = (4, D)
    shapes["resampler.kv_proj.weight"] = (D, C)
    shapes["resampler.attn.in_proj_weight"] = (3 * D, D)
    shapes["resampler.attn.in_proj_bias"] = (3 * D,)
    shapes["resampler.attn.out_proj.weight"] = (D, D)
    shapes["resampler.attn.out_proj.bias"] = (D,)
    for nm in ("ln_q", "ln_kv", "ln_post"):
        shapes[f"resampler.{nm}.weight"] = (D,)
        shapes[f"resampler.{nm}.bias"] = (D,)
    shapes["resampler.proj"] = (D, D)
    # apm whisper
    shapes["apm.conv1.weight"] = (16, 8, 3)
    shapes["apm.conv1.bias"] = (16,)
    shapes["apm.conv2.weight"] = (16, 16, 3)
    shapes["apm.conv2.bias"] = (16,)
    p = "apm.layers.0."
    for nm, o, ii, b in (("self_attn.q_proj", 16, 16, True),
                         ("self_attn.k_proj", 16, 16, False),
                         ("self_attn.v_proj", 16, 16, True),
                         ("self_attn.out_proj", 16, 16, True),
                         ("fc1", 32, 16, True), ("fc2", 16, 32, True)):
        shapes[p + nm + ".weight"] = (o, ii)
        if b:
            shapes[p + nm + ".bias"] = (o,)
    for nm in ("self_attn_layer_norm", "final_layer_norm"):
        shapes[p + nm + ".weight"] = (16,)
        shapes[p + nm + ".bias"] = (16,)
    shapes["apm.layer_norm.weight"] = (16,)
    shapes["apm.layer_norm.bias"] = (16,)
    shapes["audio_projection_layer.linear1.weight"] = (D, 16)
    shapes["audio_projection_layer.linear1.bias"] = (D,)
    shapes["audio_projection_layer.linear2.weight"] = (D, D)
    shapes["audio_projection_layer.linear2.bias"] = (D,)
    # llm
    H = 32
    shapes["llm.model.embed_tokens.weight"] = (llm.vocab_size, H)
    for i in range(llm.num_hidden_layers):
        p = f"llm.model.layers.{i}."
        for nm, o in (("q_proj", 32), ("k_proj", 32), ("v_proj", 32)):
            shapes[p + f"self_attn.{nm}.weight"] = (o, H)
            shapes[p + f"self_attn.{nm}.bias"] = (o,)
        shapes[p + "self_attn.o_proj.weight"] = (H, 32)
        shapes[p + "input_layernorm.weight"] = (H,)
        shapes[p + "post_attention_layernorm.weight"] = (H,)
        for nm, o, ii in (("gate_proj", 64, H), ("up_proj", 64, H),
                          ("down_proj", H, 64)):
            shapes[p + f"mlp.{nm}.weight"] = (o, ii)
    shapes["llm.model.norm.weight"] = (H,)

    sd = _fill(shapes, rng)
    params = {"params": minicpmo_params_from_hf(sd, cfg)}

    from x2i_tpu.data.minicpm_vision import bounds_to_map
    enc = MiniCPMOEncoder(cfg)
    ids = np.full((1, 12), 3)
    out = enc.apply(params, jnp.asarray(ids), jnp.ones((1, 12), bool))
    assert out.shape == (1, llm.num_hidden_layers + 1, 12, H)
    assert np.isfinite(np.asarray(out)).all()


def test_native_checkpoint_roundtrip(tmp_path, rng):
    """save_native/load_native: orbax tree roundtrip incl. int8 leaves."""
    from x2i_tpu.convert.cli import load_native, save_native
    from x2i_tpu.ops.quant import quantize_tree
    tree = {"a": {"kernel": rng.standard_normal((8, 4)).astype(np.float32),
                  "bias": np.zeros(4, np.float32)},
            "emb": rng.standard_normal((10, 8)).astype(np.float32)}
    qtree = quantize_tree(tree)
    path = str(tmp_path / "ckpt")
    save_native(path, qtree)
    back = load_native(path)
    assert back["a"]["qkernel"].dtype == np.int8
    np.testing.assert_array_equal(np.asarray(back["a"]["qkernel"]),
                                  np.asarray(qtree["a"]["qkernel"]))
    np.testing.assert_allclose(np.asarray(back["emb"]), tree["emb"])


def test_load_safetensors_dir_torch_free(tmp_path):
    """Directory loader reads bf16 safetensors without torch."""
    import jax.numpy as jnp2
    from safetensors.flax import save_file
    from x2i_tpu.convert.load import load_safetensors_dir
    save_file({"w": jnp2.ones((2, 3), jnp2.bfloat16)},
              str(tmp_path / "a.safetensors"))
    save_file({"b": jnp2.arange(4, dtype=jnp2.float32)},
              str(tmp_path / "b.safetensors"))
    sd = load_safetensors_dir(str(tmp_path))
    assert set(sd) == {"w", "b"}
    assert sd["w"].shape == (2, 3)
    assert str(sd["w"].dtype) == "bfloat16"
    # converters transpose/stack numpy bf16 fine
    assert sd["w"].T.shape == (3, 2)
