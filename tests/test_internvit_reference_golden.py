"""InternViT numeric golden vs the reference's own vendored module
(/root/reference/model_internvl/internvl/modeling_intern_vit.py), loaded
with a timm DropPath stub (identity at the shipped drop_path_rate=0).

Pins the eager attention path, qk RMSNorm over flattened head dims,
ls1/ls2 residual scales, CLS + position embeddings, and (loosely) the
bicubic position-embedding interpolation for non-448 inputs.
Fast tier: tiny config, f32, CPU.
"""

import numpy as np
import torch

import jax.numpy as jnp

import ref_loader
from x2i_tpu.core.config import InternViTConfig
from x2i_tpu.models.internvl import InternViT

HS, LAYERS = 32, 2


def _pair(qk_norm: bool, seed=0):
    iv = ref_loader.load_intern_vit()
    import sys
    cfgmod = sys.modules["refivl.configuration_intern_vit"]
    rcfg = cfgmod.InternVisionConfig(
        patch_size=7, image_size=28, hidden_size=HS, qkv_bias=True,
        num_attention_heads=4, intermediate_size=64,
        qk_normalization=qk_norm, num_hidden_layers=LAYERS,
        use_flash_attn=False, norm_type="layer_norm",
        drop_path_rate=0.0, initializer_factor=0.1)
    torch.manual_seed(seed)
    ref = iv.InternVisionModel(rcfg).eval()
    cfg = InternViTConfig(hidden_size=HS, intermediate_size=64,
                          num_hidden_layers=LAYERS, num_attention_heads=4,
                          image_size=28, patch_size=7,
                          qk_normalization=qk_norm,
                          dtype=jnp.float32, param_dtype=jnp.float32)
    return ref, cfg


def _convert(ref, cfg):
    """Vision tower keys as they appear inside InternVLChatModel
    (prefix vision_model.) so internvl_params_from_hf's vision section
    applies unchanged."""
    from x2i_tpu.convert.load import internvl_params_from_hf
    from x2i_tpu.core.config import InternVLConfig, Qwen2Config

    sd = {f"vision_model.{k}": v for k, v in ref.state_dict().items()}
    # internvl_params_from_hf wants the full composite; fake an empty LM
    # by converting only the vision branch here.
    L = cfg.num_hidden_layers
    from x2i_tpu.convert.torch_models import _np, _stack
    p = "vision_model.encoder.layers.{i}."

    def lin_stack(fmt):
        return {"kernel": _stack(sd, fmt + ".weight", L),
                "bias": _stack(sd, fmt + ".bias", L, transpose=False)}

    def ln_stack(fmt):
        return {"scale": _stack(sd, fmt + ".weight", L, transpose=False),
                "bias": _stack(sd, fmt + ".bias", L, transpose=False)}

    block = {
        "norm1": ln_stack(p + "norm1"), "norm2": ln_stack(p + "norm2"),
        "qkv": lin_stack(p + "attn.qkv"),
        "proj": lin_stack(p + "attn.proj"),
        "fc1": lin_stack(p + "mlp.fc1"), "fc2": lin_stack(p + "mlp.fc2"),
        "ls1": _stack(sd, p + "ls1", L, transpose=False),
        "ls2": _stack(sd, p + "ls2", L, transpose=False),
    }
    if cfg.qk_normalization:
        block["q_norm_scale"] = _stack(sd, p + "attn.q_norm.weight", L,
                                       transpose=False)
        block["k_norm_scale"] = _stack(sd, p + "attn.k_norm.weight", L,
                                       transpose=False)
    return {"params": {
        "class_embedding": _np(
            sd["vision_model.embeddings.class_embedding"]),
        "position_embedding": _np(
            sd["vision_model.embeddings.position_embedding"]),
        "patch_embedding": {
            "kernel": _np(sd["vision_model.embeddings.patch_embedding"
                             ".weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["vision_model.embeddings.patch_embedding"
                           ".bias"])},
        "block": block,
    }}


def _run(ref, cfg, px_nchw):
    with torch.no_grad():
        out_ref = ref(pixel_values=torch.from_numpy(px_nchw)
                      ).last_hidden_state.numpy()
    got = InternViT(cfg).apply(
        _convert(ref, cfg), jnp.asarray(px_nchw.transpose(0, 2, 3, 1)))
    return np.asarray(got), out_ref


def test_native_size_golden(rng):
    ref, cfg = _pair(qk_norm=False)
    px = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    got, out_ref = _run(ref, cfg, px)
    np.testing.assert_allclose(got, out_ref, rtol=5e-4, atol=1e-4)


def test_qk_normalization_golden(rng):
    """The qk RMSNorm variant (InternAttention q_norm/k_norm over the
    flattened head dims, modeling_intern_vit.py:192-205)."""
    ref, cfg = _pair(qk_norm=True, seed=1)
    px = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    got, out_ref = _run(ref, cfg, px)
    np.testing.assert_allclose(got, out_ref, rtol=5e-4, atol=1e-4)


def test_interpolated_pos_embed(rng):
    """Non-448-equivalent input exercises the bicubic pos-embed resize
    (modeling_intern_vit.py:154-160), reproduced exactly by
    models/internvl._torch_bicubic_weights (torch bicubic,
    align_corners=False, no antialias)."""
    ref, cfg = _pair(qk_norm=False, seed=2)
    px = rng.standard_normal((1, 3, 14, 21)).astype(np.float32)
    got, out_ref = _run(ref, cfg, px)
    assert got.shape == out_ref.shape == (1, 1 + 2 * 3, HS)
    np.testing.assert_allclose(got, out_ref, rtol=5e-4, atol=1e-4)
