"""FLUX DiT numeric goldens vs a diffusers-free torch transcription of the
reference module (/root/reference/lightcontrol/lightcontrol_flux.py:44-553).

The torch mirror (tests/torch_mirrors.py) reproduces the reference forward
semantics with diffusers state-dict naming; its state_dict() flows through
convert.torch_models.flux_params_from_diffusers exactly like a released
checkpoint would. These tests pin:
  * the plain forward (VERDICT r2 item 1 — the module every converted
    checkpoint traverses),
  * the per-block attention outputs (the KD stacks distillation trains on,
    train_minicpm.py:335-337),
  * the guidance-embed variant (FLUX.1-dev),
  * LightControl control injection (lightcontrol_flux.py:504-507) with the
    ControlNeXt branches ALSO converted from torch.

Fast tier: tiny config, f32, CPU.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from x2i_tpu.core.config import ControlNeXtConfig, tiny_flux_config
from x2i_tpu.convert.load import controlnext_bank_params_from_reference
from x2i_tpu.convert.torch_models import flux_params_from_diffusers
from x2i_tpu.diffusion.sampling import prepare_latent_image_ids
from x2i_tpu.models.controlnext import apply_control_bank
from x2i_tpu.models.flux import FluxTransformer2D

from torch_mirrors import MirrorControlNeXt, MirrorFluxTransformer2D

B, S_TXT, GRID = 2, 8, 8
S_IMG = (GRID // 2) * (GRID // 2)


def _mirror(cfg, seed=0):
    torch.manual_seed(seed)
    m = MirrorFluxTransformer2D(
        patch_size=cfg.patch_size, in_channels=cfg.in_channels,
        num_layers=cfg.num_layers,
        num_single_layers=cfg.num_single_layers,
        attention_head_dim=cfg.attention_head_dim,
        num_attention_heads=cfg.num_attention_heads,
        joint_attention_dim=cfg.joint_attention_dim,
        pooled_projection_dim=cfg.pooled_projection_dim,
        guidance_embeds=cfg.guidance_embeds,
        axes_dims_rope=cfg.axes_dims_rope,
        time_embed_channels=cfg.time_embed_dim)
    return m.eval()


def _inputs(rng):
    hidden = rng.standard_normal((B, S_IMG, 64)).astype(np.float32)
    encoder = rng.standard_normal((B, S_TXT, 64)).astype(np.float32)
    pooled = rng.standard_normal((B, 32)).astype(np.float32)
    t = np.asarray([0.25, 0.9], np.float32)
    img_ids = np.asarray(prepare_latent_image_ids(GRID, GRID), np.float32)
    txt_ids = np.zeros((S_TXT, 3), np.float32)
    return hidden, encoder, pooled, t, img_ids, txt_ids


def _torch_out(mirror, inputs, collect_attn=False, **kw):
    hidden, encoder, pooled, t, img_ids, txt_ids = map(
        torch.from_numpy, inputs)
    with torch.no_grad():
        return mirror(hidden, encoder, pooled, t, img_ids, txt_ids,
                      collect_attn=collect_attn, **kw)


def _jax_apply(cfg, mirror, inputs, **kw):
    params = flux_params_from_diffusers(mirror.state_dict(), cfg)
    model = FluxTransformer2D(cfg)
    hidden, encoder, pooled, t, img_ids, txt_ids = map(
        jnp.asarray, inputs)
    return model.apply({"params": params}, hidden, encoder, pooled, t,
                       img_ids, txt_ids, **kw)


def test_forward_matches_reference_semantics(rng):
    cfg = tiny_flux_config()
    mirror = _mirror(cfg)
    inputs = _inputs(rng)
    ref = _torch_out(mirror, inputs).numpy()
    out = np.asarray(_jax_apply(cfg, mirror, inputs))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_kd_attention_stacks_match(rng):
    """The distillation targets: post-projection double-block img/txt
    attention outputs and raw single-block attention
    (train_minicpm.py:211-219,335-337)."""
    cfg = tiny_flux_config()
    mirror = _mirror(cfg, seed=1)
    inputs = _inputs(rng)
    ref_out, ref_aux = _torch_out(mirror, inputs, collect_attn=True)
    out, aux = _jax_apply(cfg, mirror, inputs, return_attn_outputs=True)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(),
                               rtol=2e-4, atol=2e-5)
    for key in ("double_img", "double_txt", "single"):
        np.testing.assert_allclose(
            np.asarray(aux[key]), ref_aux[key].numpy(),
            rtol=2e-4, atol=2e-5, err_msg=key)


def test_guidance_variant_matches(rng):
    cfg = tiny_flux_config(guidance_embeds=True)
    mirror = _mirror(cfg, seed=2)
    inputs = _inputs(rng)
    g = np.asarray([3.5 / 1000, 1.0 / 1000], np.float32)
    ref = _torch_out(mirror, inputs,
                     guidance=torch.from_numpy(g)).numpy()
    out = np.asarray(_jax_apply(cfg, mirror, inputs,
                                guidance=jnp.asarray(g)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_interleaved_rope_layout_matches(rng):
    """Same weights through the interleaved (non-permuted) rope path."""
    cfg = tiny_flux_config(rope_layout="interleaved")
    mirror = _mirror(cfg, seed=3)
    inputs = _inputs(rng)
    ref = _torch_out(mirror, inputs).numpy()
    out = np.asarray(_jax_apply(cfg, mirror, inputs))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def _tiny_controlnext():
    return ControlNeXtConfig(in_channels=(128, 16), out_channels=(16, 16),
                             groups=(4, 4), time_embed_dim=16,
                             final_out_channels=128,
                             dtype=jnp.float32, param_dtype=jnp.float32)


def test_control_injection_matches(rng):
    """Full LightControl path: per-double-block ControlNeXt residuals
    (lightcontrol_flux.py:504-507), branches converted from torch."""
    cfg = tiny_flux_config()
    ccfg = _tiny_controlnext()
    mirror = _mirror(cfg, seed=4)
    nets = []
    for i in range(cfg.num_layers):
        torch.manual_seed(10 + i)
        nets.append(MirrorControlNeXt(
            in_channels=ccfg.in_channels, out_channels=ccfg.out_channels,
            groups=ccfg.groups, time_embed_dim=ccfg.time_embed_dim,
            final_out_channels=ccfg.final_out_channels).eval())
    inputs = _inputs(rng)
    # 64px hint -> /16 through stem+2 stages+head = 4x4 = S_IMG tokens
    hint = rng.standard_normal((B, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_out(mirror, inputs,
                         guided_hint=torch.from_numpy(hint),
                         control_nets=nets).numpy()

    bank_sd = {}
    for i, net in enumerate(nets):
        for k, v in net.state_dict().items():
            bank_sd[f"{i}.{k}"] = v
    bank = controlnext_bank_params_from_reference(bank_sd, cfg.num_layers)
    t = jnp.asarray(inputs[3]) * 1000.0
    controls = apply_control_bank(
        ccfg, bank, jnp.asarray(hint.transpose(0, 2, 3, 1)), t)
    out = np.asarray(_jax_apply(cfg, mirror, inputs, controls=controls))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
