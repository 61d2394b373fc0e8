"""Phase-2 LightControl: ControlNeXt shapes, control-bank vmap, and a full
training step on tiny configs (loss finite, only control params move)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import (ControlNeXtConfig, LightControlConfig,
                                 SchedulerConfig, VAEConfig,
                                 tiny_flux_config)
from x2i_tpu.models.controlnext import (ControlNeXt, apply_control_bank,
                                        init_control_bank)
from x2i_tpu.models.flux import FluxTransformer2D
from x2i_tpu.models.vae import AutoencoderKL
from x2i_tpu.train.lightcontrol import (ControlTrainState,

                                        make_lightcontrol_optimizer,
                                        make_lightcontrol_step)

pytestmark = pytest.mark.slow


def tiny_control():
    return ControlNeXtConfig(in_channels=(8, 8), out_channels=(8, 16),
                             groups=(2, 2), time_embed_dim=16,
                             final_out_channels=128, dtype=jnp.float32,
                             param_dtype=jnp.float32)


def test_controlnext_shapes(rng):
    cfg = tiny_control()
    model = ControlNeXt(cfg)
    px = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    t = jnp.full((2,), 500.0)
    params = model.init(jax.random.key(0), px, t)
    out = model.apply(params, px, t)
    # 32 -> stem /2 -> 16 -> two downs -> 4 -> final k2s2 -> 2x2 = 4 tokens
    assert out["out"].shape == (2, 4, cfg.final_out_channels)
    assert out["scale"] == 1.0
    assert np.isfinite(np.asarray(out["out"])).all()


def test_control_bank_independent_branches(rng):
    cfg = tiny_control()
    bank = init_control_bank(cfg, 3, jax.random.key(0), image_size=32)
    px = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    t = jnp.full((1,), 100.0)
    outs = apply_control_bank(cfg, bank, px, t)
    assert outs.shape == (3, 1, 4, cfg.final_out_channels)
    # distinct init keys -> distinct branch outputs
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))


def test_lightcontrol_step_trains_controls_only(rng):
    # tiny flux whose in_channels match a 4-channel VAE (4*4=16)
    flux_cfg = tiny_flux_config(guidance_embeds=True, in_channels=16)
    vae_cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                        latent_channels=4, norm_num_groups=4,
                        dtype=jnp.float32, param_dtype=jnp.float32)
    # 32px image -> vae /2 -> 16x16 latents -> 8x8=64 packed tokens;
    # control: 32 -> 16 -> 4 -> 2x2... must yield 64 tokens to match.
    # Use a control stem that lands on 8x8: image 32, stem/2=16, downs->4,
    # final k2s2 -> 2x2 = 4. Instead feed the control a 256px-equivalent:
    # simplest consistent setup: image 128 -> vae latents 64 -> wait; keep
    # control tokens == image tokens by feeding control the 32px image and
    # flux a 4x4 latent grid (4 packed tokens)? ControlNeXt divides by 16.
    # VAE divides by 2 here (1 downsample). Choose px=64: vae-> 32x32 lat
    # -> 16x16=256 tokens; control 64 -> /16 -> 4x4 = 16 tokens. Mismatch.
    # => use a VAE with 3 blocks (/4) and px=64: lat 16x16 -> 64 tokens;
    # control 64/16=4 -> 16 tokens. Still mismatched; the real models match
    # because VAE/8 & 2x2-pack = /16 == ControlNeXt /16. So give the VAE
    # 4 blocks (/8) like the real one.
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                        latent_channels=4, norm_num_groups=4,
                        dtype=jnp.float32, param_dtype=jnp.float32)
    ctrl_cfg = tiny_control()
    ccfg = LightControlConfig(gradient_accumulation_steps=1,
                              learning_rate=1e-3)
    sched_cfg = SchedulerConfig(shift=3.0)

    PX = 32   # 32px -> latents 4x4 -> 2x2=4 packed tokens; control 4 tokens
    flux = FluxTransformer2D(flux_cfg)
    vae = AutoencoderKL(vae_cfg)

    B, S_txt = 2, 8
    key = jax.random.key(0)
    px = jnp.asarray(rng.standard_normal((B, PX, PX, 3)), jnp.float32)
    vae_params = vae.init(key, px)

    s_img = (PX // 16) ** 2
    flux_params = flux.init(
        key, jnp.zeros((1, s_img, flux_cfg.in_channels)),
        jnp.zeros((1, S_txt, flux_cfg.joint_attention_dim)),
        jnp.zeros((1, flux_cfg.pooled_projection_dim)), jnp.zeros((1,)),
        jnp.zeros((s_img, 3)), jnp.zeros((S_txt, 3)),
        guidance=jnp.ones((1,)),
        controls=jnp.zeros((flux_cfg.num_layers, 1, s_img,
                            flux_cfg.inner_dim)))
    bank = init_control_bank(ctrl_cfg, flux_cfg.num_layers, key,
                             image_size=PX)
    # tiny control outputs 128 ch but flux inner dim is 128 -> match
    assert ctrl_cfg.final_out_channels == flux_cfg.inner_dim

    prompt = jnp.asarray(
        rng.standard_normal((B, S_txt, flux_cfg.joint_attention_dim)),
        jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, flux_cfg.pooled_projection_dim)),
        jnp.float32)

    def conditioning_fn(batch):
        return pooled, prompt

    def vae_encode(pixels, rng):
        return vae.apply(vae_params, pixels, rng, method=vae.encode)

    optimizer = make_lightcontrol_optimizer(ccfg)
    step_fn = make_lightcontrol_step(
        flux.apply, vae_encode, conditioning_fn, ctrl_cfg, flux_cfg, ccfg,
        sched_cfg, optimizer)
    state = ControlTrainState(bank, optimizer.init(bank),
                              jnp.zeros((), jnp.int32))

    batch = {"style_pixels": px}
    jstep = jax.jit(step_fn)
    losses = []
    for i in range(4):
        state, metrics = jstep(state, flux_params, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert float(metrics["grad_norm"]) > 0
    # control params moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), bank, state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_control_bank_scan_matches_vmap(rng):
    cfg = tiny_control()
    bank = init_control_bank(cfg, 3, jax.random.key(0), image_size=32)
    px = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    t = jnp.full((1,), 100.0)
    out_vmap = apply_control_bank(cfg, bank, px, t, impl="vmap")
    out_scan = apply_control_bank(cfg, bank, px, t, impl="scan")
    # vmap and sequential lower to different conv fusions; f32-level only
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_vmap),
                               atol=1e-4, rtol=1e-4)
    # gradients flow through the remat'd sequential path
    g = jax.grad(lambda b: jnp.sum(
        apply_control_bank(cfg, b, px, t, impl="scan") ** 2))(bank)
    assert max(float(jnp.abs(x).max())
               for x in jax.tree_util.tree_leaves(g)) > 0
