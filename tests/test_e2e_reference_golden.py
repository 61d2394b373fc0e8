"""Composed end-to-end seed-fixed goldens: the full generate and the full
distillation step against torch mirrors composed EXACTLY the way the
reference composes them.

Every stage is individually golden-pinned elsewhere (DiT, VAE, scheduler
math, proj, KD loss); these tests close the last verification seam — the
WIRING. A slip in any composition constant (timestep x1000 vs x1,
guidance embed scale, sigma table indexing, unpack order, VAE
scale/shift) passes the per-module goldens but fails here.

The torch side re-implements the reference's inference composition
(/root/reference/infer/inference_minicpm.py:181-215: FluxPipeline
internals — sigma schedule + Euler loop — then _unpack_latents,
(lat/scale)+shift, vae.decode, VaeImageProcessor.postprocess) from the
reference/diffusers formulas directly in this file, independent of
x2i_tpu.diffusion; only the block modules come from torch_mirrors.

Fast tier: tiny configs, f32, CPU.
"""

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from x2i_tpu.core.config import (GenerationConfig, ProjConfig,
                                 SchedulerConfig, VAEConfig,
                                 tiny_flux_config)
from x2i_tpu.convert.load import vae_params_from_diffusers
from x2i_tpu.convert.torch_models import flux_params_from_diffusers
from x2i_tpu.diffusion.scheduler import FlowMatchEulerScheduler
from x2i_tpu.models.flux import FluxTransformer2D
from x2i_tpu.models.proj import Proj
from x2i_tpu.models.vae import AutoencoderKL
from x2i_tpu.pipeline import X2IPipeline

from test_flux_reference_golden import _mirror
from torch_mirrors import MirrorAutoencoderKL

B = 1
H = W = 64                       # latent grid 8x8 -> 16 packed tokens
S_TXT = 8


def _ref_sigmas(num_steps, image_seq_len, shift, use_dynamic_shifting,
                base_shift=0.5, max_shift=1.16, base_seq_len=256,
                max_seq_len=4096):
    """FluxPipeline sigma schedule, written from the reference formulas
    (train_minicpm.py:242-252 calculate_shift; diffusers
    FlowMatchEulerDiscreteScheduler.set_timesteps)."""
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
    if use_dynamic_shifting:
        m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
        b = base_shift - m * base_seq_len
        mu = image_seq_len * m + b
        sigmas = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))
    else:
        sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def _ref_latent_image_ids(grid_h, grid_w):
    """FluxPipeline._prepare_latent_image_ids (train_minicpm.py:221-232)."""
    ids = np.zeros((grid_h // 2, grid_w // 2, 3), np.float32)
    ids[..., 1] += np.arange(grid_h // 2)[:, None]
    ids[..., 2] += np.arange(grid_w // 2)[None, :]
    return ids.reshape(-1, 3)


def _ref_unpack(latents, height, width, vae_scale_factor=8):
    """FluxPipeline._unpack_latents (inference_minicpm.py:210)."""
    b, s, ch = latents.shape
    h = 2 * (height // (vae_scale_factor * 2))
    w = 2 * (width // (vae_scale_factor * 2))
    c = ch // 4
    x = latents.view(b, h // 2, w // 2, c, 2, 2)
    x = x.permute(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


def _mirror_generate(mirror_dit, mirror_vae, prompt_embeds, pooled, noise,
                     num_steps, guidance_scale, sched: SchedulerConfig):
    """The reference generate() composition end to end, in torch."""
    lat = torch.from_numpy(noise).clone()
    s_img = lat.shape[1]
    sigmas = _ref_sigmas(num_steps, s_img, sched.shift,
                         sched.use_dynamic_shifting, sched.base_shift,
                         sched.max_shift, sched.base_image_seq_len,
                         sched.max_image_seq_len)
    grid = 2 * (H // 16)
    img_ids = torch.from_numpy(_ref_latent_image_ids(grid, grid))
    txt_ids = torch.zeros((S_TXT, 3))
    pe = torch.from_numpy(prompt_embeds)
    po = torch.from_numpy(pooled)
    g = (torch.full((B,), guidance_scale)
         if guidance_scale is not None else None)
    with torch.no_grad():
        for i in range(num_steps):
            t = torch.full((B,), float(sigmas[i]))
            vel = mirror_dit(lat, pe, po, t, img_ids, txt_ids, guidance=g)
            lat = lat + (float(sigmas[i + 1]) - float(sigmas[i])) * vel
        lat = _ref_unpack(lat, H, W)
        img = mirror_vae.decode(lat)        # (lat/scale)+shift inside,
        # pinned against the reference composition in
        # tests/test_vae_reference_golden.py
        img = (img / 2 + 0.5).clamp(0, 1)   # VaeImageProcessor.postprocess
    return np.round(img.numpy() * 255.0).astype(np.uint8)


def _build_pair(rng, guidance_embeds, sched):
    fcfg = tiny_flux_config(guidance_embeds=guidance_embeds)
    mirror_dit = _mirror(fcfg, seed=3 + int(guidance_embeds))
    flux_params = {"params": flux_params_from_diffusers(
        mirror_dit.state_dict(), fcfg)}

    vcfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                     latent_channels=16, norm_num_groups=4,
                     dtype=jnp.float32, param_dtype=jnp.float32)
    torch.manual_seed(11)
    mirror_vae = MirrorAutoencoderKL(
        block_out_channels=vcfg.block_out_channels,
        layers_per_block=vcfg.layers_per_block,
        latent_channels=vcfg.latent_channels,
        norm_num_groups=vcfg.norm_num_groups,
        scaling_factor=vcfg.scaling_factor,
        shift_factor=vcfg.shift_factor,
        use_mid_attention=vcfg.use_mid_attention).eval()
    vae_params = {"params": vae_params_from_diffusers(
        mirror_vae.state_dict(), vcfg)}

    pcfg = ProjConfig(in_channels=3, input_dim=16,
                      output_dim0=fcfg.pooled_projection_dim,
                      output_dim1=fcfg.joint_attention_dim)
    proj = Proj(pcfg)
    proj_params = proj.init(jax.random.key(0),
                            jnp.zeros((1, 3, S_TXT, 16)))

    pipe = X2IPipeline(
        encoder_fn=lambda inputs: None, proj=proj, proj_params=proj_params,
        flux=FluxTransformer2D(fcfg), flux_params=flux_params,
        vae=AutoencoderKL(vcfg), vae_params=vae_params,
        scheduler=FlowMatchEulerScheduler(sched),
        gen_cfg=GenerationConfig(height=H, width=W,
                                 num_inference_steps=4,
                                 guidance_scale=3.5, seed=0))
    return pipe, mirror_dit, mirror_vae, fcfg


def _run_composed(rng, guidance_embeds, sched):
    pipe, mirror_dit, mirror_vae, fcfg = _build_pair(
        rng, guidance_embeds, sched)
    prompt_embeds = rng.standard_normal(
        (B, S_TXT, fcfg.joint_attention_dim)).astype(np.float32)
    pooled = rng.standard_normal(
        (B, fcfg.pooled_projection_dim)).astype(np.float32)

    # the EXACT noise generate() derives from its seed (pipeline.py:199);
    # f32 round-trip of bf16 values is lossless, so the torch side sees
    # bit-identical starting latents
    s_img = (2 * (H // 16)) * (2 * (W // 16)) // 4
    noise = np.asarray(jax.random.normal(
        jax.random.key(pipe.gen_cfg.seed),
        (B, s_img, fcfg.in_channels), jnp.bfloat16), np.float32)

    got = pipe.generate(jnp.asarray(pooled), jnp.asarray(prompt_embeds))
    want = _mirror_generate(
        mirror_dit, mirror_vae, prompt_embeds, pooled, noise,
        num_steps=4,
        guidance_scale=3.5 if guidance_embeds else None,
        sched=sched)
    want = want.transpose(0, 2, 3, 1)        # NCHW -> our NHWC uint8
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # f32 end to end: accumulated per-module tolerance (~1e-3 in [-1,1])
    # lands some pixels on the other side of a uint8 quantization
    # boundary, but never further — any wiring-constant slip produces
    # order-255 deltas
    assert diff.max() <= 1, f"max pixel delta {diff.max()}"
    assert (diff > 0).mean() < 0.3, f"{(diff > 0).mean():.4f} of pixels off"


def test_composed_generate_schnell(rng):
    """4-step schnell operating point: static shift 1.0, no guidance
    (inference_minicpm.py:32,181-215)."""
    _run_composed(rng, guidance_embeds=False,
                  sched=SchedulerConfig(shift=1.0))


def test_composed_generate_dev(rng):
    """dev operating point: dynamic shifting (calculate_shift mu) +
    guidance embeds at 3.5 (README.md:93, inference_minicpm.py:190)."""
    _run_composed(rng, guidance_embeds=True,
                  sched=SchedulerConfig(use_dynamic_shifting=True))


def test_composed_distill_step(rng):
    """One FULL phase-1 step — seeded sigma=1 latents + teacher FLUX KD
    stacks + the reference's own Proj7Exp + student FLUX + the exact KD
    loss + backward — composed in torch exactly as
    train_minicpm.py:372-825 composes it, vs make_distill_step at
    identical weights. Loss and proj grad norm must agree."""
    import importlib.util

    import optax
    import torch.nn.functional as F

    from x2i_tpu.convert.torch_models import proj_params_from_reference
    from x2i_tpu.core.config import DistillConfig
    from x2i_tpu.diffusion.sampling import pack_latents
    from x2i_tpu.train.distill import TrainState, make_distill_step

    spec = importlib.util.spec_from_file_location(
        "ref_proj_e2e", "/root/reference/utils/proj.py")
    ref_proj_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_proj_mod)

    fcfg = tiny_flux_config(guidance_embeds=True)
    mirror_dit = _mirror(fcfg, seed=5)
    flux_params = {"params": flux_params_from_diffusers(
        mirror_dit.state_dict(), fcfg)}

    torch.manual_seed(9)
    C_IN = 3
    ref_proj = ref_proj_mod.Proj7Exp(
        in_channels=C_IN, kernel_size=5, input_dim=16,
        output_dim0=fcfg.pooled_projection_dim,
        output_dim1=fcfg.joint_attention_dim, norm_eps=1e-6,
        use_t5=False, use_scale=False, use_cnn=True).float()
    pcfg = ProjConfig(in_channels=C_IN, kernel_size=5, input_dim=16,
                      output_dim0=fcfg.pooled_projection_dim,
                      output_dim1=fcfg.joint_attention_dim,
                      use_t5=False, use_scale=False, use_cnn=True,
                      dtype=jnp.float32, param_dtype=jnp.float32)
    proj_params = {"params": proj_params_from_reference(
        {f"module.{k}": v for k, v in ref_proj.state_dict().items()},
        pcfg)}

    Bd, S = 2, S_TXT
    dcfg = DistillConfig(latent_height=8, latent_width=8, text_seq_len=S)
    states = rng.standard_normal((Bd, C_IN, S, 16)).astype(np.float32)
    t5_seq = rng.standard_normal(
        (Bd, S, fcfg.joint_attention_dim)).astype(np.float32)
    clip_pooled = rng.standard_normal(
        (Bd, fcfg.pooled_projection_dim)).astype(np.float32)

    # ---- ours: one colocated step with sgd(1.0) so the update IS -grad
    flux = FluxTransformer2D(fcfg)
    proj = Proj(pcfg)
    opt = optax.sgd(1.0)
    step_fn = make_distill_step(
        flux.apply, proj.apply,
        teacher_text_fn=lambda b: (jnp.asarray(t5_seq),
                                   jnp.asarray(clip_pooled)),
        student_states_fn=lambda b: jnp.asarray(states),
        optimizer=opt, flux_cfg=fcfg, dcfg=dcfg, guidance_scale=3.5)
    state = TrainState(proj_params, opt.init(proj_params),
                       jnp.zeros((), jnp.int32))
    key = jax.random.key(42)
    new_state, metrics = jax.jit(step_fn)(
        state, flux_params, {"d": jnp.zeros((Bd, 1))}, key)

    # ---- torch: the same step composed the reference way
    latents = np.asarray(pack_latents(jax.random.normal(
        key, (Bd, fcfg.in_channels // 4, 8, 8), jnp.float32)))
    lat_t = torch.from_numpy(latents)
    t_t = torch.ones((Bd,))
    g_t = torch.full((Bd,), 3.5)
    grid = prepare_img_ids = _ref_latent_image_ids(8, 8)
    img_ids_t = torch.from_numpy(prepare_img_ids)
    txt_ids_t = torch.zeros((S, 3))
    with torch.no_grad():
        _, t_aux = mirror_dit(lat_t, torch.from_numpy(t5_seq),
                              torch.from_numpy(clip_pooled), t_t,
                              img_ids_t, txt_ids_t, guidance=g_t,
                              collect_attn=True)
    pooled_s, seq_s = ref_proj(torch.from_numpy(states))
    _, s_aux = mirror_dit(lat_t, seq_s, pooled_s, t_t, img_ids_t,
                          txt_ids_t, guidance=g_t, collect_attn=True)

    def norm(x):
        return (x - x.mean(-1, keepdim=True)) / (1e-7 + x.std(-1,
                                                              keepdim=True))

    loss_t = 0.0
    for i in range(fcfg.num_layers):          # train_minicpm.py:606-620
        for k in ("double_img", "double_txt"):
            loss_t = loss_t + F.kl_div(
                F.softmax(norm(t_aux[k][:, i]) / 3.0, -1).log(),
                F.softmax(norm(s_aux[k][:, i]) / 3.0, -1),
                reduction="batchmean")
    for i in range(fcfg.num_single_layers):   # :621-625
        loss_t = loss_t + F.kl_div(
            F.softmax(norm(t_aux["single"][:, i]) / 3.0, -1).log(),
            F.softmax(norm(s_aux["single"][:, i]) / 3.0, -1),
            reduction="batchmean")
    loss_t.backward()
    gnorm_t = math.sqrt(sum(float((p.grad ** 2).sum())
                            for p in ref_proj.parameters()
                            if p.grad is not None))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(loss_t.detach()), rtol=5e-4)
    np.testing.assert_allclose(float(metrics["grad_norm"]), gnorm_t,
                               rtol=2e-3)
    # the sgd(1.0) update moved the params by exactly -grad
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params, new_state.params)
    assert max(jax.tree.leaves(delta)) > 0
