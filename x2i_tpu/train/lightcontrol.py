"""Phase-2 LightControl finetune: train 19 ControlNeXt branches with a
flow-matching MSE loss while everything else stays frozen.

Reference: /root/reference/lightcontrol/train_lightcontrol.py:670-798.
Semantics matched:
  * VAE-encode the style/target image, logit-normal u -> index into the
    (shift-applied) training sigma table, noise x_t=(1-σ)x+σz (:693-706).
  * guided_hint = the style/target pixels (:732-743 passes `pixel_values`,
    the VAE input — the separately-loaded condition image tensor is unused
    there); conditioning text embeds come from the frozen MLLM+proj.
  * loss = mean over batch of per-sample mean((pred - (noise - x0))^2),
    weighting scheme "none" (:746-762); grad-clip 1.0, AdamW, grad-accum.

TPU redesign: the 19 branches are vmapped stacked params feeding the FLUX
double-block scan as per-layer xs (models/controlnext.py), the whole step is
one jitted function, DP-sharded over the mesh; ZeRO-2-equivalent placement =
fsdp-sharded optimizer state via core.mesh.fsdp_shard_tree.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from x2i_tpu.core.config import (ControlNeXtConfig, FluxConfig,
                                 LightControlConfig, SchedulerConfig)
from x2i_tpu.diffusion.sampling import (pack_latents,
                                        prepare_latent_image_ids,
                                        unpack_latents)
from x2i_tpu.diffusion.scheduler import (FlowMatchEulerScheduler,
                                         compute_density_for_timestep_sampling)
from x2i_tpu.models.controlnext import apply_control_bank


class ControlTrainState(NamedTuple):
    params: Any                    # stacked ControlNeXt params
    opt_state: Any
    step: jnp.ndarray


def make_lightcontrol_optimizer(ccfg: LightControlConfig
                                ) -> optax.GradientTransformation:
    if ccfg.use_8bit_adam:
        from x2i_tpu.train.optim8bit import adamw8bit
        adam = adamw8bit(ccfg.learning_rate)
    else:
        adam = optax.adamw(ccfg.learning_rate)
    opt = optax.chain(
        optax.clip_by_global_norm(ccfg.max_grad_norm),
        adam,
    )
    if ccfg.gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, ccfg.gradient_accumulation_steps)
    return opt


def make_lightcontrol_step(
        flux_apply: Callable,        # frozen DiT fwd (accepts controls=)
        vae_encode: Optional[Callable],  # (pixels NHWC, rng) -> latents NHWC
        conditioning_fn: Callable,   # (batch) -> (pooled, prompt_embeds)
        control_cfg: ControlNeXtConfig,
        flux_cfg: FluxConfig,
        ccfg: LightControlConfig,
        sched_cfg: SchedulerConfig,
        optimizer: optax.GradientTransformation,
        guidance_scale: Optional[float] = 3.5):
    """Returns step_fn(state, flux_params, batch, rng) -> (state, metrics).

    batch: {"style_pixels": (B, H, W, 3) in [-1,1] target/style image,
            + whatever conditioning_fn needs (token ids, condition image)}.

    vae_encode=None: batch must carry precomputed "latents" (B, h, w, C)
    — the VAE encoder runs as its OWN program and hands off the 1 MB
    latent instead of joining this jit. At the 1024^2 operating point the
    encoder's full-resolution conv buffers otherwise co-reside with the
    12B DiT backward and tip a 16 GB chip over HBM
    (tools/tpu_lightcontrol_bench.py measures both ways).
    """
    sched = FlowMatchEulerScheduler(sched_cfg)
    n_train = sched_cfg.num_train_timesteps
    base = jnp.linspace(1.0, 1.0 / n_train, n_train, dtype=jnp.float32)
    # image_seq_len only matters under dynamic shifting (dev-style cfgs
    # shift statically during training, matching the reference scheduler)
    train_sigmas = sched.shift_sigmas(base, image_seq_len=4096)

    def step_fn(state: ControlTrainState, flux_params, batch, rng):
        pixels = batch["style_pixels"]
        bsz = pixels.shape[0]
        r_vae, r_t, r_noise = jax.random.split(rng, 3)

        # frozen preamble
        latents = (batch["latents"] if vae_encode is None
                   else vae_encode(pixels, r_vae))        # (B, h, w, C)
        latents = jnp.transpose(latents, (0, 3, 1, 2))    # NCHW for packing
        h, w = latents.shape[2], latents.shape[3]
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)

        u = compute_density_for_timestep_sampling(
            r_t, bsz, "logit_normal", ccfg.logit_mean, ccfg.logit_std)
        idx = jnp.clip((u * n_train).astype(jnp.int32), 0, n_train - 1)
        sigmas = train_sigmas[idx]                        # (B,)
        noisy = sched.add_noise(latents.astype(jnp.float32), noise,
                                sigmas)
        packed = pack_latents(noisy).astype(flux_cfg.dtype)

        pooled, prompt = conditioning_fn(batch)
        pooled = jax.lax.stop_gradient(pooled)
        prompt = jax.lax.stop_gradient(prompt)

        img_ids = prepare_latent_image_ids(h, w)
        txt_ids = jnp.zeros((prompt.shape[1], 3), jnp.float32)
        guidance = (jnp.full((bsz,), guidance_scale, jnp.float32)
                    if flux_cfg.guidance_embeds else None)
        target = noise - latents.astype(jnp.float32)

        def loss_fn(ctrl_params):
            controls = apply_control_bank(
                control_cfg, ctrl_params, pixels, sigmas * 1000.0,
                impl=ccfg.control_bank_impl)
            pred = flux_apply(
                flux_params, packed, prompt.astype(flux_cfg.dtype),
                pooled.astype(flux_cfg.dtype), sigmas, img_ids, txt_ids,
                guidance, controls=controls)
            pred = unpack_latents(pred, h * 8, w * 8).astype(jnp.float32)
            per_sample = jnp.mean(
                jnp.square(pred - target).reshape(bsz, -1), axis=1)
            return jnp.mean(per_sample)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return ControlTrainState(params, opt_state, state.step + 1), metrics

    return step_fn
