"""Latent packing + the jitted denoising loop.

The reference drives the diffusers FluxPipeline denoise loop from python
(/root/reference/infer/inference_minicpm.py:181-215) and re-implements the
latent pack/id helpers for training
(/root/reference/train/train_minicpm.py:221-239). Here the whole sampling
loop is a single `lax.scan` over flow-match Euler steps — one XLA program,
no host round-trips per step (SURVEY.md §7.1.3).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from x2i_tpu.diffusion.scheduler import FlowMatchEulerScheduler


def prepare_latent_image_ids(height: int, width: int) -> jnp.ndarray:
    """(h/2 * w/2, 3) position ids: [:,0]=0, [:,1]=row, [:,2]=col
    (train_minicpm.py:221-232). height/width are the latent grid dims."""
    h2, w2 = height // 2, width // 2
    ids = jnp.zeros((h2, w2, 3), jnp.float32)
    ids = ids.at[..., 1].add(jnp.arange(h2, dtype=jnp.float32)[:, None])
    ids = ids.at[..., 2].add(jnp.arange(w2, dtype=jnp.float32)[None, :])
    return ids.reshape(h2 * w2, 3)


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) -> (B, H/2*W/2, C*4), 2x2 patchify
    (train_minicpm.py:234-239)."""
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(x: jnp.ndarray, height: int, width: int,
                   vae_scale_factor: int = 8) -> jnp.ndarray:
    """Inverse of pack_latents for pixel dims (FluxPipeline._unpack_latents).

    height/width are *pixel* dims; latent grid is // vae_scale_factor,
    rounded to the 2x2 patch like diffusers does.
    """
    b, s, ch = x.shape
    h = 2 * (height // (vae_scale_factor * 2))
    w = 2 * (width // (vae_scale_factor * 2))
    c = ch // 4
    x = x.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


def denoise(model_fn: Callable[..., jnp.ndarray],
            latents: jnp.ndarray,
            prompt_embeds: jnp.ndarray,
            pooled_embeds: jnp.ndarray,
            sigmas: jnp.ndarray,
            img_ids: jnp.ndarray,
            txt_ids: jnp.ndarray,
            guidance_scale: Optional[float] = None,
            mods=None) -> jnp.ndarray:
    """lax.scan over Euler steps.

    Args:
      model_fn: (latents, prompt, pooled, timestep, img_ids, txt_ids,
                 guidance|None[, mods]) -> velocity; typically a partial of
                 FluxTransformer2D.apply over frozen params.
      latents: (B, S_img, C) packed noisy latents.
      sigmas: (num_steps + 1,) from FlowMatchEulerScheduler.inference_sigmas.
      guidance_scale: baked guidance embed value (dev models), or None.
      mods: optional precomputed per-step adaLN modulation pytree with a
        leading num_steps axis (FluxTransformer2D mods_only=True output);
        scanned as xs and passed as model_fn's 8th argument.
    """
    batch = latents.shape[0]
    guidance = (None if guidance_scale is None
                else jnp.full((batch,), guidance_scale, jnp.float32))

    def step(carry, xs):
        lat = carry
        (sigma, sigma_next), m = xs
        timestep = jnp.full((batch,), sigma, jnp.float32)
        args = (lat, prompt_embeds, pooled_embeds, timestep, img_ids,
                txt_ids, guidance)
        vel = model_fn(*args) if m is None else model_fn(*args, m)
        lat = FlowMatchEulerScheduler.step(lat, vel, sigma, sigma_next)
        return lat, None

    pairs = (sigmas[:-1], sigmas[1:])
    latents, _ = jax.lax.scan(step, latents, (pairs, mods))
    return latents


def denoise_flux(model, params, noise, prompt_embeds, pooled_embeds,
                 sigmas, img_ids, txt_ids,
                 guidance_scale: Optional[float] = None,
                 precompute_mods: bool = True) -> jnp.ndarray:
    """denoise() over a FluxTransformer2D with the production
    precomputed-mods path: all denoise steps' adaLN modulations run in ONE
    pass (each mod weight read once per image instead of once per step,
    ~21.5 ms/image at 1024² batch 1 w8a8 — the shipping configuration of
    pipeline._generate_jit). bench.py and the profiling/serving tools
    share this so every measured program matches the one the pipeline
    compiles."""
    def model_fn(lat, pr, po, t, iid, tid, g, mods=None):
        return model.apply(params, lat, pr, po, t, iid, tid, guidance=g,
                           precomputed_mods=mods)

    mods = None
    if precompute_mods:
        mods = model.apply(
            params, noise, prompt_embeds, pooled_embeds, sigmas[:-1],
            img_ids, txt_ids,
            guidance=(None if guidance_scale is None else
                      jnp.full((noise.shape[0],), guidance_scale,
                               jnp.float32)),
            mods_only=True)
    return denoise(model_fn, noise, prompt_embeds, pooled_embeds, sigmas,
                   img_ids, txt_ids, guidance_scale=guidance_scale,
                   mods=mods)
