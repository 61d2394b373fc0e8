"""North-star benchmark: 1024^2 images/sec/chip, FLUX 4-step (BASELINE.md).

Runs the full-size (12B-param) FLUX DiT with int8 weight-only kernels +
bf16 compute on one chip: 4 denoising steps as a lax.scan at 4096 image
tokens + 512 text tokens, plus the VAE decode to 1024^2 pixels. Weights are
random (real checkpoints are not available in this environment) — the
compute cost is identical to converted weights.

vs_baseline: the reference runs FLUX.1-schnell 4-step 1024^2 on an 80GB
A100 (bf16, SDPA, /root/reference/infer/inference_minicpm.py). Public
measurements of that operating point cluster around 2.1 s/image ≈ 0.47
img/s; we report value / 0.47.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S = 0.47   # A100 FLUX-schnell 4-step 1024^2 (see docstring)

# The TPU relay in this environment can wedge (backend init never returns,
# uninterruptible in C). A watchdog keeps the driver from hanging forever:
# if the bench hasn't finished in time, report failure and hard-exit.
WATCHDOG_S = int(os.environ.get("X2I_BENCH_WATCHDOG_S", "2400"))


def _watchdog():
    time.sleep(WATCHDOG_S)
    print(json.dumps({
        "metric": "1024^2 images/sec/chip (FLUX 4-step + VAE, int8 weights)",
        "value": 0.0, "unit": "img/s", "vs_baseline": 0.0,
        "error": f"watchdog: TPU runtime unresponsive after {WATCHDOG_S}s",
    }), flush=True)
    os._exit(2)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from x2i_tpu.core.config import FluxConfig, SchedulerConfig, VAEConfig
    from x2i_tpu.diffusion import (FlowMatchEulerScheduler, denoise,
                                   prepare_latent_image_ids, unpack_latents)
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.vae import AutoencoderKL
    from __graft_entry__ import _full_size_quantized_flux_params

    # Sweep knobs (driver uses the defaults): X2I_BENCH_QUANT=w8|w8a8,
    # X2I_BENCH_BATCH=N, X2I_BENCH_PX=512|1024.
    # w8a8 (int8 MXU matmuls, dynamic per-token activation scales) is the
    # headline mode: 0.65 img/s vs 0.48 for w8 on a v5e chip (half rope
    # layout; X2I_BENCH_ROPE=interleaved for the diffusers layout). Quality:
    # at realistic weight/activation statistics the 4-step final-latent
    # drift is corr 0.9999 / rel 1.6% (tools/quant_quality.py; the early
    # corr-0.967 figure came from adversarial iota-pattern weights).
    # X2I_BENCH_QUANT=w8 to bench the weight-only mode.
    quant = os.environ.get("X2I_BENCH_QUANT", "w8a8")
    batch = int(os.environ.get("X2I_BENCH_BATCH", "1"))
    px = int(os.environ.get("X2I_BENCH_PX", "1024"))
    use_pallas = os.environ.get("X2I_BENCH_ATTN", "pallas") != "xla"
    # dev-mode operating point (reference README: FLUX.1-dev 28 steps,
    # guidance 3.5, dynamic shifting): X2I_BENCH_STEPS=28
    # X2I_BENCH_GUIDANCE=3.5. Default is the schnell 4-step headline.
    steps = int(os.environ.get("X2I_BENCH_STEPS", "4"))
    guidance_s = os.environ.get("X2I_BENCH_GUIDANCE")
    guidance = None if guidance_s is None else float(guidance_s)

    rope_layout = os.environ.get("X2I_BENCH_ROPE", "half")
    # Pallas fused glue kernels (ops/fused_glue.py): on w8a8 they fuse
    # LN/modulate/gelu + the dynamic activation quantization; on other
    # modes LN+modulate in one pass (bf16 out). The model picks the mode
    # (flux._use_fused_glue); X2I_BENCH_FUSED_GLUE=0 to disable.
    fused_glue = os.environ.get("X2I_BENCH_FUSED_GLUE", "1") == "1"
    cfg = FluxConfig(quantized=quant, guidance_embeds=guidance is not None,
                     use_pallas_attention=use_pallas,
                     rope_layout=rope_layout, fused_glue=fused_glue)
    model = FluxTransformer2D(cfg)
    grid, s_txt = px // 8, 512                  # 1024^2 -> 128x128 latents
    s_img = (grid // 2) ** 2                    # 4096 image tokens
    params = _full_size_quantized_flux_params(model, cfg, s_img, s_txt)

    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg)
    # params are input-size independent: init on a small latent (a full
    # 2048^2 init would run the decoder's mid-block attention at 65k
    # tokens just to create conv params)
    vae_params = vae.init(
        jax.random.key(0), jnp.zeros((1, min(grid, 128), min(grid, 128),
                                      vcfg.latent_channels),
                                     jnp.bfloat16), method=vae.decode)

    # dev checkpoints sample with dynamic (resolution-dependent) shifting,
    # schnell with shift=1 (diffusers FluxPipeline scheduler configs)
    if guidance is not None:
        sched = FlowMatchEulerScheduler(
            SchedulerConfig(use_dynamic_shifting=True))
        sigmas = sched.inference_sigmas(steps, image_seq_len=s_img)
    else:
        sched = FlowMatchEulerScheduler(SchedulerConfig(shift=1.0))
        sigmas = sched.inference_sigmas(steps)
    img_ids = prepare_latent_image_ids(grid, grid)
    txt_ids = jnp.zeros((s_txt, 3), jnp.float32)

    # >1536 px: denoise and the tiled VAE decode run as TWO programs —
    # one jit's combined buffer liveness at 2048^2 overruns HBM by
    # ~260 MB even though each half fits comfortably (denoise alone:
    # 3.35 GiB temp). The latent hand-off is 16 MB.
    split_vae = px > 1536

    def run_denoise(params, noise, prompt, pooled):
        # shared helper (diffusion.denoise_flux) = the pipeline's shipping
        # precomputed-mods program; env gate kept for A/Bs
        from x2i_tpu.diffusion import denoise_flux
        lat = denoise_flux(
            model, params, noise, prompt, pooled, sigmas, img_ids,
            txt_ids, guidance_scale=guidance,
            precompute_mods=os.environ.get(
                "X2I_BENCH_PRECOMPUTE_MODS", "1") != "0")
        lat = unpack_latents(lat, px, px)                  # (B, C, h, w)
        return jnp.transpose(lat, (0, 2, 3, 1))

    def run_decode(vae_params, lat_nhwc):
        decode = vae.decode_tiled if split_vae else vae.decode
        return vae.apply(vae_params, lat_nhwc, method=decode)

    def generate(params, vae_params, noise, prompt, pooled):
        return run_decode(vae_params,
                          run_denoise(params, noise, prompt, pooled))

    noise = jax.random.normal(jax.random.key(1),
                              (batch, s_img, cfg.in_channels), jnp.bfloat16)
    prompt = jax.random.normal(jax.random.key(2),
                               (batch, s_txt, cfg.joint_attention_dim),
                               jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(3),
                               (batch, cfg.pooled_projection_dim),
                               jnp.bfloat16)

    # AOT lower+compile: the runtime-JIT path through this environment's
    # compile relay is pathologically slow for 12B-scale programs; the AOT
    # path compiles the identical program in seconds.
    if split_vae:
        jden = (jax.jit(run_denoise)
                .lower(params, noise, prompt, pooled).compile())
        lat_shape = jax.eval_shape(run_denoise, params, noise, prompt,
                                   pooled)
        jdec = (jax.jit(run_decode)
                .lower(vae_params, lat_shape).compile())

        def generate(params, vae_params, noise, prompt, pooled):
            return jdec(vae_params, jden(params, noise, prompt, pooled))
    else:
        generate = (jax.jit(generate)
                    .lower(params, vae_params, noise, prompt, pooled)
                    .compile())

    out = generate(params, vae_params, noise, prompt, pooled)
    out.block_until_ready()                                 # warmup

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = generate(params, vae_params, noise, prompt, pooled)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    value = batch / dt
    print(json.dumps({
        "metric": f"{px}^2 images/sec/chip (FLUX {steps}-step + VAE, "
                  f"{quant} weights, batch {batch})",
        "value": round(value, 4),
        "unit": "img/s",
        "vs_baseline": round(value / BASELINE_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
