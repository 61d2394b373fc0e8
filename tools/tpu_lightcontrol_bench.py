#!/usr/bin/env python
"""Hardware benchmark of the full-size phase-2 LightControl step on one chip.

Runs the reference phase-2 operating point (lightcontrol/train_lightcontrol.sh:
batch 1/device, 1024^2 style targets -> 128x128 latents -> 4096 image tokens,
512 text tokens) as ONE jitted step on a single v5e: VAE-encode the target,
logit-normal flow-matching noising, 19 full-size ControlNeXt branches forward,
frozen int8 12B FLUX forward + backward (gradients reach only the controls),
clip + AdamW on the ~95M control params.

The frozen Qwen7B+proj conditioning forward is replaced by precomputed random
embeddings — in the reference that encoder is frozen and shared across the
ZeRO-2 group (train_lightcontrol.py:717-724); here it would also be served
from a second chip in a pod setting. Env knobs: X2I_LCBENCH_QUANT (w8|w8a8),
X2I_LCBENCH_GRID (latent grid, default 128), X2I_LCBENCH_ACCUM (default 1).

The reference runs this step on 8x A100 ZeRO-2 with CPU param/optimizer
offload (lightcontrol/accelerate_config_debug.yaml) — no public step time
exists; the number recorded here is the single-chip capability datapoint.

Measured 2026-08-18 (v5e, w8a8 frozen DiT, fp8-moment Adam, batch 1):
  1024^2 (the reference operating point): 2732 ms/step (0.366 steps/s;
      2026-08-19, with the (BK, Sq)-reoriented dkv backward — was 2869),
      temp 4.38 GiB + args 11.58 GiB (state donated), split-VAE mode.
  512^2: 683 ms/step (1.47 steps/s), one fused program.
Loss decreases from step 0 in both configs. What it took to fit 1024^2:
sequential+remat control branches (apply_control_bank impl="scan" — the
vmapped bank's jointly-live stem activations are 19 x 2.4 GiB temps and
the compile OOMs at 22.09 GiB), the VAE encoder as its own program, fp8
Adam moments, and a ONE-TIME device_put of the donated state onto the
executable's input formats (see the InvalidArgument note in the module
this was debugged into: runtime-jit-init'd buffers carry layouts AOT
executables reject for donated args).
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

    from x2i_tpu.core.config import (ControlNeXtConfig, FluxConfig,
                                     LightControlConfig, SchedulerConfig,
                                     VAEConfig)
    from x2i_tpu.models.controlnext import init_control_bank
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.vae import AutoencoderKL
    from x2i_tpu.train.lightcontrol import (ControlTrainState,
                                            make_lightcontrol_optimizer,
                                            make_lightcontrol_step)
    from __graft_entry__ import _full_size_quantized_flux_params

    quant = os.environ.get("X2I_LCBENCH_QUANT", "w8a8")
    grid = int(os.environ.get("X2I_LCBENCH_GRID", "128"))
    accum = int(os.environ.get("X2I_LCBENCH_ACCUM", "1"))
    px = grid * 8
    s_txt = 512
    s_img = (grid // 2) ** 2
    print(f"backend: {jax.default_backend()}  quant={quant} "
          f"target={px}x{px} ({s_img} img tokens)  accum={accum}",
          flush=True)

    # Same memory posture as the phase-1 trainbench: stack remat, chunked
    # single scan, rope outside the kernel (its backward transients tip the
    # 12B step over HBM). guidance_embeds off: the guidance MLP adds ~0
    # FLOPs and the pattern-param helper builds ungided inits.
    flux_cfg = FluxConfig(quantized=quant, guidance_embeds=False,
                          remat="stack", single_scan_chunks=2,
                          rope_in_kernel=False)
    flux = FluxTransformer2D(flux_cfg)
    eval_only = os.environ.get("X2I_LCBENCH_EVAL_SHAPE") == "1"
    if eval_only:
        # wiring check: abstract params are enough for jax.eval_shape
        from x2i_tpu.diffusion import prepare_latent_image_ids
        flux_params = jax.eval_shape(lambda: flux.init(
            jax.random.key(0),
            jnp.zeros((1, s_img, flux_cfg.in_channels), flux_cfg.dtype),
            jnp.zeros((1, s_txt, flux_cfg.joint_attention_dim),
                      flux_cfg.dtype),
            jnp.zeros((1, flux_cfg.pooled_projection_dim), flux_cfg.dtype),
            jnp.zeros((1,), jnp.float32),
            prepare_latent_image_ids(grid, grid),
            jnp.zeros((s_txt, 3), jnp.float32)))
    else:
        flux_params = _full_size_quantized_flux_params(flux, flux_cfg,
                                                       s_img, s_txt)

    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((1, px, px, 3)) * 0.4,
                         jnp.bfloat16)
    vae_params = vae.init(jax.random.key(0),
                          jnp.zeros((1, 256, 256, 3), jnp.bfloat16))

    ctrl_cfg = ControlNeXtConfig()
    use_8bit = os.environ.get("X2I_LCBENCH_8BIT", "1") == "1"
    ccfg = LightControlConfig(gradient_accumulation_steps=accum,
                              use_8bit_adam=use_8bit)
    bank = init_control_bank(ctrl_cfg, ccfg.num_controls, jax.random.key(1),
                             image_size=256)
    n_ctrl = sum(x.size for x in jax.tree_util.tree_leaves(bank))
    print(f"control bank: {ccfg.num_controls} branches, "
          f"{n_ctrl/1e6:.1f}M params", flush=True)

    prompt = jnp.asarray(
        rng.standard_normal((1, s_txt, flux_cfg.joint_attention_dim)) * 0.05,
        jnp.bfloat16)
    pooled = jnp.asarray(
        rng.standard_normal((1, flux_cfg.pooled_projection_dim)) * 0.05,
        jnp.bfloat16)

    def conditioning_fn(batch):
        return pooled, prompt

    def vae_encode(pix, r):
        return vae.apply(vae_params, pix, r, method=vae.encode)

    # split the VAE encoder into its own program at the 1024^2 point: its
    # full-res conv buffers co-resident with the DiT backward overrun HBM
    split_vae = os.environ.get(
        "X2I_LCBENCH_SPLIT_VAE", "1" if grid >= 128 else "0") == "1"

    optimizer = make_lightcontrol_optimizer(ccfg)
    step_fn = make_lightcontrol_step(
        flux.apply, None if split_vae else vae_encode, conditioning_fn,
        ctrl_cfg, flux_cfg, ccfg, SchedulerConfig(shift=3.0), optimizer,
        guidance_scale=None)
    state = ControlTrainState(bank, optimizer.init(bank),
                              jnp.zeros((), jnp.int32))
    batch = {"style_pixels": pixels}
    jenc = None
    if split_vae and eval_only:
        batch["latents"] = jax.eval_shape(vae_encode, pixels,
                                          jax.random.key(9))
    elif split_vae:
        jenc = (jax.jit(vae_encode)
                .lower(pixels, jax.random.key(9)).compile())
        batch["latents"] = jenc(pixels, jax.random.key(9))

    if eval_only:
        # wiring check only: trace the full-size step without compiling
        out = jax.eval_shape(step_fn, state, flux_params, batch,
                             jax.random.key(2))
        print("eval_shape ok:",
              jax.tree_util.tree_map(lambda x: x.shape, out[1]), flush=True)
        return

    donate = os.environ.get("X2I_LCBENCH_DONATE", "1") == "1"
    t0 = time.perf_counter()
    jstep = (jax.jit(step_fn, donate_argnums=(0,) if donate else ())
             .lower(state, flux_params, batch, jax.random.key(2)).compile())
    print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)
    mem = jstep.memory_analysis()
    if mem is not None:
        temp = mem.temp_size_in_bytes / 2**30
        args = mem.argument_size_in_bytes / 2**30
        # a donated state (donate_argnums=0) aliases its output, so it
        # must not be double-counted against the budget
        donated = (sum(x.size * x.dtype.itemsize
                       for x in jax.tree_util.tree_leaves(state)) / 2**30
                   if donate else 0.0)
        print(f"temp={temp:.2f}GiB args={args:.2f}GiB "
              f"(donated {donated:.2f}GiB)", flush=True)
        # a runtime RESOURCE_EXHAUSTED crash can wedge the TPU relay —
        # bail while the failure is still clean
        if temp + args - donated > 15.5:
            print("over the 15.75 GiB HBM budget — not executing",
                  flush=True)
            sys.exit(3)

    # AOT executables are strict about input layouts, and the donated
    # state was materialized by runtime-jit init with its own layouts —
    # relay it to the executable's expected format ONCE (donated outputs
    # alias the relaid buffers, so later steps keep the layout; relaying
    # inside the loop would hold two state copies and tip HBM at 1024^2)
    state = jax.device_put(state, jstep.input_formats[0][0])

    def run_step(state, key):
        if jenc is not None:       # encoder program + train program
            batch["latents"] = jenc(batch["style_pixels"], key)
        return jstep(state, flux_params, batch, key)

    state, metrics = run_step(state, jax.random.key(2))
    jax.block_until_ready(state)
    print(f"step0 loss={float(metrics['loss']):.4f} "
          f"grad_norm={float(metrics['grad_norm']):.4f}", flush=True)
    assert np.isfinite(float(metrics["loss"]))

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = run_step(state, jax.random.key(3 + i))
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    print(f"lightcontrol step: {dt*1e3:.0f} ms  ({1.0/dt:.3f} steps/s/chip)"
          f"  loss={float(metrics['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
