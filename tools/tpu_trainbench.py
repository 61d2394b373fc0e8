#!/usr/bin/env python
"""Hardware benchmark of the full-size phase-1 distillation step on one chip.

Runs the colocated training step (SURVEY §7.1.2) at the reference operating
point — 128x128 latent grid (4096 img tokens), 512 text tokens, batch 1
(train/train_minicpm.sh:8) — with the 12B FLUX quantized int8 and remat'd
scan blocks: teacher FLUX forward (KD aux), proj forward, student FLUX
forward+backward with inline KD, AdamW update on the proj.

The MLLM/T5/CLIP encoder forwards are replaced by precomputed random
tensors: in the reference those run on separate "infer" GPUs
(train_minicpm.py:663-825), so this measures exactly the train-rank step
plus the colocated teacher-FLUX forward. Env knobs: X2I_TRAINBENCH_QUANT
(w8|w8a8), X2I_TRAINBENCH_GRID (default 128), X2I_TRAINBENCH_8BIT=1.
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

    from x2i_tpu.core.config import DistillConfig, FluxConfig, ProjConfig
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.proj import Proj
    from x2i_tpu.train.distill import (TrainState, make_distill_step,
                                       make_optimizer)
    from __graft_entry__ import _full_size_quantized_flux_params

    quant = os.environ.get("X2I_TRAINBENCH_QUANT", "w8a8")
    grid = int(os.environ.get("X2I_TRAINBENCH_GRID", "128"))
    use_8bit = os.environ.get("X2I_TRAINBENCH_8BIT", "1") == "1"
    remat = os.environ.get("X2I_TRAINBENCH_REMAT", "stack")
    print(f"backend: {jax.default_backend()}  quant={quant} grid={grid}x{grid}"
          f" 8bit_adam={use_8bit} remat={remat}", flush=True)

    chunks = int(os.environ.get("X2I_TRAINBENCH_CHUNKS", "2"))
    # rope placement for training: the fused backward can counter-rotate
    # in-kernel (X2I_TRAINBENCH_ROPE_KERNEL=1), but at this operating
    # point it measures a net LOSS — 2.498 vs 2.420 s/step (2026-08-19,
    # same session): the rope path must halve block_q/block_k to fit
    # scoped VMEM, and under remat="stack" the XLA rotate transients are
    # per-chunk (~10 MB temp delta), so there is little to reclaim. The
    # XLA rotation stays the training default.
    rope_in_kernel = os.environ.get("X2I_TRAINBENCH_ROPE_KERNEL",
                                    "0") == "1"
    flux_cfg = FluxConfig(quantized=quant, guidance_embeds=False,
                          remat=remat if remat == "stack" else bool(remat),
                          single_scan_chunks=chunks,
                          rope_in_kernel=rope_in_kernel)
    flux = FluxTransformer2D(flux_cfg)
    s_txt = 512
    s_img = (grid // 2) ** 2
    flux_params = _full_size_quantized_flux_params(flux, flux_cfg, s_img,
                                                   s_txt)

    # MiniCPM-o proj scale (SURVEY §2.2: 29 layers, hidden 3584)
    proj_cfg = ProjConfig(in_channels=29, input_dim=3584)
    proj = Proj(proj_cfg)
    rng = np.random.default_rng(0)
    mllm_states = jnp.asarray(
        rng.standard_normal((1, 29, s_txt, 3584)) * 0.05, jnp.bfloat16)
    proj_params = proj.init(jax.random.key(0), mllm_states)

    dcfg = DistillConfig(latent_height=grid, latent_width=grid,
                         inline_kd=True, use_8bit_adam=use_8bit,
                         kd_stacks_int8=os.environ.get(
                             "X2I_TRAINBENCH_KD8", "1") == "1")
    optimizer = make_optimizer(dcfg)
    state = TrainState(proj_params, optimizer.init(proj_params),
                       jnp.zeros((), jnp.int32))

    batch = {
        "t5_seq": jnp.asarray(
            rng.standard_normal((1, s_txt, flux_cfg.joint_attention_dim))
            * 0.05, jnp.bfloat16),
        "clip_pooled": jnp.asarray(
            rng.standard_normal((1, flux_cfg.pooled_projection_dim)) * 0.05,
            jnp.bfloat16),
        "mllm_states": mllm_states,
    }
    split = os.environ.get("X2I_TRAINBENCH_SPLIT", "1") == "1"
    key = jax.random.key(1)
    if split:
        # Two sequential programs on one chip (the reference's
        # infer-pool/train-pool split, minus the NCCL hop): see
        # x2i_tpu/train/single_chip.py.
        from x2i_tpu.train.single_chip import compile_single_chip_distill
        t0 = time.perf_counter()
        print("compiling teacher+student...", flush=True)
        step, jteacher, jstudent = compile_single_chip_distill(
            flux.apply, proj.apply,
            lambda b: (b["t5_seq"], b["clip_pooled"]),
            lambda b: b["mllm_states"], optimizer, flux_cfg, dcfg,
            state, flux_params, batch, key)
        print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)
        for name, ex in (("teacher", jteacher), ("student", jstudent)):
            mem = ex.memory_analysis()
            if mem is not None:
                print(f"{name}: temp={mem.temp_size_in_bytes/2**30:.2f}GiB "
                      f"out={mem.output_size_in_bytes/2**30:.2f}GiB",
                      flush=True)

        def run_step(state, key):
            return step(state, flux_params, batch, key)
    else:
        step_fn = make_distill_step(
            flux.apply, proj.apply,
            lambda b: (b["t5_seq"], b["clip_pooled"]),
            lambda b: b["mllm_states"],
            optimizer, flux_cfg, dcfg)
        t0 = time.perf_counter()
        jstep = (jax.jit(step_fn, donate_argnums=0)
                 .lower(state, flux_params, batch, key).compile())
        print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)
        mem = jstep.memory_analysis()
        if mem is not None:
            print(f"temp={mem.temp_size_in_bytes/2**30:.2f}GiB "
                  f"args={mem.argument_size_in_bytes/2**30:.2f}GiB",
                  flush=True)

        def run_step(state, key):
            return jstep(state, flux_params, batch, key)

    state, metrics = run_step(state, key)
    jax.block_until_ready(state)
    print(f"step0 loss={float(metrics['loss']):.4f} "
          f"grad_norm={float(metrics['grad_norm']):.4f}", flush=True)
    assert np.isfinite(float(metrics["loss"]))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = run_step(state, key)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt*1e3:.0f} ms  ({1.0/dt:.3f} steps/s/chip)  "
          f"loss={float(metrics['loss']):.4f}", flush=True)


if __name__ == "__main__":
    main()
