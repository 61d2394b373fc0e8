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
    flux_cfg = FluxConfig(quantized=quant, guidance_embeds=False,
                          remat=remat if remat == "stack" else bool(remat),
                          single_scan_chunks=chunks)
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
        # infer-pool/train-pool split, minus the NCCL hop): teacher fwd
        # emits the KD stacks, the student program consumes them. Peak HBM
        # liveness is far lower than the single fused program.
        from x2i_tpu.train.distill import (make_student_step,
                                           make_teacher_step)
        teacher_fn = make_teacher_step(
            flux.apply, lambda b: (b["t5_seq"], b["clip_pooled"]),
            lambda b: b["mllm_states"], flux_cfg, dcfg,
            emit_mllm_states=False, emit_latents=False)
        student_fn = make_student_step(
            flux.apply, proj.apply, optimizer, flux_cfg, dcfg,
            student_states_fn=lambda b: b["mllm_states"],
            regenerate_latents=True)
        t0 = time.perf_counter()
        print("compiling teacher...", flush=True)
        # Pin the teacher's outputs to default layouts so the AOT student
        # (lowered from specs, which assume default layouts) consumes them
        # directly — otherwise the hand-off needs +0.9 GB relayout copies
        # at runtime (the teacher pays a small internal relayout instead).
        from jax.experimental.layout import Format, Layout
        dev = jax.devices()[0]
        single = jax.sharding.SingleDeviceSharding(dev)
        tout_shape = jax.eval_shape(teacher_fn, flux_params, batch, key)
        out_fmts = jax.tree_util.tree_map(
            lambda s: Format(Layout(tuple(range(s.ndim))), single),
            tout_shape)
        jteacher = (jax.jit(teacher_fn, out_shardings=out_fmts)
                    .lower(flux_params, batch, key).compile())
        print("compiling student...", flush=True)
        # Constrain the student's teacher_out input formats to the same
        # default layouts the teacher was pinned to — otherwise XLA picks
        # custom input layouts, the donation becomes unusable, and the
        # un-freeable originals push runtime HBM over the edge.
        tout_spec = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, s.dtype,
                sharding=Format(Layout(tuple(range(s.ndim))), single)),
            tout_shape)
        # NOTE: lower from specs — holding a concrete teacher_out across
        # the run loop would keep an extra 0.8 GB alive at runtime.
        jstudent = (jax.jit(student_fn, donate_argnums=(0, 3))
                    .lower(state, flux_params, batch, tout_spec, key)
                    .compile())
        print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)
        for name, ex in (("teacher", jteacher), ("student", jstudent)):
            mem = ex.memory_analysis()
            if mem is not None:
                print(f"{name}: temp={mem.temp_size_in_bytes/2**30:.2f}GiB "
                      f"out={mem.output_size_in_bytes/2**30:.2f}GiB",
                      flush=True)

        # The state carry may come back from the student in a different
        # layout than it expects on input — relayout (tiny; no-op when
        # they already match).
        state_fmt = jstudent.input_formats[0][0]

        def run_step(state, key):
            teacher_out = jteacher(flux_params, batch, key)
            state = jax.device_put(state, state_fmt)
            return jstudent(state, flux_params, batch, teacher_out, key)
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
