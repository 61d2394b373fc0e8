"""Single-chip full-size phase-1 training: split teacher/student programs.

The colocated step (distill.make_distill_step) traces teacher and student
into ONE program — the right shape for a pod slice, but at full size on a
single 16 GB chip the combined liveness does not fit. This module compiles
the two halves as SEPARATE AOT executables run back-to-back on one chip:
peak HBM is max(teacher, student) instead of their union, which is what
lets the 12B model train at the reference's 128x128-latent operating point
(train_minicpm.py:553-555) on one v5e (the reference uses 8x A100-80GB,
train_minicpm.py:843).

Used with the slim hand-off (teacher ships only the KD stacks; the student
regenerates the seeded latents from the shared rng and reads MLLM states
from the batch) and, at full size, FluxConfig(remat="stack",
single_scan_chunks=2, quantized="w8a8") + DistillConfig(inline_kd=True,
kd_stacks_int8=True, use_8bit_adam=True).

AOT notes (this is why the module exists instead of two jax.jit calls):
runtime-jit dispatch of 12B programs is pathologically slow in some
environments, and AOT-compiled executables are strict about input layouts.
The teacher's outputs are pinned to default layouts and the student is
lowered against matching specs, so the hand-off needs no relayout copies;
the state carry is relaid per step (tiny, no-op once layouts converge).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax

from x2i_tpu.core.config import DistillConfig, FluxConfig
from x2i_tpu.train.distill import (TrainState, make_student_step,
                                   make_teacher_step)


def compile_single_chip_distill(
        flux_apply: Callable,
        proj_apply: Callable,
        teacher_text_fn: Callable,
        student_states_fn: Callable,
        optimizer,
        flux_cfg: FluxConfig,
        dcfg: DistillConfig,
        state: TrainState,
        flux_params,
        example_batch,
        key,
        guidance_scale: Optional[float] = 3.5,
        donate_state: bool = True):
    """AOT-compile the split topology for one chip.

    Returns (run_step, jteacher, jstudent) where
    run_step(state, flux_params, batch, key) -> (state, metrics) executes
    teacher then student. flux_params/batch shapes must match
    example_batch; state is relaid to the student's expected layout each
    call (no-op when it already matches).
    """
    from jax.experimental.layout import Format, Layout

    teacher_fn = make_teacher_step(
        flux_apply, teacher_text_fn, student_states_fn, flux_cfg, dcfg,
        guidance_scale, emit_mllm_states=False, emit_latents=False)
    student_fn = make_student_step(
        flux_apply, proj_apply, optimizer, flux_cfg, dcfg, guidance_scale,
        student_states_fn=student_states_fn, regenerate_latents=True)

    dev = jax.devices()[0]
    single = jax.sharding.SingleDeviceSharding(dev)

    def default_fmt(s):
        return Format(Layout(tuple(range(s.ndim))), single)

    # Pin the teacher's outputs and the student's matching inputs to
    # default layouts so the KD-stack hand-off is copy-free.
    tout_shape = jax.eval_shape(teacher_fn, flux_params, example_batch,
                                key)
    out_fmts = jax.tree_util.tree_map(default_fmt, tout_shape)
    jteacher = (jax.jit(teacher_fn, out_shardings=out_fmts)
                .lower(flux_params, example_batch, key).compile())

    tout_spec = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                       sharding=default_fmt(s)),
        tout_shape)
    donate = (0, 3) if donate_state else (3,)
    jstudent = (jax.jit(student_fn, donate_argnums=donate)
                .lower(state, flux_params, example_batch, tout_spec, key)
                .compile())
    state_fmt = jstudent.input_formats[0][0]

    def run_step(state: TrainState, flux_params, batch, key):
        teacher_out = jteacher(flux_params, batch, key)
        state = jax.device_put(state, state_fmt)
        return jstudent(state, flux_params, batch, teacher_out, key)

    return run_step, jteacher, jstudent
