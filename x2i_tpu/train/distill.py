"""Phase-1 attention distillation: train the proj so that FLUX attends the
same way under MLLM conditioning as under T5/CLIP conditioning.

Reference: /root/reference/train/train_minicpm.py (and its qwenvl/internvl
clones). The reference disaggregates each node into 2 "infer" GPUs (frozen
MLLM + CLIP + T5 + teacher FLUX, hooks capturing attention outs) and 6
"train" GPUs (student FLUX + proj), exchanging tensors over NCCL
gather/scatter (train_minicpm.py:663-825; core/pipeline/train_and_infer.py).

TPU-native redesign (SURVEY.md §7.1.2): teacher and student run in ONE
jitted step sharded over the ICI mesh — the frozen FLUX weights are shared
by both branches, the per-block attention outputs come out as scan ys
instead of hooks, and the cross-pool NCCL exchange disappears entirely.
Data parallel over the `data` axis; optionally FSDP-shard the frozen
weights over `fsdp`.

Semantics matched to the reference:
  * 1-step flow schedule at sigma=1.0 (pure noise latents), 128x128 latent
    grid = 4096 packed tokens, guidance 3.5 on a dev-class FLUX
    (train_minicpm.py:748-782).
  * KD loss per block: F.kl_div(log_softmax(normalize(T)/tau),
    softmax(normalize(S)/tau), 'batchmean'), tau=3, with per-term
    non-finite guard (train_minicpm.py:606-625). Gradients flow through
    the student (the kl_div *target*).
  * normalize = (x - mean)/(1e-7 + std), std unbiased (train_minicpm.py:63).
  * AdamW, grad-clip 1.0, cosine LR with warmup (train_minicpm.py:441-485).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from x2i_tpu.core.config import DistillConfig, FluxConfig
from x2i_tpu.diffusion.sampling import (pack_latents,
                                        prepare_latent_image_ids)


from x2i_tpu.ops.kd import kl_term as _kl_term  # noqa: E402
from x2i_tpu.ops.kd import normalize_logit  # noqa: F401,E402


def kd_loss(teacher_aux: Dict[str, jnp.ndarray],
            student_aux: Dict[str, jnp.ndarray],
            tau: float = 3.0, layout: str = "reference") -> jnp.ndarray:
    """Sum of per-block KL over the three KD stacks.

    layout: "reference" = (B, L, S, D) stacks (train_minicpm.py:335-337);
    "scan" = the scan-native (L, B, S, D) layout. A stack may be a
    per-chunk LIST (single_scan_chunks>1 models) — chunk lists on both
    sides must align; a lone list is summed against the matching slices of
    the flat side."""
    axis = 0 if layout == "scan" else 1

    def stacks(t, n):
        if isinstance(t, list):
            return t
        if n == 1:
            return [t]
        length = jax.tree_util.tree_leaves(t)[0].shape[axis]
        per = length // n
        return [jax.tree_util.tree_map(
            lambda x: jax.lax.slice_in_dim(x, i * per, (i + 1) * per,
                                           axis=axis), t)
            for i in range(n)]

    loss = 0.0
    for key in ("double_img", "double_txt", "single"):
        t, s = teacher_aux[key], student_aux[key]
        n = max(len(t) if isinstance(t, list) else 1,
                len(s) if isinstance(s, list) else 1)
        for tc, sc in zip(stacks(t, n), stacks(s, n)):
            terms = jax.vmap(
                lambda ti, si: _kl_term(ti, si, tau),
                in_axes=(axis, axis))(tc, sc)          # (L,)
            loss = loss + jnp.sum(terms)
    return loss


class TrainState(NamedTuple):
    params: Any                  # proj params (the only trainable leaf set)
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(dcfg: DistillConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=dcfg.learning_rate,
        warmup_steps=dcfg.lr_warmup_steps,
        decay_steps=dcfg.max_train_steps, end_value=0.0)
    if dcfg.use_8bit_adam:
        from x2i_tpu.train.optim8bit import adamw8bit
        adam = adamw8bit(schedule, b1=dcfg.adam_beta1, b2=dcfg.adam_beta2,
                         eps=dcfg.adam_epsilon,
                         weight_decay=dcfg.adam_weight_decay)
    else:
        adam = optax.adamw(schedule, b1=dcfg.adam_beta1,
                           b2=dcfg.adam_beta2, eps=dcfg.adam_epsilon,
                           weight_decay=dcfg.adam_weight_decay)
    opt = optax.chain(optax.clip_by_global_norm(dcfg.max_grad_norm), adam)
    if dcfg.gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, dcfg.gradient_accumulation_steps)
    return opt


def make_teacher_step(
        flux_apply: Callable,
        teacher_text_fn: Callable,     # (batch) -> (t5_seq, clip_pooled)
        student_states_fn: Callable,   # (batch) -> (B, C, S, H)
        flux_cfg: FluxConfig,
        dcfg: DistillConfig,
        guidance_scale: Optional[float] = 3.5,
        emit_mllm_states: bool = True,
        emit_latents: bool = True):
    """The infer-pool body (train_minicpm.py:663-825): sample the 1-step
    sigma=1 latents, run the teacher FLUX for KD stacks, export the MLLM
    hidden states. Returns teacher_fn(flux_params, batch, rng) -> dict.

    emit_mllm_states=False drops the MLLM states from the output for the
    colocated topology where the student reads them from the batch.
    emit_latents=False drops the seeded noise latents/timestep — the
    student regenerates them bit-exactly from the shared rng
    (make_student_step regenerate_latents=True), which also removes a
    transfer in the disaggregated topology (the reference ships them over
    NCCL, train_minicpm.py:812-824)."""
    h, w = dcfg.latent_height, dcfg.latent_width
    img_ids = prepare_latent_image_ids(h, w)
    txt_ids = jnp.zeros((dcfg.text_seq_len, 3), jnp.float32)
    num_lat_ch = flux_cfg.in_channels // 4

    def teacher_fn(flux_params, batch, rng):
        batch_size = jax.tree_util.tree_leaves(batch)[0].shape[0]
        latents = jax.random.normal(
            rng, (batch_size, num_lat_ch, h, w), jnp.float32)
        latents = pack_latents(latents).astype(flux_cfg.dtype)
        timestep = jnp.ones((batch_size,), jnp.float32)
        guidance = (None if not flux_cfg.guidance_embeds
                    else jnp.full((batch_size,), guidance_scale,
                                  jnp.float32))
        t5_seq, clip_pooled = teacher_text_fn(batch)
        # kd_stacks_int8 quantizes inside the scan, so the bf16 stacks
        # never materialize (ops/kd.quantize_kd_stacks docstring); the
        # scan-native aux layout skips the (B, L) transpose copies on both
        # ends of the teacher->student hand-off.
        _, teacher_aux = flux_apply(
            flux_params, latents, t5_seq, clip_pooled, timestep, img_ids,
            txt_ids, guidance, return_attn_outputs=True,
            quantize_attn_outputs=dcfg.kd_stacks_int8, aux_layout="scan")
        out = {"teacher_aux": teacher_aux}
        if emit_latents:
            out["latents"] = latents
            out["timestep"] = timestep
        if emit_mllm_states:
            out["mllm_states"] = student_states_fn(batch)
        return out

    return teacher_fn


def make_student_step(
        flux_apply: Callable,
        proj_apply: Callable,
        optimizer: optax.GradientTransformation,
        flux_cfg: FluxConfig,
        dcfg: DistillConfig,
        guidance_scale: Optional[float] = 3.5,
        student_states_fn: Optional[Callable] = None,
        regenerate_latents: bool = False):
    """The train-pool body (train_minicpm.py:372-660): proj -> student FLUX
    -> KD loss -> AdamW update. Returns
    student_fn(state, flux_params, batch, teacher_out, rng).

    student_states_fn: when given (colocated topology), the MLLM hidden
    states are read from the batch instead of riding through teacher_out —
    avoids carrying the ~100 MB/sample stack twice. In the disaggregated
    topology the states arrive from the infer pool inside teacher_out.
    regenerate_latents: recompute the seeded noise latents from the shared
    rng instead of reading teacher_out (pairs with the teacher's
    emit_latents=False)."""
    h, w = dcfg.latent_height, dcfg.latent_width
    img_ids = prepare_latent_image_ids(h, w)
    txt_ids = jnp.zeros((dcfg.text_seq_len, 3), jnp.float32)
    num_lat_ch = flux_cfg.in_channels // 4

    def student_fn(state: TrainState, flux_params, batch, teacher_out,
                   rng):
        if regenerate_latents:
            batch_size = jax.tree_util.tree_leaves(batch)[0].shape[0]
            latents = jax.random.normal(
                rng, (batch_size, num_lat_ch, h, w), jnp.float32)
            latents = pack_latents(latents).astype(flux_cfg.dtype)
            timestep = jnp.ones((batch_size,), jnp.float32)
        else:
            latents = teacher_out["latents"]
            timestep = teacher_out["timestep"]
        del rng
        teacher_aux = jax.lax.stop_gradient(teacher_out["teacher_aux"])
        if student_states_fn is not None:
            mllm_states = jax.lax.stop_gradient(student_states_fn(batch))
        else:
            mllm_states = jax.lax.stop_gradient(
                teacher_out["mllm_states"])
        del batch
        batch_size = latents.shape[0]
        guidance = (None if not flux_cfg.guidance_embeds
                    else jnp.full((batch_size,), guidance_scale,
                                  jnp.float32))

        def loss_fn(proj_params):
            pooled, seq = proj_apply(proj_params, mllm_states)
            if dcfg.inline_kd:
                _, kl = flux_apply(
                    flux_params, latents, seq.astype(flux_cfg.dtype),
                    pooled.astype(flux_cfg.dtype), timestep, img_ids,
                    txt_ids, guidance, kd_targets=teacher_aux,
                    kd_temperature=dcfg.kd_temperature,
                    aux_layout="scan")
                return kl
            _, student_aux = flux_apply(
                flux_params, latents, seq.astype(flux_cfg.dtype),
                pooled.astype(flux_cfg.dtype), timestep, img_ids, txt_ids,
                guidance, return_attn_outputs=True, aux_layout="scan")
            return kd_loss(teacher_aux, student_aux, dcfg.kd_temperature,
                           layout="scan")

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # DP mean happens automatically through sharded-batch loss; grads
        # are already the global mean under pjit.
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return student_fn


def make_distill_step(
        flux_apply: Callable,          # (params, latents, txt, pooled, t,
                                       #  img_ids, txt_ids, guidance,
                                       #  return_attn_outputs=True) -> (o, aux)
        proj_apply: Callable,          # (params, (B,C,S,H)) -> (pooled, seq)
        teacher_text_fn: Callable,     # (batch) -> (t5_seq, clip_pooled)
        student_states_fn: Callable,   # (batch) -> (B, C, S, H) mllm hiddens
        optimizer: optax.GradientTransformation,
        flux_cfg: FluxConfig,
        dcfg: DistillConfig,
        guidance_scale: Optional[float] = 3.5):
    """The default colocated step: teacher + student in ONE jitted program
    (SURVEY.md §7.1.2). For the reference's disaggregated-pool topology use
    the two halves with parallel.disaggregated.DisaggregatedDistill.

    Returned signature:
      step_fn(state, flux_params, batch, rng) -> (state, metrics).
    """
    teacher_fn = make_teacher_step(flux_apply, teacher_text_fn,
                                   student_states_fn, flux_cfg, dcfg,
                                   guidance_scale)
    student_fn = make_student_step(flux_apply, proj_apply, optimizer,
                                   flux_cfg, dcfg, guidance_scale)

    def step_fn(state: TrainState, flux_params, batch, rng):
        teacher_out = teacher_fn(flux_params, batch, rng)
        return student_fn(state, flux_params, batch, teacher_out, rng)

    return step_fn
