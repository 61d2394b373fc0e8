"""Miniature end-to-end distillation harness.

Builds the full phase-1 trainer wiring (tiny FLUX + Qwen2 + T5 + CLIP +
proj) at test scale. Used by tests/ and by __graft_entry__.dryrun_multichip
to validate the sharded training step on a virtual device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import (DistillConfig, FluxConfig, ProjConfig,
                                 Qwen2Config, tiny_flux_config,
                                 tiny_qwen2_config)
from x2i_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from x2i_tpu.models.flux import FluxTransformer2D
from x2i_tpu.models.proj import Proj
from x2i_tpu.models.qwen2 import Qwen2LM
from x2i_tpu.models.t5 import T5Config, T5Encoder
from x2i_tpu.train.distill import (TrainState, make_distill_step,
                                   make_optimizer, make_student_step,
                                   make_teacher_step)


def build_tiny_distill(batch_size: int = 8, remat: bool = False,
                       split: bool = False, use_8bit_adam: bool = False,
                       slim_handoff: bool = False):
    """Returns (step_fn, state, flux_params, batch); with split=True the
    first element is (teacher_fn, student_fn) for the disaggregated-pool
    topology instead of the colocated step. slim_handoff (split only)
    ships ONLY the KD stacks: the student regenerates the seeded latents
    from the rng and reads the MLLM states from the batch."""
    flux_cfg = tiny_flux_config(guidance_embeds=True, remat=remat)
    lm_cfg = tiny_qwen2_config()
    t5_cfg = T5Config(vocab_size=64, d_model=32, d_kv=8, d_ff=64,
                      num_layers=1, num_heads=4, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    clip_cfg = CLIPTextConfig(
        vocab_size=64, hidden_size=flux_cfg.pooled_projection_dim,
        intermediate_size=64, num_hidden_layers=1, num_attention_heads=4,
        max_position_embeddings=16, eos_token_id=63, dtype=jnp.float32,
        param_dtype=jnp.float32)
    proj_cfg = ProjConfig(in_channels=lm_cfg.num_layers_with_embedding,
                          input_dim=lm_cfg.hidden_size,
                          output_dim0=flux_cfg.pooled_projection_dim,
                          output_dim1=flux_cfg.joint_attention_dim,
                          dtype=jnp.float32, param_dtype=jnp.float32)
    dcfg = DistillConfig(latent_height=8, latent_width=8, text_seq_len=12,
                         lr_warmup_steps=1, max_train_steps=100,
                         learning_rate=1e-3, use_8bit_adam=use_8bit_adam)

    flux = FluxTransformer2D(flux_cfg)
    lm = Qwen2LM(lm_cfg)
    t5 = T5Encoder(t5_cfg)
    clip = CLIPTextEncoder(clip_cfg)
    proj = Proj(proj_cfg)

    B, S = batch_size, dcfg.text_seq_len
    rng = np.random.default_rng(0)
    batch = {
        "t5_ids": jnp.asarray(rng.integers(0, 64, (B, S))),
        "t5_mask": jnp.ones((B, S), bool),
        "clip_ids": jnp.asarray(rng.integers(0, 63, (B, S))),
        "mllm_ids": jnp.asarray(rng.integers(0, lm_cfg.vocab_size, (B, S))),
        "mllm_mask": jnp.ones((B, S), bool),
    }

    key = jax.random.key(0)
    s_img = (dcfg.latent_height // 2) * (dcfg.latent_width // 2)
    flux_params = flux.init(
        key, jnp.zeros((1, s_img, flux_cfg.in_channels)),
        jnp.zeros((1, S, flux_cfg.joint_attention_dim)),
        jnp.zeros((1, flux_cfg.pooled_projection_dim)), jnp.zeros((1,)),
        jnp.zeros((s_img, 3)), jnp.zeros((S, 3)), guidance=jnp.ones((1,)))
    t5_params = t5.init(key, batch["t5_ids"][:1])
    clip_params = clip.init(key, batch["clip_ids"][:1])
    lm_params = lm.init(key, batch["mllm_ids"][:1])
    dummy_states, _ = lm.apply(lm_params, batch["mllm_ids"][:1])
    proj_params = proj.init(key, dummy_states)

    # widen tiny T5 output to the flux joint dim (full-size T5-XXL already
    # matches 4096; the tiny stand-in needs a fixed projection)
    widen = jnp.asarray(rng.standard_normal(
        (t5_cfg.d_model, flux_cfg.joint_attention_dim)), jnp.float32) * 0.1

    def teacher_text_fn(b):
        seq = t5.apply(t5_params, b["t5_ids"], b["t5_mask"]) @ widen
        _, pooled = clip.apply(clip_params, b["clip_ids"])
        return seq, pooled

    def student_states_fn(b):
        states, _ = lm.apply(lm_params, b["mllm_ids"], b["mllm_mask"])
        return states

    optimizer = make_optimizer(dcfg)
    state = TrainState(proj_params, optimizer.init(proj_params),
                       jnp.zeros((), jnp.int32))
    build_tiny_distill.last_parts = {
        "flux_apply": flux.apply, "proj_apply": proj.apply,
        "teacher_text_fn": teacher_text_fn,
        "student_states_fn": student_states_fn, "optimizer": optimizer,
        "flux_cfg": flux_cfg, "dcfg": dcfg,
    }
    if split:
        teacher_fn = make_teacher_step(
            flux.apply, teacher_text_fn, student_states_fn, flux_cfg, dcfg,
            emit_mllm_states=not slim_handoff,
            emit_latents=not slim_handoff)
        student_fn = make_student_step(
            flux.apply, proj.apply, optimizer, flux_cfg, dcfg,
            student_states_fn=student_states_fn if slim_handoff else None,
            regenerate_latents=slim_handoff)
        return (teacher_fn, student_fn), state, flux_params, batch
    step_fn = make_distill_step(flux.apply, proj.apply, teacher_text_fn,
                                student_states_fn, optimizer, flux_cfg, dcfg)
    return step_fn, state, flux_params, batch


def build_tiny_lightcontrol(batch_size: int = 8):
    """Phase-2 analogue of build_tiny_distill: tiny VAE (/8 like the real
    one so control tokens == packed latent tokens) + tiny control bank +
    tiny FLUX with control injection. Returns (step_fn, state,
    flux_params, batch); batch is DP-shardable on its leading axis."""
    from x2i_tpu.core.config import (ControlNeXtConfig, LightControlConfig,
                                     SchedulerConfig, VAEConfig)
    from x2i_tpu.models.controlnext import init_control_bank
    from x2i_tpu.models.vae import AutoencoderKL
    from x2i_tpu.train.lightcontrol import (ControlTrainState,
                                            make_lightcontrol_optimizer,
                                            make_lightcontrol_step)

    flux_cfg = tiny_flux_config(guidance_embeds=True, in_channels=16)
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                        latent_channels=4, norm_num_groups=4,
                        dtype=jnp.float32, param_dtype=jnp.float32)
    ctrl_cfg = ControlNeXtConfig(in_channels=(8, 8), out_channels=(8, 16),
                                 groups=(2, 2), time_embed_dim=16,
                                 final_out_channels=flux_cfg.inner_dim,
                                 dtype=jnp.float32, param_dtype=jnp.float32)
    ccfg = LightControlConfig(gradient_accumulation_steps=1,
                              learning_rate=1e-3)

    PX, B, S = 32, batch_size, 8    # 32px -> 4 latent-packed tokens
    flux = FluxTransformer2D(flux_cfg)
    vae = AutoencoderKL(vae_cfg)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    pixels = jnp.asarray(rng.standard_normal((B, PX, PX, 3)), jnp.float32)
    vae_params = vae.init(key, pixels[:1])

    s_img = (PX // 16) ** 2
    flux_params = flux.init(
        key, jnp.zeros((1, s_img, flux_cfg.in_channels)),
        jnp.zeros((1, S, flux_cfg.joint_attention_dim)),
        jnp.zeros((1, flux_cfg.pooled_projection_dim)), jnp.zeros((1,)),
        jnp.zeros((s_img, 3)), jnp.zeros((S, 3)), guidance=jnp.ones((1,)),
        controls=jnp.zeros((flux_cfg.num_layers, 1, s_img,
                            flux_cfg.inner_dim)))
    bank = init_control_bank(ctrl_cfg, flux_cfg.num_layers, key,
                             image_size=PX)

    prompt = jnp.asarray(
        rng.standard_normal((B, S, flux_cfg.joint_attention_dim)),
        jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, flux_cfg.pooled_projection_dim)),
        jnp.float32)
    batch = {"style_pixels": pixels, "prompt": prompt, "pooled": pooled}

    def conditioning_fn(b):
        return b["pooled"], b["prompt"]

    def vae_encode(pix, r):
        return vae.apply(vae_params, pix, r, method=vae.encode)

    optimizer = make_lightcontrol_optimizer(ccfg)
    step_fn = make_lightcontrol_step(
        flux.apply, vae_encode, conditioning_fn, ctrl_cfg, flux_cfg, ccfg,
        SchedulerConfig(shift=3.0), optimizer)
    state = ControlTrainState(bank, optimizer.init(bank),
                              jnp.zeros((), jnp.int32))
    return step_fn, state, flux_params, batch


def _pattern_tree(shapes):
    """Deterministic host-built stand-in weights from an eval_shape tree:
    norm scales -> 1, biases -> 0, kernels/embeddings -> a cyclic
    zero-mean pattern scaled by 1/sqrt(fan_in). Keeps every activation
    finite without paying traced-init compiles at midsize dims."""
    base = ((np.arange(997, dtype=np.float64) * 131) % 997 - 498.0) / 498.0

    def make(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name == "scale" or (leaf.ndim == 1 and name not in
                               ("bias", "embedding")):
            return jnp.ones(leaf.shape, leaf.dtype)
        if name == "bias" or leaf.ndim == 0:
            return jnp.zeros(leaf.shape, leaf.dtype)
        fan = leaf.shape[-2] if leaf.ndim >= 2 else leaf.shape[-1]
        arr = np.resize(base, leaf.shape) / np.sqrt(fan)
        return jnp.asarray(arr, leaf.dtype)

    return jax.tree_util.tree_map_with_path(make, shapes)


def build_midsize_distill(batch_size: int = 8, grid: int = 64):
    """Realistic-dims distillation step with reduced depth: every tensor
    dimension the sharding math touches is the REAL operating point —
    DiT hidden 3072 (24 heads x 128), joint text width 4096, pooled 768,
    Qwen2.5-7B widths (3584 hidden / 18944 ffn / 28:4 GQA), T5-XXL width
    4096, CLIP-L pooled 768, text 512 tokens, `grid`^2/4 packed image
    tokens — only the layer counts (1 double + 2 single; 2 LM layers) and
    vocab sizes are cut so the step executes on a virtual CPU mesh.
    Catches dims/divisibility/sharding-spec bugs that AOT lowering of the
    full-size program (tests/test_fullsize_sharding.py) cannot.

    Returns (step_fn, state, flux_params, batch) like build_tiny_distill.
    """
    flux_cfg = FluxConfig(
        num_layers=1, num_single_layers=2, guidance_embeds=True,
        dtype=jnp.float32, param_dtype=jnp.float32,
        use_pallas_attention=False)
    # teachers/encoder keep every width the sharding or proj touches
    # (hidden sizes, head geometry); ffn widths and vocabs are slimmed —
    # they live in REPLICATED closures, so they exercise no sharding math
    lm_cfg = Qwen2Config(
        vocab_size=4096, hidden_size=3584, intermediate_size=8192,
        num_hidden_layers=2, num_attention_heads=28,
        num_key_value_heads=4, head_dim=128, dtype=jnp.float32,
        param_dtype=jnp.float32)
    t5_cfg = T5Config(vocab_size=512, d_model=4096, d_kv=64, d_ff=2048,
                      num_layers=1, num_heads=32, dtype=jnp.float32,
                      param_dtype=jnp.float32)
    clip_cfg = CLIPTextConfig(
        vocab_size=512, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=1, num_attention_heads=12,
        max_position_embeddings=77, eos_token_id=511, dtype=jnp.float32,
        param_dtype=jnp.float32)
    proj_cfg = ProjConfig(in_channels=lm_cfg.num_layers_with_embedding,
                          input_dim=lm_cfg.hidden_size,
                          output_dim0=flux_cfg.pooled_projection_dim,
                          output_dim1=flux_cfg.joint_attention_dim,
                          dtype=jnp.float32, param_dtype=jnp.float32)
    dcfg = DistillConfig(latent_height=grid, latent_width=grid,
                         text_seq_len=512, lr_warmup_steps=1,
                         max_train_steps=100, learning_rate=1e-4)

    flux = FluxTransformer2D(flux_cfg)
    lm = Qwen2LM(lm_cfg)
    t5 = T5Encoder(t5_cfg)
    clip = CLIPTextEncoder(clip_cfg)
    proj = Proj(proj_cfg)

    B, S = batch_size, dcfg.text_seq_len
    rng = np.random.default_rng(0)
    batch = {
        "t5_ids": jnp.asarray(rng.integers(0, t5_cfg.vocab_size, (B, S))),
        "t5_mask": jnp.ones((B, S), bool),
        "clip_ids": jnp.asarray(rng.integers(0, 511, (B, 77))),
        "mllm_ids": jnp.asarray(
            rng.integers(0, lm_cfg.vocab_size, (B, S))),
        "mllm_mask": jnp.ones((B, S), bool),
    }

    # eval_shape inits + host-side pattern weights: running the traced
    # init forwards at these dims costs minutes on a single-core virtual
    # mesh and validates nothing — the step itself is the test
    key = jax.random.key(0)
    s_img = (grid // 2) ** 2
    flux_params = _pattern_tree(jax.eval_shape(
        lambda: flux.init(
            key, jnp.zeros((1, s_img, flux_cfg.in_channels)),
            jnp.zeros((1, S, flux_cfg.joint_attention_dim)),
            jnp.zeros((1, flux_cfg.pooled_projection_dim)),
            jnp.zeros((1,)), jnp.zeros((s_img, 3)), jnp.zeros((S, 3)),
            guidance=jnp.ones((1,)))))
    t5_params = _pattern_tree(jax.eval_shape(
        lambda: t5.init(key, batch["t5_ids"][:1])))
    clip_params = _pattern_tree(jax.eval_shape(
        lambda: clip.init(key, batch["clip_ids"][:1])))
    lm_params = _pattern_tree(jax.eval_shape(
        lambda: lm.init(key, batch["mllm_ids"][:1])))
    proj_params = _pattern_tree(jax.eval_shape(
        lambda: proj.init(key, jnp.zeros(
            (1, proj_cfg.in_channels, S, proj_cfg.input_dim)))))

    def teacher_text_fn(b):
        # T5-XXL's d_model already equals the FLUX joint width: no widen
        seq = t5.apply(t5_params, b["t5_ids"], b["t5_mask"])
        _, pooled = clip.apply(clip_params, b["clip_ids"])
        return seq, pooled

    def student_states_fn(b):
        states, _ = lm.apply(lm_params, b["mllm_ids"], b["mllm_mask"])
        return states

    optimizer = make_optimizer(dcfg)
    state = TrainState(proj_params, optimizer.init(proj_params),
                       jnp.zeros((), jnp.int32))
    step_fn = make_distill_step(flux.apply, proj.apply, teacher_text_fn,
                                student_states_fn, optimizer, flux_cfg,
                                dcfg)
    return step_fn, state, flux_params, batch
