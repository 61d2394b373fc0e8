"""Typed configuration system.

The reference scatters its config across argparse flags and hardcoded
constants (SURVEY.md §5.6, e.g. /root/reference/train/train_minicpm.py:68-187,
843,859-860). Here every pipeline is described by frozen dataclasses and a
model registry, so nothing is hardcoded in the compute path.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class FluxConfig:
    """FLUX-class rectified-flow DiT.

    Mirrors the architecture instantiated by the reference's vendored copy
    (/root/reference/lightcontrol/lightcontrol_flux.py:229-284): 19 double
    (MMDiT) blocks + 38 single blocks, 24 heads x 128, 3-axis RoPE.
    """

    patch_size: int = 1
    in_channels: int = 64            # packed latents: 16 ch x 2x2 patch
    num_layers: int = 19             # double-stream (MMDiT) blocks
    num_single_layers: int = 38      # single-stream blocks
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096  # text conditioning width
    pooled_projection_dim: int = 768
    guidance_embeds: bool = False    # True for FLUX.1-dev, False for schnell
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    mlp_ratio: float = 4.0
    time_embed_dim: int = 256
    qk_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16        # activation/computation dtype
    param_dtype: Any = jnp.bfloat16  # parameter storage dtype
    remat: Any = False               # False | True (checkpoint each block) |
                                     # "stack" (also checkpoint each whole
                                     # scan: carries become ephemeral in bwd)
    single_scan_chunks: int = 1      # >1 (divides num_single_layers): nest
                                     # the single-block scan as chunks x per
                                     # with remat per chunk (sqrt-
                                     # checkpointing of the 38-deep stack;
                                     # params reshape to (chunks, per, ...))
    use_pallas_attention: bool = True
    ring_sequence: bool = False      # ring attention over the mesh 'tensor'
                                     # axis: K/V stay sequence-sharded and
                                     # rotate via ppermute (O(S/n) per-chip
                                     # attention memory, comm overlaps
                                     # compute) — for >1024² multi-chip
                                     # serving; see ops/ring_attention.py.
                                     # Implies the shard_sequence residual
                                     # layout; inference path only.
    rope_in_kernel: bool = True      # apply the half-layout rotation inside
                                     # the flash kernel (inference win; the
                                     # backward adds f32 rotate transients —
                                     # trainers may turn it off to keep the
                                     # 12B single-chip step inside HBM)
    rope_layout: str = "half"        # "half" (rotate-half with q/k channels
                                     # permuted per head — identical
                                     # attention output, TPU-friendly
                                     # contiguous rotation, +8% e2e; see
                                     # ops/rope.py half_layout_perm; the
                                     # diffusers converter permutes weights
                                     # automatically) | "interleaved"
                                     # (diffusers pair rotation, for
                                     # layout-pinned checkpoints)
    quantized: Any = False           # False | True/"w8" (int8 weights) |
                                     # "w8a8" (int8 weights + dynamic
                                     # per-token activations on the MXU)
    fused_glue: bool = False         # inference-only Pallas glue kernels
                                     # fusing LN+modulate+quantize, gelu+
                                     # quantize and plain row-quantize into
                                     # one HBM pass each (ops/fused_glue).
                                     # Not differentiable — KD-emitting
                                     # paths auto-fall-back to XLA glue,
                                     # but differentiating a fused model
                                     # with kd_target=None (e.g. reusing
                                     # an inference config for adapter/
                                     # control training) fails inside the
                                     # Pallas vjp: build trainer configs
                                     # with fused_glue=False.
    shard_activations: bool = False  # tensor-parallel constraints (heads/
                                     # ffn over the mesh 'tensor' axis);
                                     # requires running under jax.set_mesh
    shard_sequence: bool = False     # sequence-parallel: residual-stream
                                     # tokens sharded over 'tensor' between
                                     # blocks (XLA inserts the attention
                                     # all-gathers); for >1024^2 token
                                     # counts (SURVEY §5.7)

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


@dataclass(frozen=True)
class ProjConfig:
    """Alignment network (Proj7Exp in the reference, utils/proj.py:35-96).

    in_channels = MLLM hidden-state layer count + 1 (embedding layer); see
    SURVEY.md §2.10 for the per-model table.
    """

    in_channels: int = 25
    kernel_size: int = 5
    input_dim: int = 896
    output_dim0: int = 768            # pooled (CLIP-replacement) width
    output_dim1: int = 4096           # sequence (T5-replacement) width
    num_layers: int = 2               # T5 refiner depth (off in shipped cfgs)
    num_heads: int = 12
    head_dim: int = 64
    norm_eps: float = 1e-6
    use_t5: bool = False
    use_scale: bool = False
    use_cnn: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16


@dataclass(frozen=True)
class VAEConfig:
    """FLUX AutoencoderKL (diffusers config of black-forest-labs/FLUX.1-*)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    use_mid_attention: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16


@dataclass(frozen=True)
class Qwen2Config:
    """Qwen2-family causal LM (backs InternVL2.5 chat, Qwen2.5-VL, MiniCPM-o).

    Defaults = Qwen2.5-0.5B-Instruct, the LM inside InternVL2.5-1B
    (/root/reference/model_internvl/modeling_qwen2.py:1080; hidden 896,
    24 layers -> 25 exported hidden states, SURVEY.md §2.10).
    """

    vocab_size: int = 151674
    hidden_size: int = 896
    intermediate_size: int = 4864
    num_hidden_layers: int = 24
    num_attention_heads: int = 14
    num_key_value_heads: int = 2
    head_dim: int = 64
    max_position_embeddings: int = 32768
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    attention_bias: bool = True      # Qwen2 True; InternLM2 False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    use_pallas_attention: bool = True
    quantized: Any = False           # False | "w8" | "w8a8" int8 block
                                     # matmuls (ops/quant.QuantDense) — the
                                     # MLLM fits next to the int8 12B DiT
                                     # for single-chip end-to-end serving;
                                     # embed table / norms stay bf16

    @property
    def num_layers_with_embedding(self) -> int:
        """Hidden-state channel count consumed by the proj (layers + embed)."""
        return self.num_hidden_layers + 1


@dataclass(frozen=True)
class InternViTConfig:
    """InternViT-300M-448px (reference
    model_internvl/internvl/modeling_intern_vit.py:364-430)."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    qk_normalization: bool = False
    use_rms_norm: bool = False       # 300M uses LayerNorm
    initializer_factor: float = 0.1  # for ls1/ls2 learnable residual scales
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16


@dataclass(frozen=True)
class InternVLConfig:
    """Composite InternVL2.5 chat model: ViT + pixel-shuffle mlp1 + Qwen2 LM
    (reference model_internvl/internvl/modeling_internvl_chat.py:43-89)."""

    vision: InternViTConfig = field(default_factory=InternViTConfig)
    llm: Qwen2Config = field(default_factory=Qwen2Config)
    downsample_ratio: float = 0.5
    ps_version: str = "v2"
    img_context_token_id: int = 151667
    num_image_token: int = 256       # (448/14)^2 * 0.5^2
    template: str = "internvl2_5"
    dtype: Any = jnp.bfloat16


@dataclass(frozen=True)
class SchedulerConfig:
    """Flow-match Euler discrete scheduler (diffusers
    FlowMatchEulerDiscreteScheduler semantics used by the reference's
    FluxPipeline; see /root/reference/train/train_minicpm.py:242-252 for the
    dynamic-shift mu formula)."""

    num_train_timesteps: int = 1000
    shift: float = 1.0               # 1.0 schnell/shuttle, 3.0 dev
    use_dynamic_shifting: bool = False
    base_shift: float = 0.5
    max_shift: float = 1.16
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh description for pjit sharding.

    Axes:
      data    – data parallel (batch)
      fsdp    – parameter/optimizer-state sharding (ZeRO-equivalent)
      tensor  – tensor parallel over heads/ffn for the DiT
    """

    data: int = -1                   # -1: use all remaining devices
    fsdp: int = 1
    tensor: int = 1
    axis_names: Tuple[str, ...] = ("data", "fsdp", "tensor")


@dataclass(frozen=True)
class GenerationConfig:
    """Sampling operating point (reference infer/inference_minicpm.py:181-215)."""

    height: int = 1024
    width: int = 1024
    num_inference_steps: int = 4
    guidance_scale: float = 3.5
    max_sequence_length: int = 512
    seed: int = 0
    vae_tile_px: int = 1536          # decode in overlapping tiles when
                                     # height or width exceeds this
                                     # (decoder activations at 2048²
                                     # exceed one chip's HBM); 0 = never
                                     # tile. See AutoencoderKL.decode_tiled.


@dataclass(frozen=True)
class DistillConfig:
    """Phase-1 attention-distillation operating point
    (reference train/train_minicpm.{py,sh}; BASELINE.md)."""

    learning_rate: float = 1e-4
    lr_scheduler: str = "cosine"
    lr_warmup_steps: int = 100
    max_train_steps: int = 100_000
    train_batch_size: int = 1
    gradient_accumulation_steps: int = 1
    max_grad_norm: float = 1.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    use_8bit_adam: bool = False      # reference launchers default to bnb
                                     # AdamW8bit (train_minicpm.sh:23)
    kd_stacks_int8: bool = False     # per-token int8 teacher KD stacks:
                                     # halves their HBM/transfer footprint
    inline_kd: bool = False          # compute per-block KD terms inside
                                     # the student scan (scalars leave the
                                     # scan instead of GB-scale stacks)
    kd_temperature: float = 3.0      # train_minicpm.py:607
    latent_height: int = 128         # 128x128 latent grid = 4096 img tokens
    latent_width: int = 128
    text_seq_len: int = 512
    checkpointing_steps: int = 1000
    checkpoints_total_limit: Optional[int] = 5
    seed: int = 2024
    remat: bool = True


@dataclass(frozen=True)
class LightControlConfig:
    """Phase-2 ControlNeXt finetune
    (reference lightcontrol/train_lightcontrol.{py,sh})."""

    learning_rate: float = 1e-5
    max_train_steps: int = 2_000_000
    train_batch_size: int = 1
    gradient_accumulation_steps: int = 8
    max_grad_norm: float = 1.0
    num_controls: int = 19           # one ControlNeXt per double block
    # "scan" = sequential branches + per-branch remat (fits full size on a
    # 16 GB chip); "vmap" = batched (fine at test sizes). See
    # models/controlnext.py::apply_control_bank.
    control_bank_impl: str = "scan"
    # fp8-moment AdamW (train/optim8bit.py) — the single-chip-fit knob;
    # the reference compresses phase-2 optimizer state by ZeRO-2-sharding
    # it across 8 GPUs instead (lightcontrol/accelerate_config_debug.yaml)
    use_8bit_adam: bool = False
    logit_mean: float = 0.0
    logit_std: float = 1.0
    weighting_scheme: str = "logit_normal"
    checkpointing_steps: int = 1000
    seed: int = 42


@dataclass(frozen=True)
class ControlNeXtConfig:
    """ControlNeXt CNN control branch
    (reference lightcontrol/lightcontrol_flux.py:575-749)."""

    in_channels: Tuple[int, ...] = (128, 128)
    out_channels: Tuple[int, ...] = (128, 256)
    groups: Tuple[int, ...] = (4, 8)
    time_embed_dim: int = 256
    final_out_channels: int = 3072
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16


def _qwen2_5_vl_3b_llm() -> Qwen2Config:
    return Qwen2Config(
        vocab_size=151936, hidden_size=2048, intermediate_size=11008,
        num_hidden_layers=36, num_attention_heads=16, num_key_value_heads=2,
        head_dim=128, rope_theta=1000000.0)


def _qwen2_5_vl_7b_llm() -> Qwen2Config:
    return Qwen2Config(
        vocab_size=152064, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        head_dim=128, rope_theta=1000000.0)


def _internvl_4b_llm() -> Qwen2Config:
    # Qwen2.5-3B-Instruct inside InternVL2.5-4B: 36 layers -> 37 states.
    return Qwen2Config(
        vocab_size=151674, hidden_size=2048, intermediate_size=11008,
        num_hidden_layers=36, num_attention_heads=16, num_key_value_heads=2,
        head_dim=128, rope_theta=1000000.0)


def _minicpm_llm() -> Qwen2Config:
    # Qwen2-7B inside MiniCPM-o-2.6: 28 layers -> 29 states.
    return Qwen2Config(
        vocab_size=151700, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28, num_key_value_heads=4,
        head_dim=128, rope_theta=1000000.0)


# Proj factory table, matching reference utils/proj.py:74-96 and the
# per-model channel counts in SURVEY.md §2.10. Shipped checkpoints use
# use_t5=False; internvl1b uses use_scale=True, all others use_cnn=True
# (reference infer/inference_internvl.py:76-78).
PROJ_REGISTRY: Dict[str, ProjConfig] = {
    "internvl1b": ProjConfig(in_channels=25, input_dim=896, num_heads=12,
                             head_dim=64, use_scale=True, use_cnn=False),
    "internvl4b": ProjConfig(in_channels=37, input_dim=2048, num_heads=16,
                             head_dim=128),
    "qwen3b": ProjConfig(in_channels=37, input_dim=2048, num_heads=28,
                         head_dim=128),
    "qwen7b": ProjConfig(in_channels=29, input_dim=3584, num_heads=28,
                         head_dim=128),
    "minicpm": ProjConfig(in_channels=29, input_dim=3584, num_heads=28,
                          head_dim=128),
}


MODEL_REGISTRY: Dict[str, Dict[str, Any]] = {
    # BASELINE.md config 1: smallest, CPU-runnable smoke config.
    "x2i-internvl2.5-1b": {
        "mllm": InternVLConfig(),
        "proj": PROJ_REGISTRY["internvl1b"],
        "flux": FluxConfig(guidance_embeds=False),
        "scheduler": SchedulerConfig(shift=1.0, use_dynamic_shifting=False),
    },
    "x2i-internvl2.5-4b": {
        "mllm": InternVLConfig(llm=_internvl_4b_llm()),
        "proj": PROJ_REGISTRY["internvl4b"],
        "flux": FluxConfig(guidance_embeds=False),
        "scheduler": SchedulerConfig(shift=1.0, use_dynamic_shifting=False),
    },
    "x2i-qwenvl2.5-3b": {
        "mllm": _qwen2_5_vl_3b_llm(),
        "proj": PROJ_REGISTRY["qwen3b"],
        "flux": FluxConfig(guidance_embeds=False),
        "scheduler": SchedulerConfig(shift=1.0, use_dynamic_shifting=False),
    },
    "x2i-qwenvl2.5-7b": {
        "mllm": _qwen2_5_vl_7b_llm(),
        "proj": PROJ_REGISTRY["qwen7b"],
        "flux": FluxConfig(guidance_embeds=False),
        "scheduler": SchedulerConfig(shift=1.0, use_dynamic_shifting=False),
    },
    "x2i-minicpm-o-2.6": {
        "mllm": _minicpm_llm(),
        "proj": PROJ_REGISTRY["minicpm"],
        "flux": FluxConfig(guidance_embeds=False),
        "scheduler": SchedulerConfig(shift=1.0, use_dynamic_shifting=False),
    },
    # FLUX.1-dev variant (28-step, guidance embeds, dynamic shifting).
    "x2i-minicpm-o-2.6-dev": {
        "mllm": _minicpm_llm(),
        "proj": PROJ_REGISTRY["minicpm"],
        "flux": FluxConfig(guidance_embeds=True),
        "scheduler": SchedulerConfig(shift=3.0, use_dynamic_shifting=True),
    },
}


def tiny_flux_config(**overrides) -> FluxConfig:
    """A miniature FLUX used by tests and CPU dry-runs."""
    base = dict(
        num_layers=2, num_single_layers=4, attention_head_dim=32,
        num_attention_heads=4, joint_attention_dim=64,
        pooled_projection_dim=32, time_embed_dim=32,
        axes_dims_rope=(8, 12, 12), dtype=jnp.float32,
        param_dtype=jnp.float32, use_pallas_attention=False)
    base.update(overrides)
    return FluxConfig(**base)


def tiny_qwen2_config(**overrides) -> Qwen2Config:
    base = dict(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, dtype=jnp.float32, param_dtype=jnp.float32,
        use_pallas_attention=False)
    base.update(overrides)
    return Qwen2Config(**base)


def asdict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
