"""Model configs parsed from on-disk checkpoint directories.

The reference never hardcodes architecture dims at its entry points: it
reads them from each checkpoint's own config files —
`FluxPipeline.from_pretrained` / `AutoencoderKL.from_pretrained` read the
diffusers `transformer/config.json` + `vae/config.json`
(/root/reference/infer/inference_minicpm.py:72-77), and
`*.from_pretrained(mllm_path)` reads the HF `config.json`
(inference_minicpm.py:51-63, inference_qwenvl.py:32-43,
inference_internvl.py:58-66). These parsers do the same for our frozen
dataclass configs so `build_pipeline_from_checkpoints` assembles whatever
architecture the directory actually holds; MODEL_REGISTRY entries remain
the fallback when a directory carries no config file.

The proj checkpoint has NO config file in the released layout (a bare
`diffusion_pytorch_model.bin`, inference_minicpm.py:80-91 hardcodes the
factory) — its architecture is instead inferred from the state-dict
shapes (`proj_config_from_sd`), which the Proj7Exp structure fully
determines (utils/proj.py:35-53).
"""

from __future__ import annotations

import json
import os
from dataclasses import replace
from typing import Any, Dict, Mapping, Optional, Tuple

from x2i_tpu.core.config import (FluxConfig, InternViTConfig, InternVLConfig,
                                 ProjConfig, Qwen2Config, SchedulerConfig,
                                 VAEConfig)


def _read_json(path: str) -> Optional[Dict[str, Any]]:
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def flux_config_from_dir(flux_path: str,
                         base: Optional[FluxConfig] = None
                         ) -> Optional[FluxConfig]:
    """diffusers FluxTransformer2DModel `transformer/config.json`."""
    d = _read_json(os.path.join(flux_path, "transformer", "config.json"))
    if d is None:
        return None
    base = base or FluxConfig()
    return replace(
        base,
        patch_size=d.get("patch_size", base.patch_size),
        in_channels=d.get("in_channels", base.in_channels),
        num_layers=d.get("num_layers", base.num_layers),
        num_single_layers=d.get("num_single_layers",
                                base.num_single_layers),
        attention_head_dim=d.get("attention_head_dim",
                                 base.attention_head_dim),
        num_attention_heads=d.get("num_attention_heads",
                                  base.num_attention_heads),
        joint_attention_dim=d.get("joint_attention_dim",
                                  base.joint_attention_dim),
        pooled_projection_dim=d.get("pooled_projection_dim",
                                    base.pooled_projection_dim),
        guidance_embeds=d.get("guidance_embeds", base.guidance_embeds),
        axes_dims_rope=tuple(d.get("axes_dims_rope",
                                   base.axes_dims_rope)))


def vae_config_from_dir(flux_path: str) -> Optional[VAEConfig]:
    """diffusers AutoencoderKL `vae/config.json`."""
    d = _read_json(os.path.join(flux_path, "vae", "config.json"))
    if d is None:
        return None
    base = VAEConfig()
    return replace(
        base,
        in_channels=d.get("in_channels", base.in_channels),
        out_channels=d.get("out_channels", base.out_channels),
        latent_channels=d.get("latent_channels", base.latent_channels),
        block_out_channels=tuple(d.get("block_out_channels",
                                       base.block_out_channels)),
        layers_per_block=d.get("layers_per_block", base.layers_per_block),
        norm_num_groups=d.get("norm_num_groups", base.norm_num_groups),
        scaling_factor=d.get("scaling_factor", base.scaling_factor),
        shift_factor=d.get("shift_factor", base.shift_factor) or 0.0,
        use_mid_attention=d.get("mid_block_add_attention",
                                base.use_mid_attention))


def scheduler_config_from_dir(flux_path: str) -> Optional[SchedulerConfig]:
    """diffusers FlowMatchEulerDiscreteScheduler
    `scheduler/scheduler_config.json`."""
    d = _read_json(os.path.join(flux_path, "scheduler",
                                "scheduler_config.json"))
    if d is None:
        return None
    base = SchedulerConfig()
    return replace(
        base,
        num_train_timesteps=d.get("num_train_timesteps",
                                  base.num_train_timesteps),
        shift=d.get("shift", base.shift),
        use_dynamic_shifting=d.get("use_dynamic_shifting",
                                   base.use_dynamic_shifting),
        base_shift=d.get("base_shift", base.base_shift),
        max_shift=d.get("max_shift", base.max_shift),
        base_image_seq_len=d.get("base_image_seq_len",
                                 base.base_image_seq_len),
        max_image_seq_len=d.get("max_image_seq_len",
                                base.max_image_seq_len))


def _qwen2_from_dict(d: Mapping[str, Any],
                     base: Optional[Qwen2Config] = None) -> Qwen2Config:
    base = base or Qwen2Config()
    heads = d.get("num_attention_heads", base.num_attention_heads)
    hidden = d.get("hidden_size", base.hidden_size)
    return replace(
        base,
        vocab_size=d.get("vocab_size", base.vocab_size),
        hidden_size=hidden,
        intermediate_size=d.get("intermediate_size",
                                base.intermediate_size),
        num_hidden_layers=d.get("num_hidden_layers",
                                base.num_hidden_layers),
        num_attention_heads=heads,
        num_key_value_heads=d.get("num_key_value_heads",
                                  base.num_key_value_heads),
        head_dim=d.get("head_dim") or hidden // heads,
        max_position_embeddings=d.get("max_position_embeddings",
                                      base.max_position_embeddings),
        rope_theta=d.get("rope_theta", base.rope_theta),
        rms_norm_eps=d.get("rms_norm_eps", base.rms_norm_eps),
        tie_word_embeddings=d.get("tie_word_embeddings",
                                  base.tie_word_embeddings))


def qwenvl_config_from_dir(mllm_path: str, base_llm: Qwen2Config):
    """HF Qwen2.5-VL `config.json` -> models.qwen2_5_vl.Qwen2_5_VLConfig.

    Handles both released layouts: flat text fields at top level
    (transformers <=4.49, the layout of released Qwen2.5-VL-*-Instruct)
    and nested under "text_config" (newer transformers). Returns None if
    the directory has no config.json.
    """
    from x2i_tpu.models.qwen2_5_vl import Qwen2_5_VLConfig, QwenVisionConfig
    d = _read_json(os.path.join(mllm_path, "config.json"))
    if d is None:
        return None
    text = d.get("text_config", d)
    llm = _qwen2_from_dict(text, base_llm)
    vb = QwenVisionConfig()
    v = d.get("vision_config") or {}
    vision = replace(
        vb,
        depth=v.get("depth", vb.depth),
        hidden_size=v.get("hidden_size", vb.hidden_size),
        intermediate_size=v.get("intermediate_size", vb.intermediate_size),
        num_heads=v.get("num_heads", vb.num_heads),
        in_channels=v.get("in_channels", vb.in_channels),
        patch_size=v.get("patch_size", vb.patch_size),
        spatial_merge_size=v.get("spatial_merge_size",
                                 vb.spatial_merge_size),
        temporal_patch_size=v.get("temporal_patch_size",
                                  vb.temporal_patch_size),
        window_size=v.get("window_size", vb.window_size),
        out_hidden_size=v.get("out_hidden_size", llm.hidden_size),
        fullatt_block_indexes=tuple(v.get("fullatt_block_indexes",
                                          vb.fullatt_block_indexes)))
    rope_scaling = text.get("rope_scaling") or d.get("rope_scaling") or {}
    full = Qwen2_5_VLConfig(vision=vision, llm=llm)
    return replace(
        full,
        mrope_section=tuple(rope_scaling.get("mrope_section",
                                             full.mrope_section)),
        image_token_id=d.get("image_token_id", full.image_token_id),
        video_token_id=d.get("video_token_id", full.video_token_id),
        vision_start_token_id=d.get("vision_start_token_id",
                                    full.vision_start_token_id))


def internvl_config_from_dir(mllm_path: str, base: InternVLConfig
                             ) -> Optional[InternVLConfig]:
    """HF InternVLChatModel `config.json` (llm_config + vision_config +
    downsample_ratio, reference
    model_internvl/internvl/modeling_internvl_chat.py:43-62)."""
    d = _read_json(os.path.join(mllm_path, "config.json"))
    if d is None:
        return None
    llm = _qwen2_from_dict(d.get("llm_config") or {}, base.llm)
    v = d.get("vision_config") or {}
    vb = base.vision
    vision = replace(
        vb,
        hidden_size=v.get("hidden_size", vb.hidden_size),
        intermediate_size=v.get("intermediate_size", vb.intermediate_size),
        num_hidden_layers=v.get("num_hidden_layers", vb.num_hidden_layers),
        num_attention_heads=v.get("num_attention_heads",
                                  vb.num_attention_heads),
        image_size=d.get("force_image_size",
                         v.get("image_size", vb.image_size)),
        patch_size=v.get("patch_size", vb.patch_size),
        qkv_bias=v.get("qkv_bias", vb.qkv_bias),
        qk_normalization=v.get("qk_normalization", vb.qk_normalization),
        use_rms_norm=(v.get("norm_type", "rms_norm" if vb.use_rms_norm
                            else "layer_norm") == "rms_norm"))
    downsample = d.get("downsample_ratio", base.downsample_ratio)
    num_image_token = int((vision.image_size // vision.patch_size) ** 2
                          * downsample ** 2)
    return replace(base, llm=llm, vision=vision,
                   downsample_ratio=downsample,
                   ps_version=d.get("ps_version", base.ps_version),
                   num_image_token=num_image_token)


def minicpmo_config_from_dir(mllm_path: str, base_llm: Qwen2Config):
    """HF MiniCPM-o `config.json` (flat Qwen2 llm fields + vision_config +
    audio_config + query_num, reference minicpm/configuration_minicpm.py).
    Resampler heads follow the reference's embed_dim//128 rule
    (modeling_minicpmo.py init_resampler)."""
    from dataclasses import replace as _r

    from x2i_tpu.models.minicpmo import MiniCPMOConfig
    from x2i_tpu.models.siglip import SiglipVisionConfig
    from x2i_tpu.models.whisper_enc import WhisperConfig
    d = _read_json(os.path.join(mllm_path, "config.json"))
    if d is None:
        return None
    llm = _qwen2_from_dict(d, base_llm)
    v = d.get("vision_config") or {}
    vb = SiglipVisionConfig()
    vision = _r(vb,
                hidden_size=v.get("hidden_size", vb.hidden_size),
                intermediate_size=v.get("intermediate_size",
                                        vb.intermediate_size),
                num_hidden_layers=v.get("num_hidden_layers",
                                        vb.num_hidden_layers),
                num_attention_heads=v.get("num_attention_heads",
                                          vb.num_attention_heads),
                image_size=v.get("image_size", vb.image_size),
                patch_size=v.get("patch_size", vb.patch_size))
    a = d.get("audio_config") or {}
    ab = WhisperConfig()
    audio = _r(ab,
               num_mel_bins=a.get("num_mel_bins", ab.num_mel_bins),
               d_model=a.get("d_model", ab.d_model),
               encoder_layers=a.get("encoder_layers", ab.encoder_layers),
               encoder_attention_heads=a.get("encoder_attention_heads",
                                             ab.encoder_attention_heads),
               encoder_ffn_dim=a.get("encoder_ffn_dim", ab.encoder_ffn_dim),
               max_source_positions=a.get("max_source_positions",
                                          ab.max_source_positions))
    return MiniCPMOConfig(
        vision=vision, audio=audio, llm=llm,
        query_num=d.get("query_num", 64),
        audio_pool_step=d.get("audio_pool_step", 2),
        resampler_heads=max(1, llm.hidden_size // 128))


def proj_config_from_sd(sd: Mapping[str, Any],
                        base: Optional[ProjConfig] = None) -> ProjConfig:
    """Infer the Proj7Exp architecture from its state-dict shapes.

    The released proj checkpoint is a bare torch .bin with no config; its
    structure (utils/proj.py:35-53) determines every dim:
      cha_scale (1,C,1,1)        -> use_scale + in_channels
      conv.weight (1,C,k,k)      -> use_cnn + in_channels + kernel_size
      mlp.layernorm.weight (H,)  -> input_dim
      mlp.projector.0.weight (D1,H) -> output_dim1
      mlp.fc.1.weight (D0,D1)    -> output_dim0
      t5stack.* presence         -> use_t5 (shipped checkpoints: absent)
    """
    base = base or ProjConfig()
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    use_scale = "cha_scale" in sd
    use_cnn = "conv.weight" in sd
    in_channels, kernel = base.in_channels, base.kernel_size
    if use_scale:
        in_channels = int(sd["cha_scale"].shape[1])
    elif use_cnn:
        in_channels = int(sd["conv.weight"].shape[1])
        kernel = int(sd["conv.weight"].shape[2])
    return replace(
        base,
        in_channels=in_channels, kernel_size=kernel,
        input_dim=int(sd["mlp.layernorm.weight"].shape[0]),
        output_dim1=int(sd["mlp.projector.0.weight"].shape[0]),
        output_dim0=int(sd["mlp.fc.1.weight"].shape[0]),
        use_t5=any(k.startswith("t5stack.") for k in sd),
        use_scale=use_scale, use_cnn=use_cnn)
