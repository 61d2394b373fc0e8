"""Qwen2.5-VL encoder: windowed-attention ViT + M-RoPE Qwen2 LM.

X2I's Qwen path (/root/reference/infer/inference_qwenvl.py) feeds images at
max 128^2 pixels / video frames at 128^2 fps 1 through the HF
Qwen2.5-VL model with `generate(max_new_tokens=128|1,
output_hidden_states=True)` and stacks the prefill hidden states for the
proj (SURVEY.md §2.10). This module reimplements the model TPU-natively:

  * Vision tower (HF Qwen2_5_VisionTransformerPretrainedModel semantics):
    flattened temporal-patch embedding (3D conv == one Dense over the
    flattened patch), RMSNorm blocks with window attention (full attention
    on fullatt_block_indexes), 2D rotary embedding, 2x2 patch merger.
    All data-dependent indexing (window permutation, segment ids, rope
    positions) is precomputed on the host (data/qwen_vision.py) so the
    on-device graph is static; window masking is a segment-id bias.
  * LM: models.qwen2.Qwen2LM with precomputed M-RoPE tables — the 3D
    (t, h, w) position ids map to interleaved channel sections
    (mrope_section), HF apply_multimodal_rotary_pos_emb semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2i_tpu.core.config import Qwen2Config
from x2i_tpu.models.qwen2 import Qwen2LM, RMSNorm
from x2i_tpu.ops.attention import attention


@dataclass(frozen=True)
class QwenVisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    window_size: int = 112
    out_hidden_size: int = 3584
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    rms_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class Qwen2_5_VLConfig:
    vision: QwenVisionConfig = field(default_factory=QwenVisionConfig)
    llm: Qwen2Config = field(default_factory=Qwen2Config)
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652


def vision_rope(cos_sin_ids: jnp.ndarray, head_dim: int,
                theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2D rotary tables for the ViT. cos_sin_ids: (S, 2) (h, w) positions.
    Each axis gets head_dim/4 freqs; emb = cat(freqs_hw, freqs_hw)."""
    dim = head_dim // 2
    inv = 1.0 / (theta ** (
        jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    ang_h = cos_sin_ids[:, 0:1].astype(jnp.float32) * inv[None]
    ang_w = cos_sin_ids[:, 1:2].astype(jnp.float32) * inv[None]
    freqs = jnp.concatenate([ang_h, ang_w], axis=-1)       # (S, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)         # (S, D)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    d2 = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)


class QwenVisionBlock(nn.Module):
    cfg: QwenVisionConfig

    @nn.compact
    def __call__(self, hidden, cos, sin, bias_full, bias_win, is_full):
        """hidden: (S, C); bias_*: (1, 1, S, S) additive masks; is_full:
        scalar bool selecting full vs window attention for this layer."""
        cfg = self.cfg
        s, c = hidden.shape
        h, d = cfg.num_heads, cfg.head_dim
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, use_bias=bias, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)

        x = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="norm1")(hidden)
        qkv = dense(3 * c, "qkv")(x).reshape(s, 3, h, d)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        # rope (f32, rotate-half convention)
        cosb, sinb = cos[:, None, :], sin[:, None, :]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cosb + _rotate_half(qf) * sinb).astype(q.dtype)
        k = (kf * cosb + _rotate_half(kf) * sinb).astype(k.dtype)

        bias = jnp.where(is_full, bias_full, bias_win)
        attn = attention(q[None], k[None], v[None], bias=bias)[0]
        hidden = hidden + dense(c, "proj")(attn.reshape(s, c))

        x = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="norm2")(hidden)
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        hidden = hidden + dense(c, "down_proj")(nn.silu(gate) * up)
        return hidden


class QwenVisionTransformer(nn.Module):
    cfg: QwenVisionConfig

    @nn.compact
    def __call__(self, patches: jnp.ndarray, pos_hw: jnp.ndarray,
                 window_seg: jnp.ndarray, image_seg: jnp.ndarray
                 ) -> jnp.ndarray:
        """
        Args:
          patches: (S, in_channels * temporal_patch * patch^2) flattened
            pixel patches, already window-permuted on the host
            (data/qwen_vision.py).
          pos_hw: (S, 2) per-patch (h, w) rope positions (window-permuted).
          window_seg: (S,) window segment ids (window attention).
          image_seg: (S,) image segment ids (full attention per image).

        Returns: (S / merge^2, out_hidden_size) merged features, still in
          window order (host applies the reverse permutation).
        """
        cfg = self.cfg
        s = patches.shape[0]
        hidden = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          name="patch_embed")(patches.astype(cfg.dtype))
        cos, sin = vision_rope(pos_hw, cfg.head_dim)

        def seg_bias(seg):
            eq = seg[:, None] == seg[None, :]
            return jnp.where(eq, 0.0, -1e30)[None, None].astype(jnp.float32)

        bias_full = seg_bias(image_seg)
        bias_win = seg_bias(window_seg)
        is_full = jnp.zeros((cfg.depth,), bool).at[
            jnp.asarray(cfg.fullatt_block_indexes)].set(True)

        def body(block, carry, layer_is_full):
            return block(carry, cos, sin, bias_full, bias_win,
                         layer_is_full), None

        hidden, _ = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0,),
            length=cfg.depth,
        )(QwenVisionBlock(cfg, name="block"), hidden, is_full)

        # patch merger: RMSNorm then merge spatial_merge^2 neighbors
        merged = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="ln_q")(
            hidden)
        unit = cfg.spatial_merge_size ** 2
        merged = merged.reshape(s // unit, unit * cfg.hidden_size)
        merged = nn.Dense(unit * cfg.hidden_size, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          name="merger_fc1")(merged)
        merged = nn.gelu(merged, approximate=False)
        return nn.Dense(cfg.out_hidden_size, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype,
                        name="merger_fc2")(merged)


def mrope_tables(position_ids: jnp.ndarray, head_dim: int, theta: float,
                 mrope_section: Sequence[int]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """M-RoPE cos/sin (B, S, head_dim) from 3D positions (3, B, S).

    HF semantics: full-dim tables per (t, h, w) stream, channel-sectioned
    as cat over split(mrope_section * 2): section i takes stream i % 3.
    """
    inv = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = position_ids.astype(jnp.float32)[..., None] * inv   # (3, B, S, D/2)
    ang = jnp.concatenate([ang, ang], axis=-1)                # (3, B, S, D)
    cos3, sin3 = jnp.cos(ang), jnp.sin(ang)

    sections = list(mrope_section) * 2
    cos_parts, sin_parts = [], []
    start = 0
    for i, sec in enumerate(sections):
        cos_parts.append(cos3[i % 3, :, :, start:start + sec])
        sin_parts.append(sin3[i % 3, :, :, start:start + sec])
        start += sec
    return (jnp.concatenate(cos_parts, axis=-1),
            jnp.concatenate(sin_parts, axis=-1))


class Qwen2_5_VLEncoder(nn.Module):
    """Vision tower + M-RoPE LM -> per-layer hidden-state stack for the
    proj (B, L+1, S, H). Vision features fill the image/video token
    positions in order (HF masked_scatter semantics)."""
    cfg: Qwen2_5_VLConfig

    def setup(self):
        self.visual = QwenVisionTransformer(self.cfg.vision, name="visual")
        self.language_model = Qwen2LM(self.cfg.llm, name="language_model")

    def encode_vision(self, patches, pos_hw, window_seg, image_seg,
                      reverse_index):
        feats = self.visual(patches, pos_hw, window_seg, image_seg)
        return feats[reverse_index]

    def embed_multimodal(self, input_ids: jnp.ndarray,
                         vision_inputs: Optional[dict] = None
                         ) -> jnp.ndarray:
        """Token embeddings with vision features scattered at image/video
        token positions (HF masked_scatter semantics)."""
        embeds = self.language_model.embed(input_ids)
        if vision_inputs is not None:
            feats = self.encode_vision(
                vision_inputs["patches"], vision_inputs["pos_hw"],
                vision_inputs["window_seg"], vision_inputs["image_seg"],
                vision_inputs["reverse_index"])
            b, s, c = embeds.shape
            flat = embeds.reshape(b * s, c)
            ids = input_ids.reshape(b * s)
            selected = jnp.logical_or(ids == self.cfg.image_token_id,
                                      ids == self.cfg.video_token_id)
            order = jnp.cumsum(selected.astype(jnp.int32)) - 1
            gathered = feats[jnp.clip(order, 0, feats.shape[0] - 1)]
            flat = jnp.where(selected[:, None], gathered.astype(flat.dtype),
                             flat)
            embeds = flat.reshape(b, s, c)
        return embeds

    def rope(self, position_ids_3d: jnp.ndarray):
        return mrope_tables(position_ids_3d, self.cfg.llm.head_dim,
                            self.cfg.llm.rope_theta, self.cfg.mrope_section)

    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray,
                 position_ids_3d: jnp.ndarray,            # (3, B, S)
                 vision_inputs: Optional[dict] = None) -> jnp.ndarray:
        embeds = self.embed_multimodal(input_ids, vision_inputs)
        all_hidden, _ = self.language_model(
            inputs_embeds=embeds, attention_mask=attention_mask,
            rope=self.rope(position_ids_3d))
        return all_hidden


def encode_with_answer(encoder: Qwen2_5_VLEncoder, params,
                       input_ids: jnp.ndarray,
                       attention_mask: jnp.ndarray,
                       position_ids_3d: jnp.ndarray,
                       vision_inputs: Optional[dict],
                       max_new_tokens: int = 128,
                       eos_token_id: int = 151645) -> jnp.ndarray:
    """The `--use_answer` reasoning2image conditioning
    (/root/reference/infer/inference_qwenvl.py:121-132): generate an answer
    and concatenate prefill + per-step hidden states along the sequence.

    Text continuation after a multimodal prompt uses identical positions
    across the three M-RoPE streams (HF rope_deltas), which reduces to 1D
    rope at position max(pos3d)+1+step.
    """
    from x2i_tpu.models.decoding import (concat_answer_hiddens,
                                         greedy_decode_with_hiddens)
    embeds = encoder.apply(params, input_ids, vision_inputs,
                           method=Qwen2_5_VLEncoder.embed_multimodal)
    rope = encoder.apply(params, position_ids_3d,
                         method=Qwen2_5_VLEncoder.rope)
    lm_params = {"params": params["params"]["language_model"]}
    step_pos0 = jnp.max(position_ids_3d, axis=(0, 2)) + 1
    lm = Qwen2LM(encoder.cfg.llm)   # standalone def over the same params
    prefill, steps, tokens, valid = greedy_decode_with_hiddens(
        lm, lm_params, embeds, attention_mask,
        max_new_tokens, eos_token_id, prefill_rope=rope,
        step_pos0=step_pos0)
    return concat_answer_hiddens(prefill, steps), tokens, valid
