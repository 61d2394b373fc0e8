"""MiniCPM-o-2.6 omni encoder: SigLIP NaViT + resampler + Whisper + Qwen2.

Reference: /root/reference/minicpm/modeling_minicpmo.py. The image path:
variable-resolution slices -> vpm (SigLIP minus last layer) -> 64-query
resampler -> scatter into LLM embeddings at image_bound spans (:291-406).
The audio path: whisper encoder -> avg-pool(2) -> projector -> splice at
audio_bounds (:469-619). Then a single Qwen2 prefill exports all per-layer
hidden states (generate(..., decode_text=False), :770-826). The TTS stack
(ConditionalChatTTS/DVAE/vocos, :2208-3185) lives in models/chattts.py and
x2i_tpu/streaming.py (not on the image path).

TPU shape discipline: all bound/index bookkeeping is host-side
(data/minicpm_vision.py builds flat scatter maps); the model consumes
static padded arrays and does gather+where scatters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from x2i_tpu.core.config import Qwen2Config
from x2i_tpu.models.qwen2 import Qwen2LM
from x2i_tpu.models.resampler import Resampler, ResamplerConfig
from x2i_tpu.models.siglip import SiglipVisionConfig, SiglipVisionTransformer
from x2i_tpu.models.whisper_enc import (AudioProjector, WhisperConfig,
                                        WhisperEncoder)


def _minicpm_llm() -> Qwen2Config:
    return Qwen2Config(vocab_size=151700, hidden_size=3584,
                       intermediate_size=18944, num_hidden_layers=28,
                       num_attention_heads=28, num_key_value_heads=4,
                       head_dim=128)


@dataclass(frozen=True)
class MiniCPMOConfig:
    vision: SiglipVisionConfig = field(default_factory=SiglipVisionConfig)
    audio: WhisperConfig = field(default_factory=WhisperConfig)
    llm: Qwen2Config = field(default_factory=_minicpm_llm)
    query_num: int = 64              # resampler queries per image slice
    audio_pool_step: int = 2
    resampler_heads: int = 28

    def resampler_config(self) -> ResamplerConfig:
        return ResamplerConfig(num_queries=self.query_num,
                               embed_dim=self.llm.hidden_size,
                               num_heads=self.resampler_heads,
                               kv_dim=self.vision.hidden_size,
                               dtype=self.llm.dtype,
                               param_dtype=self.llm.param_dtype)


class MiniCPMOEncoder(nn.Module):
    """-> per-layer hidden stack (B, L+1, S, H) for the proj."""
    cfg: MiniCPMOConfig

    def setup(self):
        self.vpm = SiglipVisionTransformer(self.cfg.vision, name="vpm")
        self.resampler = Resampler(self.cfg.resampler_config(),
                                   name="resampler")
        self.apm = WhisperEncoder(self.cfg.audio, name="apm")
        self.audio_projector = AudioProjector(
            self.cfg.llm.hidden_size, self.cfg.audio_pool_step,
            self.cfg.llm.dtype, self.cfg.llm.param_dtype,
            name="audio_projector")
        self.llm = Qwen2LM(self.cfg.llm, name="llm")

    def encode_images(self, vision: Dict) -> jnp.ndarray:
        """vision dict (host-built, data/minicpm_vision.py):
          patches (N, L, 3*ps^2), position_ids (N, L), patch_mask (N, L),
          pos_embed (N, L, llm_hidden) resampler sincos slices.
        -> (N * query_num, llm_hidden) slice features in order."""
        feats = self.vpm(vision["patches"], vision["position_ids"],
                         vision["patch_mask"])
        tokens = self.resampler(feats, vision["pos_embed"],
                                vision["patch_mask"])
        return tokens.reshape(-1, tokens.shape[-1])

    def encode_audio(self, audio: Dict) -> jnp.ndarray:
        """audio dict: mel (A, mels, T) — one row per 30s chunk —
        frame_mask (A, conv frames) valid-key mask, attn_bias optional
        chunked-attention bias (whisper_enc.chunk_bias; the reference
        runs generate with chunk_length=audio_chunk_length=1.0,
        modeling_minicpmo.py:808-811) -> flat (A * T//4, llm_hidden)
        pooled+projected features; padded chunks' tail rows are garbage
        the audio_map must skip (bounds_to_map rows=...)."""
        hs = self.apm(audio["mel"], audio.get("frame_mask"),
                      audio.get("attn_bias"))
        proj = self.audio_projector(hs)
        return proj.reshape(-1, proj.shape[-1])

    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 vision: Optional[Dict] = None,
                 audio: Optional[Dict] = None,
                 img_map: Optional[jnp.ndarray] = None,
                 audio_map: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """img_map/audio_map: (B, S) int32, -1 for text positions, else the
        flat feature row to place there (host-computed from
        image_bound/audio_bounds spans)."""
        embeds = self.llm.embed(input_ids)
        b, s, c = embeds.shape
        flat = embeds.reshape(b * s, c)

        if vision is not None and img_map is not None:
            img_feats = self.encode_images(vision)
            m = img_map.reshape(b * s)
            take = img_feats[jnp.clip(m, 0, img_feats.shape[0] - 1)]
            flat = jnp.where((m >= 0)[:, None], take.astype(flat.dtype),
                             flat)
        if audio is not None and audio_map is not None:
            audio_feats = self.encode_audio(audio)
            m = audio_map.reshape(b * s)
            take = audio_feats[jnp.clip(m, 0, audio_feats.shape[0] - 1)]
            flat = jnp.where((m >= 0)[:, None], take.astype(flat.dtype),
                             flat)

        embeds = flat.reshape(b, s, c)
        all_hidden, _ = self.llm(inputs_embeds=embeds,
                                 attention_mask=attention_mask)
        return all_hidden
