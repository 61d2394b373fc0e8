"""Whisper audio encoder + MiniCPM audio projector.

MiniCPM-o's `apm` (/root/reference/minicpm/modeling_minicpmo.py:214-216,
469-619): a Whisper encoder (conv stem, fixed sinusoidal positions, pre-LN
blocks — k-proj without bias — final layernorm), followed by AvgPool1d(2)
and a linear-relu-linear MultiModalProjector (:110-115,2577-2588) into the
LLM width. The streaming/chunked-attention variants of the reference
(:240-277) are inference-for-TTS features; the image path uses the plain
bidirectional encoder, optionally with a chunk mask, which maps to our
kv_mask/bias attention.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from x2i_tpu.ops.attention import attention


@dataclass(frozen=True)
class WhisperConfig:
    num_mel_bins: int = 80
    d_model: int = 1024              # whisper-medium (MiniCPM-o apm)
    encoder_layers: int = 24
    encoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    max_source_positions: int = 1500
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16


def chunk_bias(num_frames: int, chunk_frames: int,
               num_left_chunks: int = -1) -> np.ndarray:
    """Chunked-attention additive bias (1, 1, T, T): frame i attends
    frames in its chunk and up to num_left_chunks previous chunks (-1 =
    all). Mirrors the reference's subsequent_chunk_mask
    (modeling_minicpmo.py:240-277) used when chunk_input=True."""
    idx = np.arange(num_frames)
    chunk = idx // chunk_frames
    right = (chunk + 1) * chunk_frames                   # exclusive end
    if num_left_chunks >= 0:
        left = np.maximum(0, (chunk - num_left_chunks) * chunk_frames)
    else:
        left = np.zeros_like(idx)
    cols = idx[None, :]
    ok = (cols < right[:, None]) & (cols >= left[:, None])
    return np.where(ok, 0.0, -1e30).astype(np.float32)[None, None]


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Whisper fixed sinusoid table (HF sinusoids): (length, dim)."""
    log_timescale = math.log(10000) / (dim // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(dim // 2, dtype=np.float32))
    scaled = np.arange(length, dtype=np.float32)[:, None] * inv[None]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)


class WhisperBlock(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, hidden, kv_mask, bias=None):
        cfg = self.cfg
        b, s, c = hidden.shape
        h = cfg.encoder_attention_heads
        d = c // h
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype,
                                       name=name)
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, use_bias=bias, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)

        x = ln("attn_ln")(hidden)
        q = dense(c, "q")(x).reshape(b, s, h, d)
        k = dense(c, "k", bias=False)(x).reshape(b, s, h, d)
        v = dense(c, "v")(x).reshape(b, s, h, d)
        attn = attention(q, k, v, kv_mask=kv_mask, bias=bias)
        hidden = hidden + dense(c, "o")(attn.reshape(b, s, c))

        x = ln("ffn_ln")(hidden)
        x = nn.gelu(dense(cfg.encoder_ffn_dim, "fc1")(x), approximate=False)
        return hidden + dense(c, "fc2")(x)


class WhisperEncoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray,
                 kv_mask: Optional[jnp.ndarray] = None,
                 attn_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """mel: (B, num_mel_bins, T) log-mel features -> (B, T//2, d).
        attn_bias: optional (1, 1, T//2, T//2) chunked-attention bias
        (chunk_bias) matching the reference's chunk_input=True path."""
        cfg = self.cfg
        x = jnp.swapaxes(mel.astype(cfg.dtype), 1, 2)   # (B, T, mels)
        x = nn.gelu(nn.Conv(cfg.d_model, (3,), padding=1, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype, name="conv1")(x),
                    approximate=False)
        x = nn.gelu(nn.Conv(cfg.d_model, (3,), strides=2, padding=1,
                            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                            name="conv2")(x), approximate=False)
        pos = jnp.asarray(sinusoidal_positions(
            cfg.max_source_positions, cfg.d_model))[:x.shape[1]]
        x = x + pos.astype(cfg.dtype)[None]

        def body(block, carry):
            return block(carry, kv_mask, attn_bias), None

        x, _ = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.encoder_layers,
        )(WhisperBlock(cfg, name="block"), x)

        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype, name="final_ln")(x)


class AudioProjector(nn.Module):
    """linear-relu-linear projector THEN AvgPool1d(pool_step).

    Order matters: the reference projects the whisper states to LLM width
    first and avg-pools the projected features
    (modeling_minicpmo.py:529-533 — projection_layer, transpose,
    audio_avg_pooler, transpose); with the ReLU in between, pooling first
    gives different numbers. Pinned by
    tests/test_minicpm_reference_golden.py::test_minicpmo_composite_golden.
    """
    llm_dim: int
    pool_step: int = 2
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, d) -> (B, T // pool_step, llm_dim)."""
        x = nn.Dense(self.llm_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.llm_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear2")(x)
        b, t, d = x.shape
        t2 = t // self.pool_step
        x = x[:, :t2 * self.pool_step].reshape(b, t2, self.pool_step, d)
        return jnp.mean(x, axis=2)
