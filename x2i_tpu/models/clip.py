"""CLIP text encoder (the pooled-embedding teacher).

The reference loads CLIPTextModel and feeds its pooled output to FLUX as
`pooled_projections` during teacher runs
(/root/reference/train/train_minicpm.py:791-792; at inference the proj's
pooled head replaces it). Architecture = openai/clip-vit-large-patch14 text
tower: learned position embeddings, pre-LN blocks, quick_gelu, causal mask;
pooled output = final-LN hidden state at the EOS token position.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2i_tpu.ops.attention import attention
from x2i_tpu.ops.norms import layer_norm


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPBlock(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, hidden, kv_mask):
        cfg = self.cfg
        b, s, _ = hidden.shape
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        dense = lambda feats, name: nn.Dense(
            feats, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)

        x = ln("ln1")(hidden)
        q = dense(cfg.hidden_size, "q")(x).reshape(b, s, h, d)
        k = dense(cfg.hidden_size, "k")(x).reshape(b, s, h, d)
        v = dense(cfg.hidden_size, "v")(x).reshape(b, s, h, d)
        attn = attention(q, k, v, kv_mask=kv_mask, causal=True)
        hidden = hidden + dense(cfg.hidden_size, "o")(
            attn.reshape(b, s, cfg.hidden_size))

        x = ln("ln2")(hidden)
        hidden = hidden + dense(cfg.hidden_size, "fc2")(
            quick_gelu(dense(cfg.intermediate_size, "fc1")(x)))
        return hidden


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024          # clip-vit-large-patch14
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16


class CLIPVisionEncoder(nn.Module):
    """CLIP ViT (class token, pre-LN, quick_gelu) with pooled output =
    post-LN class embedding. Used by the CLIP-T eval metric — the quality
    protocol in BASELINE.md (the reference computes no eval metrics
    in-repo, SURVEY.md §5.5)."""
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                     jnp.ndarray]:
        """pixels: (B, H, W, 3) CLIP-normalized -> (last_hidden, pooled)."""
        cfg = self.cfg
        b = pixels.shape[0]
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=cfg.patch_size, padding="VALID",
                          use_bias=False, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          name="patch_embedding")(pixels.astype(cfg.dtype))
        gh, gw = patches.shape[1], patches.shape[2]
        patches = patches.reshape(b, gh * gw, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), cfg.param_dtype)
        hidden = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype),
                              (b, 1, cfg.hidden_size)), patches], axis=1)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (gh * gw + 1, cfg.hidden_size), cfg.param_dtype)
        hidden = hidden + pos.astype(cfg.dtype)[None]
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype,
                              name="pre_layernorm")(hidden)

        text_like_cfg = CLIPTextConfig(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            layer_norm_eps=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype)

        def body(block, carry):
            return block(carry, None), None

        # vision blocks are NOT causal: reuse CLIPBlock structure with the
        # causal flag off via a dedicated module
        hidden, _ = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_hidden_layers,
        )(CLIPVisionBlock(text_like_cfg, name="block"), hidden)

        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype,
                              name="post_layernorm")(hidden[:, 0])
        return hidden, pooled


class CLIPVisionBlock(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, hidden, kv_mask):
        cfg = self.cfg
        b, s, _ = hidden.shape
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        dense = lambda feats, name: nn.Dense(
            feats, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)

        x = ln("ln1")(hidden)
        q = dense(cfg.hidden_size, "q")(x).reshape(b, s, h, d)
        k = dense(cfg.hidden_size, "k")(x).reshape(b, s, h, d)
        v = dense(cfg.hidden_size, "v")(x).reshape(b, s, h, d)
        attn = attention(q, k, v, kv_mask=kv_mask, causal=False)
        hidden = hidden + dense(cfg.hidden_size, "o")(
            attn.reshape(b, s, cfg.hidden_size))

        x = ln("ln2")(hidden)
        hidden = hidden + dense(cfg.hidden_size, "fc2")(
            quick_gelu(dense(cfg.intermediate_size, "fc1")(x)))
        return hidden


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (last_hidden (B,S,H), pooled (B,H))."""
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size),
                         cfg.param_dtype)
        hidden = tok + pos[None, :s].astype(cfg.dtype)

        def body(block, carry):
            return block(carry, attention_mask), None

        hidden, _ = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_hidden_layers,
        )(CLIPBlock(cfg, name="block"), hidden)

        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                              param_dtype=cfg.param_dtype,
                              name="final_ln")(hidden)
        # pooled = hidden state at the (first) EOS token
        eos_pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(
            hidden, eos_pos[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return hidden, pooled
