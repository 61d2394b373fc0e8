"""T5 v1.1 encoder stack.

Two roles, mirroring the reference: (a) the frozen T5-XXL teacher text
encoder whose sequence embeds the proj is distilled to replace
(/root/reference/train/train_minicpm.py:791-792), and (b) the optional
`use_t5` refiner inside the proj (/root/reference/utils/proj.py:41-46,
T5Stack over inputs_embeds).

T5 specifics honored: RMS-style LayerNorm without bias or mean-centering,
no 1/sqrt(d) attention scaling, bucketed relative position bias computed in
the first block and shared by all layers, gated-gelu FF (wi_0 * gelu_new,
wi_1), untied per-block weights run under nn.scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2i_tpu.ops.attention import attention
from x2i_tpu.ops.norms import rms_norm


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096              # t5-xxl
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16


def relative_position_bucket(relative_position: jnp.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """Bidirectional T5 bucketing (HF T5Attention._relative_position_bucket)."""
    num_buckets //= 2
    ret = jnp.where(relative_position > 0, num_buckets, 0)
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Norm(nn.Module):
    eps: float = 1e-6
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype)
        return rms_norm(x, w, self.eps)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, hidden, position_bias, kv_mask):
        cfg = self.cfg
        b, s, _ = hidden.shape
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)

        x = T5Norm(cfg.layer_norm_eps, cfg.param_dtype, name="attn_norm")(
            hidden)
        q = dense(inner, "q")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = dense(inner, "k")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = dense(inner, "v")(x).reshape(b, s, cfg.num_heads, cfg.d_kv)
        attn = attention(q, k, v, kv_mask=kv_mask, scale=1.0,
                         bias=position_bias)
        hidden = hidden + dense(cfg.d_model, "o")(attn.reshape(b, s, inner))

        x = T5Norm(cfg.layer_norm_eps, cfg.param_dtype, name="ff_norm")(
            hidden)
        gelu = nn.gelu(dense(cfg.d_ff, "wi_0")(x))   # gelu_new == tanh approx
        hidden = hidden + dense(cfg.d_model, "wo")(
            gelu * dense(cfg.d_ff, "wi_1")(x))
        return hidden


class T5EncoderStack(nn.Module):
    """Encoder over inputs_embeds (the proj refiner entry point)."""
    cfg: T5Config

    @nn.compact
    def __call__(self, inputs_embeds: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        b, s, _ = inputs_embeds.shape

        rel = (jnp.arange(s)[None, :] - jnp.arange(s)[:, None])
        buckets = relative_position_bucket(
            rel, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        bias_table = self.param(
            "rel_bias", nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            cfg.param_dtype)
        position_bias = jnp.transpose(
            bias_table[buckets], (2, 0, 1))[None]    # (1, H, S, S)

        def body(block, carry):
            return block(carry, position_bias, attention_mask), None

        hidden, _ = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
        )(T5Block(cfg, name="block"), inputs_embeds)

        return T5Norm(cfg.layer_norm_eps, cfg.param_dtype,
                      name="final_norm")(hidden)


class T5Encoder(nn.Module):
    """Token-id entry point (the teacher text encoder)."""
    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None):
        emb = nn.Embed(self.cfg.vocab_size, self.cfg.d_model,
                       dtype=self.cfg.dtype,
                       param_dtype=self.cfg.param_dtype,
                       name="shared")(input_ids)
        return T5EncoderStack(self.cfg, name="encoder")(emb, attention_mask)
