"""Perceiver resampler: 64 learned queries cross-attend the ViT patches.

Reference: /root/reference/minicpm/resampler.py:83-189 — single
cross-attention (torch MultiheadAttention semantics: packed in-proj,
out-proj with bias), 2D sincos position embeddings added to the KEYS only,
key-padding mask, ln_q/ln_kv pre-norms, ln_post + learned out-projection
matrix. The per-sample pos-embed slicing/padding is host-side
(data/minicpm_vision.py sincos_pos_embed), the model is static-shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from x2i_tpu.ops.attention import attention


def get_2d_sincos_pos_embed(embed_dim: int, h: int, w: int) -> np.ndarray:
    """(h, w, embed_dim) numpy table (resampler.py:32-80).

    Axis order matters on non-square slices: the reference's meshgrid
    puts the COLUMN (w) coordinate in grid[0], so the first half of the
    embedding encodes w and the second half h (resampler.py:46,56-58 —
    the `emb_h` variable there is actually built from the w coordinate).
    Pinned by tests/test_minicpm_reference_golden.py against the
    reference module itself."""
    def one_axis(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("hw,d->hwd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32))
    emb_first = one_axis(embed_dim // 2, grid_w)
    emb_second = one_axis(embed_dim // 2, grid_h)
    return np.concatenate([emb_first, emb_second], axis=-1)


@dataclass(frozen=True)
class ResamplerConfig:
    num_queries: int = 64
    embed_dim: int = 3584            # LLM hidden (MiniCPM: Qwen2-7B)
    num_heads: int = 28
    kv_dim: int = 1152               # SigLIP hidden
    layer_norm_eps: float = 1e-6
    max_size: int = 70
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16


class Resampler(nn.Module):
    cfg: ResamplerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_embed: jnp.ndarray,
                 kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """
        Args:
          x: (B, L, kv_dim) ViT features (padded).
          pos_embed: (B, L, embed_dim) per-sample sincos table slices.
          kv_mask: (B, L) bool, True = valid patch.

        Returns: (B, num_queries, embed_dim).
        """
        cfg = self.cfg
        b, l, _ = x.shape
        d = cfg.embed_dim
        h = cfg.num_heads
        hd = d // h
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype,
                                       name=name)

        query = self.param("query", nn.initializers.zeros,
                           (cfg.num_queries, d), cfg.param_dtype)
        if cfg.kv_dim != d:
            x = nn.Dense(d, use_bias=False, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="kv_proj")(x)
        x = ln("ln_kv")(x)
        q = ln("ln_q")(query.astype(cfg.dtype))

        # torch MultiheadAttention: packed qkv in-proj + out-proj w/ bias;
        # keys get pos_embed added, values do not (resampler.py:168-173)
        dense = lambda feats, name: nn.Dense(
            feats, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)
        qh = dense(d, "in_proj_q")(q)[None].repeat(b, axis=0)
        kh = dense(d, "in_proj_k")(x + pos_embed.astype(x.dtype))
        vh = dense(d, "in_proj_v")(x)
        out = attention(qh.reshape(b, cfg.num_queries, h, hd),
                        kh.reshape(b, l, h, hd),
                        vh.reshape(b, l, h, hd), kv_mask=kv_mask)
        out = dense(d, "out_proj")(out.reshape(b, cfg.num_queries, d))

        out = ln("ln_post")(out)
        proj = self.param("proj", nn.initializers.normal(d ** -0.5),
                          (d, d), cfg.param_dtype)
        return out @ proj.astype(out.dtype)
