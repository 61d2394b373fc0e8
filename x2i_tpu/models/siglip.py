"""SigLIP-so400m vision tower with NaViT-style variable resolution.

MiniCPM-o's `vpm` (/root/reference/minicpm/modeling_navit_siglip.py):
patch-conv embedding, *bucketized fractional* position ids under a patch
attention mask (:299-362) so arbitrary aspect ratios map onto the 70x70
position table, pre-LN encoder blocks with tanh-gelu MLP, post layernorm.
MiniCPM drops the last encoder layer (modeling_minicpmo.py:191-203).

TPU design: the data-dependent parts (position ids from tgt_sizes, patch
attention mask) are host-precomputed (data/minicpm_vision.py); the model
consumes static padded (B, S) arrays. Attention uses the shared flash/XLA
dispatcher with the padding mask.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from x2i_tpu.ops.attention import attention


@dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_channels: int = 3
    image_size: int = 980
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    drop_last_layer: bool = True     # MiniCPM: vpm minus final layer
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def effective_layers(self) -> int:
        return self.num_hidden_layers - (1 if self.drop_last_layer else 0)


class SiglipBlock(nn.Module):
    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, hidden, kv_mask):
        cfg = self.cfg
        b, s, c = hidden.shape
        h = cfg.num_attention_heads
        d = c // h
        dense = lambda feats, name: nn.Dense(
            feats, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name)
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype,
                                       name=name)

        x = ln("ln1")(hidden)
        q = dense(c, "q")(x).reshape(b, s, h, d)
        k = dense(c, "k")(x).reshape(b, s, h, d)
        v = dense(c, "v")(x).reshape(b, s, h, d)
        attn = attention(q, k, v, kv_mask=kv_mask)
        hidden = hidden + dense(c, "o")(attn.reshape(b, s, c))

        x = ln("ln2")(hidden)
        x = dense(cfg.intermediate_size, "fc1")(x)
        x = nn.gelu(x)                       # gelu_pytorch_tanh
        hidden = hidden + dense(c, "fc2")(x)
        return hidden


class SiglipVisionTransformer(nn.Module):
    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, patches: jnp.ndarray, position_ids: jnp.ndarray,
                 patch_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """
        Args:
          patches: (B, S, C*ps*ps) flattened valid-padded patch pixels in
            row-major patch order (host layout, data/minicpm_vision.py).
          position_ids: (B, S) int ids into the 70x70 bucketized table.
          patch_mask: (B, S) bool — True where the patch is real.

        Returns: (B, S, hidden) post-layernormed features (padding rows
          are garbage; the resampler masks them).
        """
        cfg = self.cfg
        b, s, _ = patches.shape
        # patch conv == Dense over the flattened patch
        hidden = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype,
                          name="patch_embedding")(patches.astype(cfg.dtype))
        pos_table = nn.Embed(cfg.num_patches_per_side ** 2, cfg.hidden_size,
                             dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                             name="position_embedding")(position_ids)
        hidden = hidden + pos_table

        def body(block, carry):
            return block(carry, patch_mask), None

        hidden, _ = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.effective_layers,
        )(SiglipBlock(cfg, name="block"), hidden)

        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name="post_layernorm")(hidden)
