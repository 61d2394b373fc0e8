"""InternVL2.5 encoder stack: InternViT-300M + pixel-shuffle mlp1 + Qwen2 LM.

Reference: /root/reference/model_internvl/internvl/modeling_intern_vit.py
(ViT) and modeling_internvl_chat.py (composite). X2I's modified `generate`
never decodes — it scatters ViT features into the token embeddings at
`<IMG_CONTEXT>` positions and runs ONE LM forward returning all per-layer
hidden states (modeling_internvl_chat.py:313-363). Here that is a single
jitted function; the data-dependent scatter becomes a cumsum gather+where
with static shapes.

ViT details honored: CLS token + learned position embeddings (bicubic
resize for non-448 inputs), fused qkv with bias, optional qk RMSNorm over
the flattened head dims, LayerNorm (300M) blocks with learnable per-channel
residual scales ls1/ls2, no final norm; feature = last_hidden_state minus
CLS -> 0.5 pixel-shuffle -> LN+Linear+GELU+Linear (mlp1) -> 256 tokens/tile.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2i_tpu.core.config import InternViTConfig, InternVLConfig
from x2i_tpu.models.qwen2 import Qwen2LM
from x2i_tpu.ops.attention import attention
from x2i_tpu.ops.norms import rms_norm


class InternViTBlock(nn.Module):
    cfg: InternViTConfig

    @nn.compact
    def __call__(self, hidden):
        cfg = self.cfg
        b, s, c = hidden.shape
        h = cfg.num_attention_heads
        d = c // h
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=cfg.dtype,
                                       param_dtype=cfg.param_dtype, name=name)

        x = ln("norm1")(hidden)
        qkv = nn.Dense(3 * c, use_bias=cfg.qkv_bias, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if cfg.qk_normalization:
            # RMSNorm over the full flattened head dims (InternAttention)
            q_scale = self.param("q_norm_scale", nn.initializers.ones, (c,),
                                 cfg.param_dtype)
            k_scale = self.param("k_norm_scale", nn.initializers.ones, (c,),
                                 cfg.param_dtype)
            q = rms_norm(q, q_scale, cfg.layer_norm_eps)
            k = rms_norm(k, k_scale, cfg.layer_norm_eps)
        attn = attention(q.reshape(b, s, h, d), k.reshape(b, s, h, d),
                         v.reshape(b, s, h, d))
        attn = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name="proj")(attn.reshape(b, s, c))
        ls1 = self.param("ls1", nn.initializers.constant(
            cfg.initializer_factor), (c,), cfg.param_dtype)
        hidden = hidden + attn * ls1.astype(attn.dtype)

        x = ln("norm2")(hidden)
        x = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(c, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="fc2")(x)
        ls2 = self.param("ls2", nn.initializers.constant(
            cfg.initializer_factor), (c,), cfg.param_dtype)
        return hidden + x * ls2.astype(x.dtype)


def _torch_bicubic_weights(in_size: int, out_size: int):
    """(out_size, in_size) interpolation matrix reproducing torch
    F.interpolate(mode='bicubic', align_corners=False, antialias=False):
    source coord (i+0.5)*in/out-0.5, 4-tap cubic convolution kernel with
    A=-0.75, border-replicated taps."""
    import numpy as np
    A = -0.75

    def k(x):
        x = abs(x)
        if x <= 1:
            return ((A + 2) * x - (A + 3)) * x * x + 1
        if x < 2:
            return (((x - 5) * x + 8) * x - 4) * A
        return 0.0

    w = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        coord = (i + 0.5) * scale - 0.5
        t0 = int(np.floor(coord))
        for tap in range(t0 - 1, t0 + 3):
            w[i, min(max(tap, 0), in_size - 1)] += k(coord - tap)
    return w


class InternViT(nn.Module):
    cfg: InternViTConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: (B, H, W, 3) normalized -> (B, 1+N, hidden)."""
        cfg = self.cfg
        b = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size,
                          (cfg.patch_size, cfg.patch_size),
                          strides=cfg.patch_size, padding="VALID",
                          dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                          name="patch_embedding")(
            pixel_values.astype(cfg.dtype))
        gh, gw = patches.shape[1], patches.shape[2]
        patches = patches.reshape(b, gh * gw, cfg.hidden_size)

        cls = self.param("class_embedding", nn.initializers.normal(1.0),
                         (1, 1, cfg.hidden_size), cfg.param_dtype)
        base = cfg.image_size // cfg.patch_size
        pos = self.param("position_embedding", nn.initializers.normal(1.0),
                         (1, base * base + 1, cfg.hidden_size),
                         cfg.param_dtype)
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (base, base):
            # torch F.interpolate(mode='bicubic', align_corners=False)
            # semantics (modeling_intern_vit.py:154-160): fixed 4-tap
            # cubic kernel, NO antialiasing on downscale (jax.image.resize
            # antialiases, which drifts the table ~20% on 2x downscale).
            # Weights are static per (gh, gw) -> host numpy, two matmuls.
            grid = pos_patch.astype(jnp.float32).reshape(
                base, base, cfg.hidden_size)
            wh = jnp.asarray(_torch_bicubic_weights(base, gh))
            ww = jnp.asarray(_torch_bicubic_weights(base, gw))
            grid = jnp.einsum("ou,uvc,pv->opc", wh, grid, ww)
            pos_patch = grid.reshape(1, gh * gw, cfg.hidden_size)
        hidden = jnp.concatenate(
            [cls.astype(cfg.dtype) + jnp.zeros((b, 1, cfg.hidden_size),
                                               cfg.dtype),
             patches], axis=1)
        hidden = hidden + jnp.concatenate(
            [pos_cls, pos_patch], axis=1).astype(cfg.dtype)

        def body(block, carry):
            return block(carry), None

        hidden, _ = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_hidden_layers,
        )(InternViTBlock(cfg, name="block"), hidden)
        return hidden


def pixel_shuffle(x: jnp.ndarray, scale: float = 0.5) -> jnp.ndarray:
    """(B, W, H, C) -> (B, W*s, H*s, C/s^2), ps_version='v2'
    (modeling_internvl_chat.py:172-187)."""
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale), int(c / scale))
    x = jnp.transpose(x, (0, 2, 1, 3))
    x = x.reshape(n, int(h * scale), int(w * scale),
                  int(c / (scale * scale)))
    return jnp.transpose(x, (0, 2, 1, 3))


class InternVLEncoder(nn.Module):
    """The X2I conditioning encoder: image tiles + token ids -> per-layer
    hidden-state stack (B, L+1, S, H) for the proj."""
    cfg: InternVLConfig

    def setup(self):
        self.vision_model = InternViT(self.cfg.vision)
        self.language_model = Qwen2LM(self.cfg.llm)
        vit_out = int(self.cfg.vision.hidden_size
                      / (self.cfg.downsample_ratio ** 2))
        llm_h = self.cfg.llm.hidden_size
        dt, pdt = self.cfg.vision.dtype, self.cfg.vision.param_dtype
        self.mlp1_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt,
                                      param_dtype=pdt, name="mlp1_norm")
        self.mlp1_fc1 = nn.Dense(llm_h, dtype=dt, param_dtype=pdt,
                                 name="mlp1_fc1")
        self.mlp1_fc2 = nn.Dense(llm_h, dtype=dt, param_dtype=pdt,
                                 name="mlp1_fc2")

    def extract_feature(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(T, H, W, 3) tiles -> (T, num_image_token, llm_hidden)."""
        vit = self.vision_model(pixel_values)[:, 1:, :]      # drop CLS
        hw = int(vit.shape[1] ** 0.5)
        vit = vit.reshape(vit.shape[0], hw, hw, -1)
        vit = pixel_shuffle(vit, self.cfg.downsample_ratio)
        vit = vit.reshape(vit.shape[0], -1, vit.shape[-1])
        x = self.mlp1_norm(vit)
        x = self.mlp1_fc1(x)
        x = nn.gelu(x, approximate=False)
        return self.mlp1_fc2(x)

    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray,
                 pixel_values: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        """Returns the hidden-state stack (B, L+1, S, llm_hidden).

        pixel_values: optional (T, H, W, 3) image tiles whose features fill
        the `<IMG_CONTEXT>` (img_context_token_id) positions of input_ids in
        order (modeling_internvl_chat.py:331-344).
        """
        embeds = self.language_model.embed(input_ids)
        if pixel_values is not None:
            vit_embeds = self.extract_feature(pixel_values)
            b, s, c = embeds.shape
            flat = embeds.reshape(b * s, c)
            ids = input_ids.reshape(b * s)
            selected = ids == self.cfg.img_context_token_id
            # k-th selected position takes vit row k (order-preserving fill)
            order = jnp.cumsum(selected.astype(jnp.int32)) - 1
            vit_flat = vit_embeds.reshape(-1, c)
            gathered = vit_flat[jnp.clip(order, 0, vit_flat.shape[0] - 1)]
            flat = jnp.where(selected[:, None], gathered.astype(flat.dtype),
                             flat)
            embeds = flat.reshape(b, s, c)
        all_hidden, _ = self.language_model(
            inputs_embeds=embeds, attention_mask=attention_mask)
        return all_hidden
