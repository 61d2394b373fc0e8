"""Alignment network ("proj") — the only trained phase-1 component.

Faithful re-implementation of Proj7Exp + MLP3
(/root/reference/utils/proj.py:14-96): input is the stacked per-layer MLLM
hidden states (B, C=layers+1, S=512, H=mllm_hidden); channels are mixed by a
learned per-layer scale, a 5x5 Conv2d(C->1), or a mean; then an MLP produces
the T5-replacement sequence embeds (B, 512, 4096) and the CLIP-replacement
pooled embeds (B, 768).

Shipped checkpoints use use_t5=False (SURVEY.md §2.2); the optional T5-style
refiner stack is available behind `use_t5` once models/t5.py lands.

Note: torch nn.GELU defaults to the exact erf form — `approximate=False`
here, unlike the DiT's tanh-approximate MLPs.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from x2i_tpu.core.config import ProjConfig
from x2i_tpu.ops.norms import layer_norm


class Proj(nn.Module):
    cfg: ProjConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, C, S, H) stacked hidden states.

        Returns:
          pooled: (B, output_dim0)  — CLIP-pooled replacement.
          prompt_embeds: (B, S, output_dim1) — T5-sequence replacement.
        """
        cfg = self.cfg
        b, c, s, h = x.shape
        x = x.astype(cfg.dtype)

        if cfg.use_t5:
            from x2i_tpu.models.t5 import T5EncoderStack, T5Config as T5Cfg
            refiner_cfg = T5Cfg(
                d_model=cfg.input_dim, d_ff=cfg.input_dim * 4,
                d_kv=cfg.head_dim, num_heads=cfg.num_heads,
                num_layers=cfg.num_layers, layer_norm_eps=cfg.norm_eps,
                vocab_size=0, dtype=cfg.dtype, param_dtype=cfg.param_dtype)
            x = T5EncoderStack(refiner_cfg, name="t5stack")(
                x.reshape(b * c, s, h)).reshape(b, c, s, h)

        if cfg.use_scale:
            cha_scale = self.param(
                "cha_scale",
                nn.initializers.xavier_normal(in_axis=0, out_axis=1),
                (1, cfg.in_channels, 1, 1), cfg.param_dtype)
            x = jnp.mean(cha_scale * x, axis=1)              # (B, S, H)
        elif cfg.use_cnn:
            # torch Conv2d(C, 1, k=5, padding=2) over (S, H) spatial dims.
            xc = jnp.transpose(x, (0, 2, 3, 1))              # (B, S, H, C)
            xc = nn.Conv(1, kernel_size=(cfg.kernel_size, cfg.kernel_size),
                         padding="SAME", dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="conv")(xc)
            x = xc[..., 0]                                   # (B, S, H)
        else:
            x = jnp.mean(x, axis=1)

        # MLP3 (utils/proj.py:14-33).
        ln_w = self.param("ln_scale", nn.initializers.ones,
                          (cfg.input_dim,), cfg.param_dtype)
        ln_b = self.param("ln_bias", nn.initializers.zeros,
                          (cfg.input_dim,), cfg.param_dtype)
        # MLP3 receives norm_eps as layer_norm_eps (utils/proj.py:51).
        x = layer_norm(x, ln_w, ln_b, eps=cfg.norm_eps)

        dense = lambda d, name, bias=True: nn.Dense(
            d, use_bias=bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name)
        x2 = dense(cfg.output_dim1, "proj_in", bias=False)(x)
        x2 = nn.gelu(x2, approximate=False)
        x2 = dense(cfg.output_dim1, "proj_out", bias=False)(x2)

        x1 = nn.gelu(x2, approximate=False)
        x1 = dense(cfg.output_dim0, "pooled_out")(x1)
        pooled = jnp.mean(x1, axis=1)
        return pooled, x2
