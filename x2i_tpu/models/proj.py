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

from typing import Any, Callable, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2i_tpu.core.config import ProjConfig
from x2i_tpu.ops.norms import layer_norm


class Proj(nn.Module):
    cfg: ProjConfig

    def setup(self):
        cfg = self.cfg
        if cfg.use_t5:
            from x2i_tpu.models.t5 import T5EncoderStack, T5Config as T5Cfg
            refiner_cfg = T5Cfg(
                d_model=cfg.input_dim, d_ff=cfg.input_dim * 4,
                d_kv=cfg.head_dim, num_heads=cfg.num_heads,
                num_layers=cfg.num_layers, layer_norm_eps=cfg.norm_eps,
                vocab_size=0, dtype=cfg.dtype, param_dtype=cfg.param_dtype)
            self.t5stack = T5EncoderStack(refiner_cfg, name="t5stack")
        if cfg.use_scale:
            self.cha_scale = self.param(
                "cha_scale",
                nn.initializers.xavier_normal(in_axis=0, out_axis=1),
                (1, cfg.in_channels, 1, 1), cfg.param_dtype)
        elif cfg.use_cnn:
            self.conv = nn.Conv(
                1, kernel_size=(cfg.kernel_size, cfg.kernel_size),
                padding="SAME", dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name="conv")
        self.ln_scale = self.param("ln_scale", nn.initializers.ones,
                                   (cfg.input_dim,), cfg.param_dtype)
        self.ln_bias = self.param("ln_bias", nn.initializers.zeros,
                                  (cfg.input_dim,), cfg.param_dtype)
        dense = lambda d, name, bias=True: nn.Dense(
            d, use_bias=bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name=name)
        self.proj_in = dense(cfg.output_dim1, "proj_in", bias=False)
        self.proj_out = dense(cfg.output_dim1, "proj_out", bias=False)
        self.pooled_out = dense(cfg.output_dim0, "pooled_out")

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, C, S, H) stacked hidden states.

        Returns:
          pooled: (B, output_dim0)  — CLIP-pooled replacement.
          prompt_embeds: (B, S, output_dim1) — T5-sequence replacement.
        """
        return self.mlp(self.mix(x))

    def mix(self, x: jnp.ndarray) -> jnp.ndarray:
        """Channel mixing: (B, C, S, H) -> (B, S, H).

        Every non-t5 mode is LINEAR over the channel axis, which is what
        lets models/qwen2.py::Qwen2LM.encode_premixed accumulate it inside
        the layer scan for long prompts (peak memory O(B,S,H) instead of
        O(B,C,S,H))."""
        cfg = self.cfg
        b, c, s, h = x.shape
        x = x.astype(cfg.dtype)

        if cfg.use_t5:
            x = self.t5stack(x.reshape(b * c, s, h)).reshape(b, c, s, h)

        if cfg.use_scale:
            return jnp.mean(self.cha_scale * x, axis=1)      # (B, S, H)
        if cfg.use_cnn:
            # torch Conv2d(C, 1, k=5, padding=2) over (S, H) spatial dims.
            xc = jnp.transpose(x, (0, 2, 3, 1))              # (B, S, H, C)
            return self.conv(xc)[..., 0]                     # (B, S, H)
        return jnp.mean(x, axis=1)

    def mlp(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """MLP3 (utils/proj.py:14-33) on the mixed (B, S, H) states."""
        cfg = self.cfg
        x = x.astype(cfg.dtype)
        # MLP3 receives norm_eps as layer_norm_eps (utils/proj.py:51).
        x = layer_norm(x, self.ln_scale, self.ln_bias, eps=cfg.norm_eps)

        x2 = self.proj_in(x)
        x2 = nn.gelu(x2, approximate=False)
        x2 = self.proj_out(x2)

        x1 = nn.gelu(x2, approximate=False)
        x1 = self.pooled_out(x1)
        pooled = jnp.mean(x1, axis=1)
        return pooled, x2


def streaming_mix_spec(cfg: ProjConfig, proj_params, num_layers: int,
                       ) -> Tuple[Dict[str, Any], Callable]:
    """Decompose Proj.mix into per-channel linear contributions for
    Qwen2LM.encode_premixed (the layer-scan-fused long-prompt path).

    Proj channels are [embeddings, layer outputs 0..L-2, final-normed]
    (models/qwen2.py::Qwen2LM.__call__), C = num_layers + 1. Every non-t5
    mix mode is linear over that axis, so the (B, C, S, H) stack never has
    to exist: each channel's contribution mix_fn(state, w_c) is accumulated
    as it is produced.

    Returns (weights, mix_fn):
      weights: {"embed": w_0, "layers": (L, ...) with the LAST entry zero
                (the last layer's raw output is not a proj channel),
                "final": w_C-1, "bias": scalar or None}
      mix_fn(x (B,S,H), w) -> f32 (B,S,H) contribution.
    """
    if cfg.use_t5:
        raise ValueError("the t5 refiner mixes across channels; "
                         "streaming mix supports scale/cnn/mean only")
    c = cfg.in_channels
    if c != num_layers + 1:
        raise ValueError(f"proj in_channels {c} != num_layers+1 "
                         f"({num_layers + 1})")
    p = proj_params["params"] if "params" in proj_params else proj_params

    if cfg.use_scale:
        w = (p["cha_scale"].reshape(c).astype(jnp.float32) / c)
        bias = None

        def mix_fn(x, wc):
            return wc * x.astype(jnp.float32)

    elif cfg.use_cnn:
        kern = p["conv"]["kernel"]                       # (k, k, C, 1)
        w = jnp.transpose(kern[..., 0], (2, 0, 1))       # (C, k, k)
        bias = p["conv"]["bias"].reshape(()).astype(jnp.float32)
        k = cfg.kernel_size
        lo = (k - 1) // 2
        hi = k - 1 - lo

        def mix_fn(x, wc):
            # single-channel 2D conv expressed as k*k shifted
            # multiply-adds: a (B,S,H,1) lax.conv pads the 1-wide channel
            # dim to the 128-lane tile (30 GiB at 32k x 3584), while
            # shifted adds stay (B, S, H) elementwise
            b, s, h = x.shape
            xf = x.astype(jnp.float32)
            xp = jnp.pad(xf, ((0, 0), (lo, hi), (lo, hi)))
            out = jnp.zeros((b, s, h), jnp.float32)
            for i in range(k):
                for j in range(k):
                    out = out + wc[i, j].astype(jnp.float32) * \
                        jax.lax.dynamic_slice(xp, (0, i, j), (b, s, h))
            return out

    else:
        w = jnp.full((c,), 1.0 / c, jnp.float32)
        bias = None

        def mix_fn(x, wc):
            return wc * x.astype(jnp.float32)

    zero_last = w[1:].at[-1].set(jnp.zeros_like(w[0]))
    weights = {"embed": w[0], "layers": zero_last, "final": w[-1],
               "bias": bias}
    return weights, mix_fn
