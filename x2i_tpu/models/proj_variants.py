"""Legacy/experimental proj design-space variants.

Faithful flax counterparts of /root/reference/model_internvl/proj.py
(:53-211) — not used by any shipped X2I path (the production alignment net
is models/proj.py::Proj == Proj7Exp), but kept so the design-space record
carries over. All return (pooled, sequence) like the production proj.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from x2i_tpu.models.t5 import T5Config, T5EncoderStack
from x2i_tpu.ops.norms import layer_norm


def _ln(mod, name, dim, eps, param_dtype):
    w = mod.param(f"{name}_scale", nn.initializers.ones, (dim,),
                  param_dtype)
    b = mod.param(f"{name}_bias", nn.initializers.zeros, (dim,),
                  param_dtype)
    return lambda x: layer_norm(x, w, b, eps=eps)


class MLPProj(nn.Module):
    """MLP / MLP2 / MLP_plus (proj.py:53-130): LayerNorm -> no-bias GELU
    MLP stack -> (pooled head, sequence)."""
    in_dim: int
    out_dim: int
    out_dim1: int
    depth: int = 3                  # projector linear count: 3 / 3 / 6
    deep_pooled_head: bool = False  # MLP2's 3-layer fc
    eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        dense = lambda d, name, bias=True: nn.Dense(
            d, use_bias=bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        x = _ln(self, "ln", self.in_dim, self.eps, self.param_dtype)(x)
        for i in range(self.depth - 1):
            x = nn.gelu(dense(self.out_dim, f"proj_{i}", bias=False)(x),
                        approximate=False)
        x = dense(self.out_dim, f"proj_{self.depth - 1}", bias=False)(x)
        x2 = nn.gelu(x, approximate=False)
        if self.deep_pooled_head:
            h = dense(self.out_dim1, "fc_0", bias=False)(x2)
            h = nn.gelu(h, approximate=False)
            h = dense(self.out_dim1, "fc_1", bias=False)(h)
            h = nn.gelu(h, approximate=False)
            x1 = dense(self.out_dim1, "fc_2", bias=False)(h)
        else:
            x1 = dense(self.out_dim1, "fc")(x2)
        return jnp.mean(x1, axis=1), x2


class TransformerProj(nn.Module):
    """Transformer_proj (proj.py:133-148): post-LN transformer encoder +
    two linear heads."""
    d_model: int
    n_heads: int
    out_dim1: int
    out_dim2: int
    num_layers: int = 3
    ffn_dim: int = 2048
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from x2i_tpu.ops.attention import attention
        b, s, _ = x.shape
        h = self.n_heads
        d = self.d_model // h
        for i in range(self.num_layers):
            dense = lambda dd, name: nn.Dense(
                dd, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"l{i}_{name}")
            q = dense(self.d_model, "q")(x).reshape(b, s, h, d)
            k = dense(self.d_model, "k")(x).reshape(b, s, h, d)
            v = dense(self.d_model, "v")(x).reshape(b, s, h, d)
            a = attention(q, k, v).reshape(b, s, self.d_model)
            x = nn.LayerNorm(dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"l{i}_ln1")(
                x + dense(self.d_model, "o")(a))
            ff = dense(self.d_model, "fc2")(
                nn.relu(dense(self.ffn_dim, "fc1")(x)))
            x = nn.LayerNorm(dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name=f"l{i}_ln2")(x + ff)
        x1 = nn.Dense(self.out_dim1, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="linear1")(x)
        x2 = nn.Dense(self.out_dim2, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="linear2")(x)
        return jnp.mean(x1, axis=1), x2


@dataclass(frozen=True)
class LegacyProjConfig:
    in_channels: int = 2
    kernel_size: int = 5
    input_dim: int = 896
    output_dim0: int = 768
    output_dim1: int = 4096
    num_layers: int = 4
    num_heads: int = 12
    head_dim: int = 64
    eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


class LegacyProj(nn.Module):
    """Proj / Proj2 / Proj3 (proj.py:150-211): conv channel mixing + T5
    refiner + MLP head in the recorded orderings.

    variant: 'proj'  — norm0 -> conv -> norm1 -> t5 -> MLP
             'proj2' — same ordering, MLP2 head
             'proj3' — t5 per-channel FIRST, then norm0/conv/norm1 + MLP2
    """
    cfg: LegacyProjConfig
    variant: str = "proj"

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        b, c, s, h = x.shape
        t5_cfg = T5Config(d_model=cfg.input_dim, d_ff=cfg.input_dim * 4,
                          d_kv=cfg.head_dim, num_heads=cfg.num_heads,
                          num_layers=cfg.num_layers,
                          layer_norm_eps=cfg.eps, vocab_size=0,
                          dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        norm0 = _ln(self, "norm0", cfg.input_dim, cfg.eps, cfg.param_dtype)
        norm1 = _ln(self, "norm1", cfg.input_dim, cfg.eps, cfg.param_dtype)
        conv = nn.Conv(1, kernel_size=(cfg.kernel_size, cfg.kernel_size),
                       padding="SAME", dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="conv")

        def mix(z):
            return conv(jnp.transpose(z, (0, 2, 3, 1)))[..., 0]

        if self.variant == "proj3":
            x = T5EncoderStack(t5_cfg, name="t5stack")(
                x.reshape(b * c, s, h)).reshape(b, c, s, h)
            x = norm0(x)
            x = norm1(mix(x))
        else:
            x = norm1(mix(norm0(x)))
            x = T5EncoderStack(t5_cfg, name="t5stack")(x)

        head = MLPProj(cfg.input_dim, cfg.output_dim1, cfg.output_dim0,
                       depth=3,
                       deep_pooled_head=self.variant in ("proj2", "proj3"),
                       eps=cfg.eps, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="mlp")
        return head(x)
