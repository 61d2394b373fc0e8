"""ControlNeXt control branch (phase-2 LightControl).

Reference: /root/reference/lightcontrol/lightcontrol_flux.py:575-749. A small
CNN that maps the 1024^2 guidance image + timestep to a 4096-token residual
added into each FLUX double block (one independently-weighted branch per
block, lightcontrol_flux.py:504-507). The 19 branches here are one module
vmapped over stacked parameters — a single batched conv program instead of
19 sequential module calls.

Structure: conv stem 3->64->64->128 (stride 2 first), GroupNorm(2)+ReLU; two
ResnetBlock2D(+time emb)+Downsample stages 128->128->256; residual mid convs;
final Conv2d 256->3072 k2 s2 => (B, 64, 64, 3072) -> 4096 tokens. NHWC.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2i_tpu.core.config import ControlNeXtConfig
from x2i_tpu.models.flux import timestep_embedding


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (default config: silu, time add after conv1)."""
    out_channels: int
    groups: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv_shortcut")(x)
        return x + h


class ControlNeXt(nn.Module):
    cfg: ControlNeXtConfig

    @nn.compact
    def __call__(self, sample: jnp.ndarray,
                 timestep: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """sample: (B, H, W, 3) guidance pixels; timestep: (B,) on the
        0..1000 scale (the DiT passes t*1000, lightcontrol_flux.py:447,505).

        Returns {"out": (B, h*w, final_out_channels), "scale": 1.0} tokens
        ready to add to the packed image stream.
        """
        cfg = self.cfg
        conv = lambda ch, name, k=3, s=1, p=1: nn.Conv(
            ch, (k, k), strides=s, padding=p, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)
        gn = lambda g, name: nn.GroupNorm(
            num_groups=g, epsilon=1e-5, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name)

        t_emb = timestep_embedding(timestep, 128).astype(cfg.dtype)
        t_emb = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype,
                         name="time_linear1")(t_emb)
        t_emb = nn.Dense(cfg.time_embed_dim, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype,
                         name="time_linear2")(nn.silu(t_emb))

        x = sample.astype(cfg.dtype)
        x = nn.relu(gn(2, "stem_norm0")(conv(64, "stem0", s=2)(x)))
        x = nn.relu(gn(2, "stem_norm1")(conv(64, "stem1")(x)))
        x = nn.relu(gn(2, "stem_norm2")(conv(128, "stem2")(x)))

        for i, (out_ch, g) in enumerate(zip(cfg.out_channels, cfg.groups)):
            x = ResnetBlock2D(out_ch, g, cfg.dtype, cfg.param_dtype,
                              name=f"res_{i}")(x, t_emb)
            x = conv(out_ch, f"down_{i}", s=2)(x)

        mid = conv(cfg.out_channels[-1], "mid0")(x)
        mid = gn(8, "mid_norm0")(nn.relu(mid))
        mid = conv(cfg.out_channels[-1], "mid1")(mid)
        mid = gn(8, "mid_norm1")(mid)
        x = x + mid

        x = nn.Conv(cfg.final_out_channels, (2, 2), strides=2,
                    padding="VALID", dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="out_conv")(x)
        b, h, w, c = x.shape
        return {"out": x.reshape(b, h * w, c), "scale": 1.0}


def init_control_bank(cfg: ControlNeXtConfig, num_controls: int,
                      rng: jax.Array, image_size: int = 64):
    """Initialize stacked parameters for `num_controls` independent
    branches: one vmap'd init over distinct keys."""
    model = ControlNeXt(cfg)
    keys = jax.random.split(rng, num_controls)
    sample = jnp.zeros((1, image_size, image_size, 3), cfg.dtype)
    t = jnp.zeros((1,), jnp.float32)
    return jax.vmap(lambda k: model.init(k, sample, t))(keys)


def apply_control_bank(cfg: ControlNeXtConfig, stacked_params,
                       sample: jnp.ndarray,
                       timestep: jnp.ndarray,
                       impl: str = "vmap") -> jnp.ndarray:
    """Run all branches on the same (sample, timestep):
    -> (num_controls, B, tokens, final_out_channels), scan-ready for the
    FLUX double blocks.

    impl: "vmap" runs the branches batched — fastest at small sizes, but
    at the real operating point (19 branches, 1024^2 guidance pixels) the
    jointly-live stem activations are ~2.4 GiB per conv site and the
    training backward OOMs a 16 GB chip. "scan" runs branches sequentially
    with per-branch rematerialization: peak memory = ONE branch's
    activations, backward recomputes them (the branch costs ~1% of the
    frozen-DiT step it feeds)."""
    model = ControlNeXt(cfg)

    def one(params):
        return model.apply(params, sample, timestep)["out"]

    if impl == "scan":
        return jax.lax.map(jax.checkpoint(one), stacked_params)
    return jax.vmap(one)(stacked_params)
