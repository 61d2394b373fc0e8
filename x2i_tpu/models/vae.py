"""FLUX AutoencoderKL (VAE), TPU-native.

The reference uses diffusers' AutoencoderKL for encode (phase-2 target
latents, /root/reference/lightcontrol/train_lightcontrol.py:676-680) and
decode (/root/reference/infer/inference_minicpm.py:208-215, including the
`latents / scaling_factor + shift_factor` unscale). Architecture: conv
stem, 4 down/up stages of ResnetBlock2D (GroupNorm32 + silu + 3x3 conv),
a mid block with single-head spatial self-attention, 16 latent channels.

Layout: NHWC throughout (TPU-native conv layout). Callers converting from
the NCHW latent convention used by pack_latents should transpose at the
boundary (pipeline.py does).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import VAEConfig


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
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


class MidAttention(nn.Module):
    """Single-head spatial self-attention in the mid block."""
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q, k, v = dense("to_q")(y), dense("to_k")(y), dense("to_v")(y)

        # q-chunked attention: the naive einsum materializes (B, HW, HW)
        # f32 scores — 1 GB per image at the 1024^2 latent grid (16384
        # spatial tokens), which alone blew HBM at batch 2. Single-head
        # D=512 is outside the flash kernel's head sizes, so chunk the
        # softmax over query rows instead; per-chunk scores are
        # (B, 1024, HW) and the scan keeps exactly one chunk live.
        scale = 1.0 / float(np.sqrt(c))
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        n = h * w
        chunk = n
        for cand in (1024, 512, 256, 128):
            if n % cand == 0 and n > cand:
                chunk = cand
                break

        def one_chunk(qc):
            s = jnp.einsum("bqc,bkc->bqk", qc.astype(jnp.float32),
                           kf) * scale
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bqk,bkc->bqc", p, vf).astype(self.dtype)

        if chunk == n:
            o = one_chunk(q)
        else:
            qs = q.reshape(b, n // chunk, chunk, c)
            o = jax.lax.map(one_chunk, jnp.swapaxes(qs, 0, 1))
            o = jnp.swapaxes(o, 0, 1).reshape(b, n, c)
        o = dense("to_out")(o)
        return x + o.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, pixels):
        """pixels: (B, H, W, 3) in [-1, 1] -> moments (B, H/8, W/8, 2*lat)."""
        cfg = self.cfg
        ch = cfg.block_out_channels
        x = nn.Conv(ch[0], (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv_in")(pixels)
        for i, c in enumerate(ch):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(c, cfg.dtype, cfg.param_dtype,
                                cfg.norm_num_groups,
                                name=f"down_{i}_block_{j}")(x)
            if i < len(ch) - 1:
                # diffusers Downsample2D: stride-2 conv with (0,1) asym pad
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(c, (3, 3), strides=2, padding="VALID",
                            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                            name=f"down_{i}_downsample")(x)
        x = ResnetBlock(ch[-1], cfg.dtype, cfg.param_dtype,
                        cfg.norm_num_groups, name="mid_block_1")(x)
        if cfg.use_mid_attention:
            x = MidAttention(cfg.dtype, cfg.param_dtype, cfg.norm_num_groups,
                             name="mid_attn")(x)
        x = ResnetBlock(ch[-1], cfg.dtype, cfg.param_dtype,
                        cfg.norm_num_groups, name="mid_block_2")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                       name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        """z: (B, h, w, latent_channels) -> pixels (B, 8h, 8w, 3)."""
        cfg = self.cfg
        ch = cfg.block_out_channels
        x = nn.Conv(ch[-1], (3, 3), padding=1, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="conv_in")(z)
        x = ResnetBlock(ch[-1], cfg.dtype, cfg.param_dtype,
                        cfg.norm_num_groups, name="mid_block_1")(x)
        if cfg.use_mid_attention:
            x = MidAttention(cfg.dtype, cfg.param_dtype, cfg.norm_num_groups,
                             name="mid_attn")(x)
        x = ResnetBlock(ch[-1], cfg.dtype, cfg.param_dtype,
                        cfg.norm_num_groups, name="mid_block_2")(x)
        rev = tuple(reversed(ch))
        for i, c in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(c, cfg.dtype, cfg.param_dtype,
                                cfg.norm_num_groups,
                                name=f"up_{i}_block_{j}")(x)
            if i < len(rev) - 1:
                b, h, w, cc = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, cc), "nearest")
                x = nn.Conv(c, (3, 3), padding=1, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype,
                            name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6,
                         dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """encode/decode with the FLUX latent scale/shift convention."""
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode_moments(self, pixels):
        return self.encoder(pixels)

    def encode(self, pixels, rng=None):
        """-> scaled latents (B, h, w, C); deterministic (mode) if rng None."""
        moments = self.encoder(pixels)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar.astype(jnp.float32))
            mean = mean + (std * jax.random.normal(
                rng, mean.shape, jnp.float32)).astype(mean.dtype)
        return (mean - self.cfg.shift_factor) * self.cfg.scaling_factor

    def decode(self, z):
        """scaled latents -> pixels in [-1, 1]; applies
        z/scaling + shift (inference_minicpm.py:208-212).

        Batched decode runs one image at a time (barrier-chained like
        decode_tiled's tiles): the decoder's f32 GroupNorm intermediates
        at the 1024-px stages are ~3 GB per image, so concurrent
        per-image subgraphs overrun HBM at batch 2 while sequential
        decode stays at the batch-1 footprint."""
        z = z / self.cfg.scaling_factor + self.cfg.shift_factor
        if z.shape[0] == 1 or z.shape[1] * z.shape[2] <= 64 * 64:
            return self.decoder(z)
        outs, token = [], None
        for i in range(z.shape[0]):
            zi = z[i:i + 1]
            if token is not None:
                zi, _ = jax.lax.optimization_barrier((zi, token))
            out = self.decoder(zi)
            token = out
            outs.append(out)
        return jnp.concatenate(outs, axis=0)

    def decode_tiled(self, z, tile_latent: int = 64,
                     overlap: float = 0.25):
        """Tiled decode for resolutions whose decoder activations exceed
        HBM (2048² keeps ~17 GB of f32-equivalent feature maps live at
        the 1024-wide stages). Decodes overlapping latent tiles and
        linearly blends the seams — diffusers AutoencoderKL.tiled_decode
        semantics (tile 64 latents = 512 px, 25% overlap), so the same
        seam behavior users already accept. Group-norm statistics are
        per-tile, as in diffusers. A single tile that covers the whole
        latent is exactly decode()."""
        cfg = self.cfg
        z = z / cfg.scaling_factor + cfg.shift_factor
        b, h, w, c = z.shape
        if h <= tile_latent and w <= tile_latent:
            return self.decoder(z)
        stride = max(1, int(tile_latent * (1 - overlap)))
        # latent -> pixel upscale: one 2x resize per non-final up block
        scale = 2 ** (len(cfg.block_out_channels) - 1)
        tile_px = tile_latent * scale
        blend = int(tile_px * overlap)
        keep = tile_px - blend

        def blend_v(top, bot, n):
            n = min(n, top.shape[1], bot.shape[1])
            ramp = (jnp.arange(n, dtype=jnp.float32) / n)[None, :, None,
                                                          None]
            mixed = (top[:, -n:].astype(jnp.float32) * (1 - ramp)
                     + bot[:, :n].astype(jnp.float32) * ramp)
            return bot.at[:, :n].set(mixed.astype(bot.dtype))

        def blend_h(left, right, n):
            n = min(n, left.shape[2], right.shape[2])
            ramp = (jnp.arange(n, dtype=jnp.float32) / n)[None, None, :,
                                                          None]
            mixed = (left[:, :, -n:].astype(jnp.float32) * (1 - ramp)
                     + right[:, :, :n].astype(jnp.float32) * ramp)
            return right.at[:, :, :n].set(mixed.astype(right.dtype))

        rows = []
        token = None                   # chains tiles into sequential order
        for i in range(0, h, stride):
            row = []
            for j in range(0, w, stride):
                zt = z[:, i:i + tile_latent, j:j + tile_latent, :]
                if token is not None:
                    # Without a data dependency XLA schedules ALL tile
                    # decodes concurrently — their internal feature maps
                    # are live at once and 2048^2 overruns HBM by ~15x a
                    # single tile's need. The barrier makes tile n's input
                    # depend on tile n-1's output, forcing one-at-a-time
                    # liveness at the cost of no cross-tile overlap.
                    zt, _ = jax.lax.optimization_barrier((zt, token))
                tile = self.decoder(zt)
                token = tile
                row.append(tile)
            rows.append(row)
        out_rows = []
        for i, row in enumerate(rows):
            parts = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = blend_v(rows[i - 1][j], tile, blend)
                if j > 0:
                    tile = blend_h(row[j - 1], tile, blend)
                parts.append(tile[:, :keep, :keep])
            out_rows.append(jnp.concatenate(parts, axis=2))
        out = jnp.concatenate(out_rows, axis=1)
        return out[:, :h * scale, :w * scale]

    def __call__(self, pixels, rng=None):
        return self.decode(self.encode(pixels, rng))


def postprocess(pixels: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> uint8 (VaeImageProcessor.postprocess equivalent)."""
    x = jnp.clip(pixels.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    return jnp.round(x * 255.0).astype(jnp.uint8)


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 (B,H,W,3) -> [-1,1] float."""
    return images.astype(jnp.float32) / 127.5 - 1.0
