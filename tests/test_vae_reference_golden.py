"""VAE numeric goldens vs a diffusers-free torch transcription of
AutoencoderKL (decode semantics at /root/reference/infer/
inference_minicpm.py:208-215, encode at /root/reference/lightcontrol/
train_lightcontrol.py:676-680).

The mirror's state_dict() uses diffusers key names and flows through
convert.load.vae_params_from_diffusers unchanged — the converted-checkpoint
path. Pins encoder moments, deterministic encode (scale/shift), decode
(unscale), and the mid-block attention. Fast tier: tiny config, f32, CPU.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from x2i_tpu.core.config import VAEConfig
from x2i_tpu.convert.load import vae_params_from_diffusers
from x2i_tpu.models.vae import AutoencoderKL

from torch_mirrors import MirrorAutoencoderKL


def _tiny_cfg():
    return VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                     latent_channels=4, norm_num_groups=4,
                     dtype=jnp.float32, param_dtype=jnp.float32)


def _pair(cfg, seed=0):
    torch.manual_seed(seed)
    mirror = MirrorAutoencoderKL(
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        latent_channels=cfg.latent_channels,
        norm_num_groups=cfg.norm_num_groups,
        scaling_factor=cfg.scaling_factor,
        shift_factor=cfg.shift_factor,
        use_mid_attention=cfg.use_mid_attention).eval()
    params = {"params": vae_params_from_diffusers(mirror.state_dict(), cfg)}
    return mirror, AutoencoderKL(cfg), params


def _nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


def test_encode_matches_reference(rng):
    cfg = _tiny_cfg()
    mirror, vae, params = _pair(cfg)
    px = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = mirror.encode_mode(torch.from_numpy(px)).numpy()
    out = vae.apply(params, _nhwc(px), method=vae.encode)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-5)


def test_decode_matches_reference(rng):
    cfg = _tiny_cfg()
    mirror, vae, params = _pair(cfg, seed=1)
    z = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = mirror.decode(torch.from_numpy(z)).numpy()
    out = vae.apply(params, _nhwc(z), method=vae.decode)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-5)


def test_decode_without_mid_attention(rng):
    """Exercises the resnet/up-sample path in isolation (the attention-free
    configuration some VAEs use)."""
    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                    latent_channels=4, norm_num_groups=4,
                    use_mid_attention=False,
                    dtype=jnp.float32, param_dtype=jnp.float32)
    mirror, vae, params = _pair(cfg, seed=2)
    z = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = mirror.decode(torch.from_numpy(z)).numpy()
    out = vae.apply(params, _nhwc(z), method=vae.decode)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-5)


def test_three_stage_odd_spatial(rng):
    """3 downsample stages + odd input sizes pin the asymmetric (0,1)
    downsample padding against torch."""
    cfg = VAEConfig(block_out_channels=(8, 8, 16), layers_per_block=1,
                    latent_channels=4, norm_num_groups=4,
                    dtype=jnp.float32, param_dtype=jnp.float32)
    mirror, vae, params = _pair(cfg, seed=3)
    px = rng.standard_normal((1, 3, 28, 36)).astype(np.float32)
    with torch.no_grad():
        ref = mirror.encode_mode(torch.from_numpy(px)).numpy()
    out = vae.apply(params, _nhwc(px), method=vae.encode)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-5)
