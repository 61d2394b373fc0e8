"""VAE structural tests (tiny config): shapes, scale/shift convention,
encode determinism/sampling, postprocess range."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import VAEConfig
from x2i_tpu.models.vae import AutoencoderKL, postprocess, preprocess

pytestmark = pytest.mark.slow


def tiny_vae():
    return VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                     latent_channels=4, norm_num_groups=4,
                     dtype=jnp.float32, param_dtype=jnp.float32)


def test_encode_decode_shapes(rng):
    cfg = tiny_vae()
    vae = AutoencoderKL(cfg)
    px = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    params = vae.init(jax.random.key(0), px)
    z = vae.apply(params, px, method=vae.encode)
    # 2 blocks -> 1 downsample -> /2 spatial
    assert z.shape == (1, 16, 16, cfg.latent_channels)
    out = vae.apply(params, z, method=vae.decode)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_scale_shift_roundtrip(rng):
    """decode must invert the (z - shift)*scale convention
    (inference_minicpm.py:208-212)."""
    cfg = tiny_vae()
    vae = AutoencoderKL(cfg)
    px = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    params = vae.init(jax.random.key(0), px)
    moments = vae.apply(params, px, method=vae.encode_moments)
    mean = np.asarray(moments)[..., :cfg.latent_channels]
    z = np.asarray(vae.apply(params, px, method=vae.encode))
    np.testing.assert_allclose(
        z, (mean - cfg.shift_factor) * cfg.scaling_factor, atol=1e-5)


def test_encode_sampling_differs_from_mode(rng):
    cfg = tiny_vae()
    vae = AutoencoderKL(cfg)
    px = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    params = vae.init(jax.random.key(0), px)
    z_mode = vae.apply(params, px, method=vae.encode)
    z_samp = vae.apply(params, px, jax.random.key(7), method=vae.encode)
    assert not np.allclose(np.asarray(z_mode), np.asarray(z_samp))


def test_postprocess_preprocess():
    img = np.array([[[[0, 128, 255]]]], np.uint8)
    x = preprocess(jnp.asarray(img))
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    back = postprocess(x)
    np.testing.assert_array_equal(np.asarray(back), img)


def test_tiled_decode(rng):
    """decode_tiled: exact when one tile covers the latent; matches
    diffusers tiled semantics (seam-blended, per-tile group-norm stats)
    on multi-tile inputs — same shape, finite, high agreement with the
    full decode away from numerical seams."""
    from x2i_tpu.core.config import VAEConfig
    from x2i_tpu.models.vae import AutoencoderKL

    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                    norm_num_groups=4, latent_channels=4,
                    use_mid_attention=False)
    vae = AutoencoderKL(cfg)
    z1 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    params = vae.init(jax.random.key(0), z1, method=vae.decode)

    # single-tile case is bit-exact
    full = vae.apply(params, z1, method=vae.decode)
    tiled = vae.apply(params, z1, method=vae.decode_tiled)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(tiled))

    # multi-tile: 24x24 latents with 8-latent tiles, 25% overlap
    z = jnp.asarray(rng.standard_normal((1, 24, 24, 4)), jnp.float32)
    full = vae.apply(params, z, method=vae.decode)
    tiled = vae.apply(params, z, method=vae.decode_tiled,
                      tile_latent=8)
    assert tiled.shape == full.shape == (1, 48, 48, 3)
    assert np.isfinite(np.asarray(tiled)).all()
    f, t = np.asarray(full).ravel(), np.asarray(tiled).ravel()
    corr = np.corrcoef(f, t)[0, 1]
    assert corr > 0.9, corr
