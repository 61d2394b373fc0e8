"""InternVL encoder: pixel-shuffle parity vs the torch formulation,
image-feature scatter order, hidden-stack shapes."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import torch

from x2i_tpu.core.config import (InternViTConfig, InternVLConfig,
                                 tiny_qwen2_config)
from x2i_tpu.models.internvl import (InternViT, InternVLEncoder,

                                     pixel_shuffle)

pytestmark = pytest.mark.slow


def tiny_vit(**kw):
    base = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, image_size=28, patch_size=7,
                dtype=jnp.float32, param_dtype=jnp.float32)
    base.update(kw)
    return InternViTConfig(**base)


def _torch_pixel_shuffle(x, scale):
    """The v2 shuffle from modeling_internvl_chat.py:172-187."""
    n, w, h, c = x.size()
    x = x.view(n, w, int(h * scale), int(c / scale))
    x = x.permute(0, 2, 1, 3).contiguous()
    x = x.view(n, int(h * scale), int(w * scale),
               int(c / (scale * scale)))
    return x.permute(0, 2, 1, 3).contiguous()


def test_pixel_shuffle_matches_torch(rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 0.5))
    want = _torch_pixel_shuffle(torch.tensor(x), 0.5).numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_vit_shapes(rng):
    cfg = tiny_vit()
    vit = InternViT(cfg)
    px = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
    params = vit.init(jax.random.key(0), px)
    out = vit.apply(params, px)
    assert out.shape == (2, 1 + 16, 32)     # CLS + 4x4 patches
    assert np.isfinite(np.asarray(out)).all()


def test_vit_pos_embed_interpolation(rng):
    """Non-448 input resizes position embeddings instead of crashing."""
    cfg = tiny_vit()
    vit = InternViT(cfg)
    params = vit.init(jax.random.key(0),
                      jnp.zeros((1, 28, 28, 3), jnp.float32))
    px = jnp.asarray(rng.standard_normal((1, 14, 14, 3)), jnp.float32)
    out = vit.apply(params, px)
    assert out.shape == (1, 1 + 4, 32)


def _tiny_encoder():
    vit_cfg = tiny_vit()
    llm_cfg = tiny_qwen2_config(hidden_size=32, num_attention_heads=2,
                                num_key_value_heads=2, head_dim=16,
                                intermediate_size=64)
    return InternVLConfig(vision=vit_cfg, llm=llm_cfg,
                          img_context_token_id=7, num_image_token=4)


def test_encoder_hidden_stack_and_scatter(rng):
    cfg = _tiny_encoder()
    enc = InternVLEncoder(cfg)
    B, S = 1, 16
    ids = rng.integers(10, 500, (B, S))
    ids[0, 3:7] = 7                      # 4 IMG_CONTEXT slots = 1 tile
    mask = np.ones((B, S), bool)
    px = rng.standard_normal((1, 28, 28, 3)).astype(np.float32)

    params = enc.init(jax.random.key(0), jnp.asarray(ids),
                      jnp.asarray(mask), jnp.asarray(px))
    stack = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                      jnp.asarray(px))
    assert stack.shape == (B, cfg.llm.num_hidden_layers + 1, S,
                           cfg.llm.hidden_size)

    # channel 0 = input embeddings; at IMG positions they must equal the
    # extracted image features, in order
    feats = enc.apply(params, jnp.asarray(px),
                      method=InternVLEncoder.extract_feature)
    emb0 = np.asarray(stack)[0, 0]
    np.testing.assert_allclose(emb0[3:7], np.asarray(feats).reshape(-1, 32),
                               atol=1e-5)

    # different image -> different hidden states; text-only path also works
    px2 = jnp.asarray(rng.standard_normal((1, 28, 28, 3)), jnp.float32)
    stack2 = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask), px2)
    assert not np.allclose(np.asarray(stack), np.asarray(stack2))
    text_only = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    assert text_only.shape == stack.shape


def test_encoder_batched_tiles_match_serial(rng):
    """Batched multimodal encode (convert/load.py internvl
    encoder_batch_fn): all requests' tiles concatenated into ONE ViT
    call + one (N, S) prefill must equal per-request serial encodes —
    the flat cumsum scatter routes tile features to rows strictly by
    request order, and a text-only row in the middle must not shift the
    mapping. Rows have different tile counts (1 and 2): correctness
    does not require equal counts, only untruncated spans."""
    cfg = _tiny_encoder()
    enc = InternVLEncoder(cfg)
    S = 16
    rows = []
    for n_tiles in (1, 0, 2):
        ids = rng.integers(10, 500, (1, S))
        if n_tiles:
            ids[0, 3:3 + 4 * n_tiles] = 7
        px = (rng.standard_normal((n_tiles, 28, 28, 3)).astype(np.float32)
              if n_tiles else None)
        rows.append((ids, np.ones((1, S), bool), px))

    ids_all = np.concatenate([r[0] for r in rows], 0)
    mask_all = np.concatenate([r[1] for r in rows], 0)
    px_all = np.concatenate([r[2] for r in rows if r[2] is not None], 0)
    params = enc.init(jax.random.key(0), jnp.asarray(ids_all),
                      jnp.asarray(mask_all), jnp.asarray(px_all))

    batched = enc.apply(params, jnp.asarray(ids_all),
                        jnp.asarray(mask_all), jnp.asarray(px_all))
    serial = jnp.concatenate(
        [enc.apply(params, jnp.asarray(ids), jnp.asarray(mask),
                   None if px is None else jnp.asarray(px))
         for ids, mask, px in rows], axis=0)
    np.testing.assert_allclose(np.asarray(batched, np.float32),
                               np.asarray(serial, np.float32),
                               atol=2e-4, rtol=2e-4)
