"""MiniCPM-o stack golden tests: SigLIP vs HF, Whisper vs HF, mel features
vs HF WhisperFeatureExtractor, resampler vs torch reference mirror,
composite scatter maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from x2i_tpu.convert.torch_models import (resampler_params_from_reference,
                                          siglip_params_from_hf,
                                          whisper_params_from_hf)
from x2i_tpu.data.minicpm_vision import (audio_placeholder_len,
                                         bounds_to_map,
                                         bucket_position_ids,
                                         log_mel_spectrogram,
                                         patchify_siglip,
                                         prepare_minicpm_vision, slice_image)
from x2i_tpu.models.resampler import (Resampler, ResamplerConfig,
                                      get_2d_sincos_pos_embed)
from x2i_tpu.models.siglip import SiglipVisionConfig, SiglipVisionTransformer
from x2i_tpu.models.whisper_enc import (AudioProjector, WhisperConfig,

                                        WhisperEncoder)

pytestmark = pytest.mark.slow


def test_siglip_matches_hf(rng):
    from transformers import SiglipVisionConfig as HFSVC, SiglipVisionModel
    torch.manual_seed(0)
    hf_cfg = HFSVC(hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   image_size=28, patch_size=7,
                   hidden_act="gelu_pytorch_tanh",
                   attn_implementation="eager")
    hf = SiglipVisionModel(hf_cfg).eval().float()

    cfg = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=28, patch_size=7,
                             drop_last_layer=False, dtype=jnp.float32,
                             param_dtype=jnp.float32)
    params = {"params": siglip_params_from_hf(
        hf.state_dict(), 2, prefix="vision_model.")}

    from PIL import Image
    img = Image.fromarray((rng.random((28, 28, 3)) * 255).astype(np.uint8))
    px = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
    with torch.no_grad():
        want = hf(torch.tensor(px.transpose(2, 0, 1)[None])
                  ).last_hidden_state.numpy()

    patches, tgt = patchify_siglip(img, patch_size=7)
    pos_ids = bucket_position_ids(tgt, num_patches_per_side=4)
    got = SiglipVisionTransformer(cfg).apply(
        params, jnp.asarray(patches[None]), jnp.asarray(pos_ids[None]),
        jnp.ones((1, patches.shape[0]), bool))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_whisper_matches_hf(rng):
    from transformers import WhisperConfig as HFWC
    from transformers.models.whisper.modeling_whisper import WhisperEncoder \
        as HFWhisperEncoder
    torch.manual_seed(0)
    hf_cfg = HFWC(num_mel_bins=8, d_model=16, encoder_layers=2,
                  encoder_attention_heads=4, encoder_ffn_dim=32,
                  max_source_positions=64, attn_implementation="eager")
    hf = HFWhisperEncoder(hf_cfg).eval().float()

    cfg = WhisperConfig(num_mel_bins=8, d_model=16, encoder_layers=2,
                        encoder_attention_heads=4, encoder_ffn_dim=32,
                        max_source_positions=64, dtype=jnp.float32,
                        param_dtype=jnp.float32)
    params = {"params": whisper_params_from_hf(hf.state_dict(), 2)}

    mel = rng.standard_normal((1, 8, 128)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(mel)).last_hidden_state.numpy()
    got = WhisperEncoder(cfg).apply(params, jnp.asarray(mel))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_mel_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor(feature_size=80)
    sr = 16000
    t = np.arange(sr * 2) / sr
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    want = fe(wave, sampling_rate=sr, return_tensors="np",
              padding="max_length").input_features[0]
    got = log_mel_spectrogram(wave)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


class _TorchResampler(torch.nn.Module):
    """Mirror of reference Resampler forward (resampler.py:146-186) using
    torch MultiheadAttention."""

    def __init__(self, q, d, heads, kv_dim):
        super().__init__()
        self.query = torch.nn.Parameter(torch.randn(q, d) * 0.02)
        self.kv_proj = torch.nn.Linear(kv_dim, d, bias=False)
        self.attn = torch.nn.MultiheadAttention(d, heads)
        self.ln_q = torch.nn.LayerNorm(d, eps=1e-6)
        self.ln_kv = torch.nn.LayerNorm(d, eps=1e-6)
        self.ln_post = torch.nn.LayerNorm(d, eps=1e-6)
        self.proj = torch.nn.Parameter(d ** -0.5 * torch.randn(d, d))

    def forward(self, x, pos_embed, key_padding_mask):
        bs = x.shape[0]
        x = self.kv_proj(x)
        x = self.ln_kv(x).permute(1, 0, 2)
        q = self.ln_q(self.query)
        out = self.attn(q.unsqueeze(1).repeat(1, bs, 1),
                        x + pos_embed.permute(1, 0, 2), x,
                        key_padding_mask=key_padding_mask)[0]
        x = out.permute(1, 0, 2)
        return self.ln_post(x) @ self.proj


def test_resampler_matches_torch_reference(rng):
    torch.manual_seed(0)
    Q, D, H, KV, B, L = 4, 16, 4, 8, 2, 10
    tm = _TorchResampler(Q, D, H, KV).eval().float()
    x = rng.standard_normal((B, L, KV)).astype(np.float32)
    pos = rng.standard_normal((B, L, D)).astype(np.float32)
    pad = np.zeros((B, L), bool)
    pad[:, 7:] = True                     # torch: True = masked
    with torch.no_grad():
        want = tm(torch.tensor(x), torch.tensor(pos),
                  torch.tensor(pad)).numpy()

    cfg = ResamplerConfig(num_queries=Q, embed_dim=D, num_heads=H,
                          kv_dim=KV, dtype=jnp.float32,
                          param_dtype=jnp.float32)
    params = {"params": resampler_params_from_reference(
        tm.state_dict(), D)}
    got = Resampler(cfg).apply(params, jnp.asarray(x), jnp.asarray(pos),
                               kv_mask=jnp.asarray(~pad))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_slice_image_single():
    from PIL import Image
    img = Image.new("RGB", (512, 512))
    slices = slice_image(img, max_slice_nums=1)
    assert len(slices) == 1
    w, h = slices[0].size
    assert w % 14 == 0 and h % 14 == 0


def test_slice_image_grid():
    from PIL import Image
    img = Image.new("RGB", (1344, 448))
    slices = slice_image(img, max_slice_nums=9)
    assert len(slices) >= 2           # source + grid tiles


def test_prepare_vision_and_bounds(rng):
    from PIL import Image
    img = Image.fromarray((rng.random((56, 56, 3)) * 255).astype(np.uint8))
    v = prepare_minicpm_vision([img], llm_hidden=16, max_slice_nums=1,
                               patch_size=14, num_patches_per_side=4,
                               max_size=8, scale_resolution=56)
    assert v["patches"].shape[0] == 1
    assert v["patch_mask"].all()
    m = bounds_to_map([[(2, 6), (8, 12)]], 16)
    assert m.shape == (1, 16)
    np.testing.assert_array_equal(m[0, 2:6], [0, 1, 2, 3])
    np.testing.assert_array_equal(m[0, 8:12], [4, 5, 6, 7])
    assert (m[0, :2] == -1).all() and (m[0, 6:8] == -1).all()


def test_audio_placeholder_len():
    # 1s @ 16kHz: 100 frames -> conv /2 -> 50 -> pool /2 -> 25
    assert audio_placeholder_len(16000) == 25


def test_minicpmo_composite(rng):
    from x2i_tpu.core.config import tiny_qwen2_config
    from x2i_tpu.models.minicpmo import MiniCPMOConfig, MiniCPMOEncoder
    from PIL import Image
    vis = SiglipVisionConfig(hidden_size=16, intermediate_size=32,
                             num_hidden_layers=2, num_attention_heads=4,
                             image_size=28, patch_size=7,
                             drop_last_layer=True, dtype=jnp.float32,
                             param_dtype=jnp.float32)
    aud = WhisperConfig(num_mel_bins=8, d_model=16, encoder_layers=1,
                        encoder_attention_heads=4, encoder_ffn_dim=32,
                        max_source_positions=64, dtype=jnp.float32,
                        param_dtype=jnp.float32)
    llm = tiny_qwen2_config(hidden_size=32, num_attention_heads=2,
                            num_key_value_heads=2, head_dim=16,
                            intermediate_size=64)
    cfg = MiniCPMOConfig(vision=vis, audio=aud, llm=llm, query_num=4,
                         resampler_heads=4)
    enc = MiniCPMOEncoder(cfg)

    img = Image.fromarray((rng.random((28, 28, 3)) * 255).astype(np.uint8))
    v = prepare_minicpm_vision([img], llm_hidden=32, max_slice_nums=1,
                               patch_size=7, num_patches_per_side=4,
                               max_size=8, scale_resolution=28)
    vision = {k: jnp.asarray(v[k]) for k in
              ("patches", "position_ids", "patch_mask", "pos_embed")}
    mel = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    audio = {"mel": mel}
    S = 24
    ids = rng.integers(20, 400, (1, S))
    img_map = bounds_to_map([[(2, 6)]], S)      # 4 query tokens
    # audio: T=32 -> conv /2 = 16 -> pool /2 = 8 tokens
    audio_map = bounds_to_map([[(10, 18)]], S)
    mask = np.ones((1, S), bool)

    params = enc.init(jax.random.key(0), jnp.asarray(ids),
                      jnp.asarray(mask), vision, audio,
                      jnp.asarray(img_map), jnp.asarray(audio_map))
    stack = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask), vision,
                      audio, jnp.asarray(img_map), jnp.asarray(audio_map))
    assert stack.shape == (1, llm.num_hidden_layers + 1, S, 32)
    assert np.isfinite(np.asarray(stack)).all()

    # embeddings channel: image positions == resampled image tokens
    feats = enc.apply(params, vision, method=MiniCPMOEncoder.encode_images)
    np.testing.assert_allclose(np.asarray(stack)[0, 0, 2:6],
                               np.asarray(feats)[:4], atol=1e-5)
    # text-only path
    t_only = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    assert t_only.shape == stack.shape
