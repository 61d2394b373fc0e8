"""MiniCPM-o goldens vs the reference's OWN vendored torch modules.

These import the actual reference code (/root/reference/minicpm/*) via
tests/ref_loader.py (audio-IO stubs + two API-rename shims; model math
unchanged) and pin:

  * the NaViT variable-resolution path — bucketized fractional position
    ids under a patch mask, the part MiniCPM actually exercises
    (modeling_navit_siglip.py:299-362) — which the HF-square golden in
    test_minicpm.py does not cover,
  * the resampler against the reference module itself
    (resampler.py:83-189), replacing the hand-written mirror as the
    source of truth (incl. its 2D sincos table),
  * the full composite: get_vllm_embedding image_bound scatter
    (modeling_minicpmo.py:291-406) + get_omni_embedding audio_bounds
    splice (:469-619) + Qwen2 prefill -> the (B, L+1, S, H) hidden stack
    the proj consumes, from the same raw inputs.

Fast tier: tiny configs, f32, CPU.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
from x2i_tpu.convert.torch_models import (resampler_params_from_reference,
                                          siglip_params_from_hf)
from x2i_tpu.data.minicpm_vision import bounds_to_map, bucket_position_ids
from x2i_tpu.models.resampler import (Resampler, ResamplerConfig,
                                      get_2d_sincos_pos_embed)
from x2i_tpu.models.siglip import SiglipVisionConfig, SiglipVisionTransformer

PS = 7          # tiny patch size
PPS = 10        # num_patches_per_side (image_size 70 / patch 7)


def _patches_to_pixels(patches: np.ndarray) -> torch.Tensor:
    """(L, 3*ps*ps) patchify layout (c, py, px) -> the processor's packed
    (3, ps, ps*L) tensor (modeling_minicpmo.py:311-326 feeds the conv
    patches unrolled along width)."""
    L = patches.shape[0]
    x = patches.reshape(L, 3, PS, PS).transpose(1, 2, 0, 3)
    return torch.from_numpy(x.reshape(3, PS, PS * L).copy())


def _var_res_batch(rng, tgt_sizes):
    """-> (padded patches (B, L, 147), pos_ids, mask, ref pixel tensor,
    patch mask tensor, tgt tensor)."""
    per = [rng.standard_normal(
        (h * w, 3 * PS * PS)).astype(np.float32) for h, w in tgt_sizes]
    L = max(p.shape[0] for p in per)
    b = len(per)
    patches = np.zeros((b, L, 3 * PS * PS), np.float32)
    pos_ids = np.zeros((b, L), np.int32)
    mask = np.zeros((b, L), bool)
    pixels = torch.zeros((b, 3, PS, PS * L))
    for i, (p, (h, w)) in enumerate(zip(per, tgt_sizes)):
        n = p.shape[0]
        patches[i, :n] = p
        pos_ids[i, :n] = bucket_position_ids((h, w), PPS)
        mask[i, :n] = True
        pixels[i, :, :, :PS * n] = _patches_to_pixels(p)
    patch_attn = torch.from_numpy(mask)[:, None, :]
    tgt = torch.tensor(tgt_sizes, dtype=torch.int32)
    return patches, pos_ids, mask, pixels, patch_attn, tgt


def test_navit_variable_resolution_golden(rng):
    """Multi-aspect batch through the actual reference NaViT SigLIP
    (eager attention, last layer dropped as MiniCPM does,
    modeling_minicpmo.py:199-203)."""
    nav = ref_loader.load_navit_siglip()
    rcfg = nav.SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=70, patch_size=PS)
    rcfg._attn_implementation = "eager"
    torch.manual_seed(0)
    ref = nav.SiglipVisionTransformer(rcfg).eval()
    ref.encoder.layers = ref.encoder.layers[:-1]

    tgt_sizes = [(6, 10), (9, 4)]
    patches, pos_ids, mask, pixels, patch_attn, tgt = _var_res_batch(
        rng, tgt_sizes)
    with torch.no_grad():
        out_ref = ref(pixels, patch_attention_mask=patch_attn,
                      tgt_sizes=tgt).last_hidden_state.numpy()

    cfg = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=3, num_attention_heads=4,
                             image_size=70, patch_size=PS,
                             drop_last_layer=True, dtype=jnp.float32,
                             param_dtype=jnp.float32)
    params = {"params": siglip_params_from_hf(
        ref.state_dict(), cfg.effective_layers, prefix="")}
    got = SiglipVisionTransformer(cfg).apply(
        params, jnp.asarray(patches), jnp.asarray(pos_ids),
        jnp.asarray(mask))
    got = np.asarray(got)
    for i, (h, w) in enumerate(tgt_sizes):
        n = h * w
        np.testing.assert_allclose(got[i, :n], out_ref[i, :n],
                                   rtol=5e-4, atol=1e-4, err_msg=str(i))


def test_resampler_reference_golden(rng):
    """Variable-size keys through the reference Resampler itself
    (resampler.py:144-186): its own sincos cache, key-padding mask,
    packed-in-proj MultiheadAttention."""
    rs = ref_loader.load_resampler()
    torch.manual_seed(1)
    ref = rs.Resampler(num_queries=4, embed_dim=32, num_heads=4,
                       kv_dim=16, adaptive=True).eval()
    # the reference zero-inits queries and uses trunc-normal at load time;
    # randomize so the golden is not trivially zero
    with torch.no_grad():
        ref.query.normal_(0, 0.5)

    tgt_sizes = [(4, 5), (3, 4)]
    L = max(h * w for h, w in tgt_sizes)
    x = np.zeros((2, L, 16), np.float32)
    mask = np.zeros((2, L), bool)
    pos_embed = np.zeros((2, L, 32), np.float32)
    table = get_2d_sincos_pos_embed(32, 70, 70)
    for i, (h, w) in enumerate(tgt_sizes):
        n = h * w
        x[i, :n] = rng.standard_normal((n, 16)).astype(np.float32)
        mask[i, :n] = True
        pos_embed[i, :n] = table[:h, :w].reshape(n, -1)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x),
                      torch.tensor(tgt_sizes, dtype=torch.int32)).numpy()

    cfg = ResamplerConfig(num_queries=4, embed_dim=32, num_heads=4,
                          kv_dim=16, dtype=jnp.float32,
                          param_dtype=jnp.float32)
    params = {"params": resampler_params_from_reference(
        ref.state_dict(), embed_dim=32)}
    got = Resampler(cfg).apply(params, jnp.asarray(x),
                               jnp.asarray(pos_embed), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), out_ref,
                               rtol=2e-4, atol=2e-5)


def _tiny_ref_minicpmo():
    mc = ref_loader.load_minicpmo()
    import types as _t
    mc.AutoProcessor = _t.SimpleNamespace(
        from_pretrained=lambda *a, **k: None)
    cfgmod = ref_loader.load_reference_module(
        "configuration_minicpm.py", "refpkg.configuration_minicpm")
    cfg = cfgmod.MiniCPMOConfig(
        vision_config=dict(hidden_size=32, image_size=70,
                           intermediate_size=64, num_attention_heads=4,
                           num_hidden_layers=3, patch_size=PS),
        audio_config=dict(num_mel_bins=8, d_model=16, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          max_source_positions=64),
        query_num=4, init_vision=True, init_audio=True, init_tts=False,
        chunk_input=True,
        vocab_size=512, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
        intermediate_size=64, max_position_embeddings=256,
        rope_theta=1000000.0)
    cfg._attn_implementation = "eager"
    cfg.vision_config._attn_implementation = "eager"
    cfg.audio_config._attn_implementation = "eager"
    torch.manual_seed(7)
    model = mc.MiniCPMO(cfg).eval().float()
    return model, cfg


def test_minicpmo_composite_golden(rng):
    """Same raw inputs -> same (B, L+1, S, H) hidden stack: reference
    get_vllm_embedding + get_omni_embedding + Qwen2 prefill vs
    MiniCPMOEncoder with host-built scatter maps."""
    from x2i_tpu.convert.load import minicpmo_params_from_hf
    from x2i_tpu.core.config import Qwen2Config
    from x2i_tpu.models.minicpmo import MiniCPMOConfig, MiniCPMOEncoder
    from x2i_tpu.models.whisper_enc import WhisperConfig

    ref, rcfg = _tiny_ref_minicpmo()
    B, S = 2, 24

    # ---- vision: sample 0 has two variable-aspect slices, sample 1 none
    tgt_sizes = [(3, 5), (2, 4)]
    patches, pos_ids, mask, pixels, patch_attn, tgt = _var_res_batch(
        rng, tgt_sizes)
    # the reference consumes per-slice (3, ps, ps*n) tensors and flattens
    # them itself (modeling_minicpmo.py:313): hand it exactly that shape
    pixel_list = [[pixels[i, :, :, :PS * (h * w)]
                   for i, (h, w) in enumerate(tgt_sizes)], []]
    image_bound = [torch.tensor([[2, 6], [7, 11]]), torch.zeros(0, 2, dtype=torch.long)]

    # ---- audio: sample 0 has one 16-frame mel -> 8 conv frames -> 4
    # pooled tokens at bound (12, 16); sample 1 none
    mel = rng.standard_normal((1, 8, 16)).astype(np.float32)
    audio_lens = [torch.tensor([16]), torch.tensor([], dtype=torch.long)]
    audio_bounds = [torch.tensor([[12, 16]]), torch.zeros(0, 2, dtype=torch.long)]

    ids = rng.integers(5, 500, (B, S))
    data = {
        "input_ids": torch.from_numpy(ids),
        "pixel_values": pixel_list,
        "tgt_sizes": [tgt, []],
        "image_bound": image_bound,
        "audio_features": torch.from_numpy(mel),
        "audio_feature_lens": audio_lens,
        "audio_bounds": audio_bounds,
    }
    with torch.no_grad():
        emb, _ = ref.get_vllm_embedding(data)
        emb = ref.get_omni_embedding(data, input_embeddings=emb,
                                     chunk_length=-1)
        out = ref.llm.model(inputs_embeds=emb,
                            attention_mask=torch.ones((B, S), dtype=torch.long),
                            output_hidden_states=True)
        ref_stack = torch.stack(out.hidden_states, dim=1).numpy()

    # ---- mine: same tensors through the converted encoder
    vis = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=3, num_attention_heads=4,
                             image_size=70, patch_size=PS,
                             drop_last_layer=True, dtype=jnp.float32,
                             param_dtype=jnp.float32)
    aud = WhisperConfig(num_mel_bins=8, d_model=16, encoder_layers=2,
                        encoder_attention_heads=4, encoder_ffn_dim=64,
                        max_source_positions=64, dtype=jnp.float32,
                        param_dtype=jnp.float32)
    llm = Qwen2Config(vocab_size=512, hidden_size=128,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=2,
                      head_dim=64, dtype=jnp.float32,
                      param_dtype=jnp.float32,
                      use_pallas_attention=False)
    cfg = MiniCPMOConfig(vision=vis, audio=aud, llm=llm, query_num=4,
                         resampler_heads=1)
    params = {"params": minicpmo_params_from_hf(ref.state_dict(), cfg)}

    table = get_2d_sincos_pos_embed(128, 70, 70)
    pos_embed = np.zeros(patches.shape[:2] + (128,), np.float32)
    for i, (h, w) in enumerate(tgt_sizes):
        pos_embed[i, :h * w] = table[:h, :w].reshape(h * w, -1)
    vision = {"patches": jnp.asarray(patches),
              "position_ids": jnp.asarray(pos_ids),
              "patch_mask": jnp.asarray(mask),
              "pos_embed": jnp.asarray(pos_embed)}
    audio = {"mel": jnp.asarray(mel)}
    img_map = bounds_to_map([[(2, 6), (7, 11)], []], S)
    audio_map = bounds_to_map([[(12, 16)], []], S)
    attn = np.ones((B, S), bool)

    enc = MiniCPMOEncoder(cfg)
    stack = enc.apply(params, jnp.asarray(ids), jnp.asarray(attn), vision,
                      audio, jnp.asarray(img_map), jnp.asarray(audio_map))
    np.testing.assert_allclose(np.asarray(stack), ref_stack,
                               rtol=5e-4, atol=5e-5)
