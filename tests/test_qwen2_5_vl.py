"""Golden tests: Qwen2.5-VL encoder vs HF transformers (tiny random model):
vision tower features, M-RoPE tables, rope-index computation, and the full
multimodal hidden-state stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from x2i_tpu.convert.torch_models import (qwen2_5_vl_vision_params_from_hf,
                                          qwen2_params_from_hf)
from x2i_tpu.core.config import Qwen2Config
from x2i_tpu.data.qwen_vision import (get_rope_index, prepare_vision_inputs,
                                      preprocess_image, smart_resize)
from x2i_tpu.models.qwen2_5_vl import (Qwen2_5_VLConfig, Qwen2_5_VLEncoder,

                                       QwenVisionConfig,
                                       QwenVisionTransformer, mrope_tables)

pytestmark = pytest.mark.slow

VIS_KW = dict(depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
              patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
              window_size=16, out_hidden_size=48,
              fullatt_block_indexes=[1])


@pytest.fixture(scope="module")
def hf_model():
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLConfig as HFCfg, Qwen2_5_VLForConditionalGeneration)
    torch.manual_seed(0)
    cfg = HFCfg(
        vision_config=dict(**VIS_KW, in_channels=3),
        text_config=dict(
            vocab_size=512, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1e6, rms_norm_eps=1e-6,
            max_position_embeddings=256, tie_word_embeddings=True,
            rope_scaling={"type": "mrope", "mrope_section": [1, 2, 3]}),
        image_token_id=7, video_token_id=8, vision_start_token_id=9,
        attn_implementation="eager")
    return Qwen2_5_VLForConditionalGeneration(cfg).eval().float()


def _jax_models():
    vis_cfg = QwenVisionConfig(**{**VIS_KW,
                                  "fullatt_block_indexes": (1,)},
                               dtype=jnp.float32, param_dtype=jnp.float32)
    llm_cfg = Qwen2Config(vocab_size=512, hidden_size=48,
                          intermediate_size=96, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          head_dim=12, rope_theta=1e6,
                          tie_word_embeddings=True, dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          use_pallas_attention=False)
    cfg = Qwen2_5_VLConfig(vision=vis_cfg, llm=llm_cfg,
                           mrope_section=(1, 2, 3), image_token_id=7,
                           video_token_id=8, vision_start_token_id=9)
    return cfg


def test_smart_resize():
    assert smart_resize(128, 128, 28, max_pixels=128 * 128) == (112, 112)
    h, w = smart_resize(300, 500, 28, max_pixels=128 * 128)
    assert h % 28 == 0 and w % 28 == 0 and h * w <= 128 * 128


def test_vision_tower_matches_hf(hf_model, rng):
    from PIL import Image
    cfg = _jax_models()
    img = Image.fromarray(
        (rng.random((24, 24, 3)) * 255).astype(np.uint8))
    patches, grid = preprocess_image(img, patch_size=4, merge_size=2,
                                     temporal_patch_size=2,
                                     max_pixels=24 * 24)
    vin = prepare_vision_inputs([img], max_pixels=24 * 24, patch_size=4,
                                merge_size=2, temporal_patch_size=2,
                                window_size=16)

    with torch.no_grad():
        want = hf_model.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor(np.asarray([grid]))).numpy()

    params = {"params": qwen2_5_vl_vision_params_from_hf(
        hf_model.state_dict(), 2, prefix="model.visual.")}
    vit = QwenVisionTransformer(cfg.vision)
    feats = vit.apply(params, jnp.asarray(vin["patches"]),
                      jnp.asarray(vin["pos_hw"]),
                      jnp.asarray(vin["window_seg"]),
                      jnp.asarray(vin["image_seg"]))
    got = np.asarray(feats)[vin["reverse_index"]]
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_rope_index_matches_hf(hf_model, rng):
    ids = np.array([[1, 2, 9, 7, 7, 7, 7, 9, 3, 4, 5, 6]])
    grid = np.array([[1, 4, 4]])     # 1*4*4/4 = 4 merged tokens
    mask = np.ones_like(ids)
    with torch.no_grad():
        want_pos, want_delta = hf_model.model.get_rope_index(
            torch.tensor(ids), image_grid_thw=torch.tensor(grid),
            attention_mask=torch.tensor(mask))
    got_pos, got_delta = get_rope_index(
        ids, image_grid_thw=grid, attention_mask=mask,
        image_token_id=7, video_token_id=8, vision_start_token_id=9)
    np.testing.assert_array_equal(got_pos, want_pos.numpy())
    np.testing.assert_array_equal(got_delta.reshape(-1),
                                  want_delta.numpy().reshape(-1))


def test_full_encoder_matches_hf(hf_model, rng):
    from PIL import Image
    cfg = _jax_models()
    img = Image.fromarray(
        (rng.random((24, 24, 3)) * 255).astype(np.uint8))
    # raw (unpermuted) patches for HF; window-permuted ones for ours
    raw_patches, _ = preprocess_image(img, patch_size=4, merge_size=2,
                                      temporal_patch_size=2,
                                      max_pixels=24 * 24)
    vin = prepare_vision_inputs([img], max_pixels=24 * 24, patch_size=4,
                                merge_size=2, temporal_patch_size=2,
                                window_size=16)
    n_img_tokens = vin["patches"].shape[0] // 4
    ids = np.array([[1, 2, 9] + [7] * n_img_tokens + [3, 4, 5, 6]])
    mask = np.ones_like(ids)
    grid = vin["image_grid_thw"]

    pos3d, _ = get_rope_index(ids, image_grid_thw=grid,
                              attention_mask=mask, image_token_id=7,
                              video_token_id=8, vision_start_token_id=9)

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(raw_patches),
            image_grid_thw=torch.tensor(grid),
            output_hidden_states=True)
    want = torch.stack(out.hidden_states, dim=1).numpy()

    sd = hf_model.state_dict()
    lm_sd = {k.removeprefix("model.language_model.")
             .replace("", "", 1): v for k, v in sd.items()
             if k.startswith("model.language_model.")}
    lm_sd = {("model." + k): v for k, v in lm_sd.items()}
    if "lm_head.weight" in sd:
        lm_sd["lm_head.weight"] = sd["lm_head.weight"]
    params = {"params": {
        "visual": qwen2_5_vl_vision_params_from_hf(sd, 2,
                                                   prefix="model.visual."),
        "language_model": qwen2_params_from_hf(lm_sd, cfg.llm),
    }}
    enc = Qwen2_5_VLEncoder(cfg)
    got = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask, bool),
                    jnp.asarray(pos3d),
                    {k: jnp.asarray(v) for k, v in vin.items()
                     if k in ("patches", "pos_hw", "window_seg",
                              "image_seg", "reverse_index")})
    got = np.asarray(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_mrope_tables_sections(rng):
    pos = np.tile(np.arange(6)[None, None], (3, 1, 1)).astype(np.int64)
    cos, sin = mrope_tables(jnp.asarray(pos), 12, 1e6, (1, 2, 3))
    # identical positions across the 3 streams -> same as 1D rope
    from x2i_tpu.ops.rope import rope_freqs_half
    c1, s1 = rope_freqs_half(jnp.asarray(pos[0]), 12, 1e6)
    np.testing.assert_allclose(np.asarray(cos), np.asarray(c1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), np.asarray(s1), atol=1e-6)


def test_use_answer_matches_hf_generate(hf_model, rng):
    """encode_with_answer: greedy continuation after a multimodal prompt
    matches HF generate (M-RoPE prefill + delta-positioned decode), and the
    concatenated hidden stack has prefill+answer length."""
    from PIL import Image
    from x2i_tpu.models.qwen2_5_vl import encode_with_answer
    cfg = _jax_models()
    img = Image.fromarray(
        (rng.random((24, 24, 3)) * 255).astype(np.uint8))
    raw_patches, _ = preprocess_image(img, patch_size=4, merge_size=2,
                                      temporal_patch_size=2,
                                      max_pixels=24 * 24)
    vin = prepare_vision_inputs([img], max_pixels=24 * 24, patch_size=4,
                                merge_size=2, temporal_patch_size=2,
                                window_size=16)
    n = vin["patches"].shape[0] // 4
    ids = np.array([[1, 2, 9] + [7] * n + [3, 4, 5, 6]])
    mask = np.ones_like(ids)
    grid = vin["image_grid_thw"]
    pos3d, _ = get_rope_index(ids, image_grid_thw=grid,
                              attention_mask=mask, image_token_id=7,
                              video_token_id=8, vision_start_token_id=9)

    T = 5
    with torch.no_grad():
        out = hf_model.generate(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(raw_patches),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=T, do_sample=False, eos_token_id=-1,
            pad_token_id=0)
    want_tokens = out[:, ids.shape[1]:].numpy()

    sd = hf_model.state_dict()
    lm_sd = {("model." + k.removeprefix("model.language_model.")): v
             for k, v in sd.items()
             if k.startswith("model.language_model.")}
    from x2i_tpu.models.qwen2_5_vl import Qwen2_5_VLEncoder
    params = {"params": {
        "visual": qwen2_5_vl_vision_params_from_hf(sd, 2,
                                                   prefix="model.visual."),
        "language_model": qwen2_params_from_hf(lm_sd, cfg.llm),
    }}
    enc = Qwen2_5_VLEncoder(cfg)
    vdict = {k: jnp.asarray(v) for k, v in vin.items()
             if k in ("patches", "pos_hw", "window_seg", "image_seg",
                      "reverse_index")}
    stack, tokens, valid = encode_with_answer(
        enc, params, jnp.asarray(ids), jnp.asarray(mask, bool),
        jnp.asarray(pos3d), vdict, max_new_tokens=T, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(tokens), want_tokens)
    assert stack.shape == (1, cfg.llm.num_hidden_layers + 1,
                           ids.shape[1] + T, cfg.llm.hidden_size)
