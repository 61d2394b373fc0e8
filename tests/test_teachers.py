"""Golden tests: T5 encoder and CLIP text encoder vs HF transformers with
identical (tiny random) weights."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from x2i_tpu.convert.torch_models import clip_params_from_hf, t5_params_from_hf
from x2i_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
from x2i_tpu.models.t5 import T5Config, T5Encoder

# fast tier: these are the only T5/CLIP teacher goldens — the default
# pytest run must cover every converter family (driver-visible tier)


def test_t5_encoder_matches_hf(rng):
    from transformers import T5Config as HFT5Config
    from transformers.models.t5 import T5EncoderModel
    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", dense_act_fn="gelu_new",
        is_encoder_decoder=False, use_cache=False, tie_word_embeddings=False)
    hf = T5EncoderModel(hf_cfg).eval().float()

    cfg = T5Config(vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=4, dtype=jnp.float32, param_dtype=jnp.float32)
    params = {"params": t5_params_from_hf(hf.state_dict(), cfg.num_layers)}

    B, S = 2, 20
    ids = rng.integers(0, 256, (B, S))
    mask = np.ones((B, S), np.int64)
    mask[:, 15:] = 0
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids),
                  attention_mask=torch.tensor(mask)
                  ).last_hidden_state.numpy()
    got = np.asarray(T5Encoder(cfg).apply(
        params, jnp.asarray(ids), jnp.asarray(mask, bool)))
    # HF zeroes nothing at pad *rows*; compare valid positions
    np.testing.assert_allclose(got[:, :15], want[:, :15], atol=3e-5)


def test_clip_text_encoder_matches_hf(rng):
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel
    torch.manual_seed(0)
    hf_cfg = HFCLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=24, eos_token_id=99, bos_token_id=98,
        attention_dropout=0.0, hidden_act="quick_gelu",
        attn_implementation="eager")
    hf = CLIPTextModel(hf_cfg).eval().float()

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, max_position_embeddings=24,
                         eos_token_id=99, dtype=jnp.float32,
                         param_dtype=jnp.float32)
    params = {"params": clip_params_from_hf(hf.state_dict(),
                                            cfg.num_hidden_layers)}

    B, S = 2, 12
    ids = rng.integers(0, 97, (B, S))
    ids[:, -1] = 99                               # EOS at the end
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids))
    got_hidden, got_pooled = CLIPTextEncoder(cfg).apply(
        params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got_hidden),
                               out.last_hidden_state.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_pooled),
                               out.pooler_output.numpy(), atol=3e-5)


def test_clip_pooled_uses_eos_position(rng):
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=1,
                         num_attention_heads=4, max_position_embeddings=24,
                         eos_token_id=99, dtype=jnp.float32,
                         param_dtype=jnp.float32)
    import jax
    model = CLIPTextEncoder(cfg)
    ids = np.full((1, 10), 5)
    ids[0, 4] = 99                                # EOS mid-sequence
    params = model.init(jax.random.key(0), jnp.asarray(ids))
    hidden, pooled = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(pooled),
                               np.asarray(hidden)[:, 4], atol=0)
