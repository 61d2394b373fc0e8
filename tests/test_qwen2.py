"""Golden test: Qwen2LM hidden-state export matches HuggingFace
transformers Qwen2ForCausalLM exactly (same random weights, f32, eager)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from x2i_tpu.convert.torch_models import qwen2_params_from_hf
from x2i_tpu.core.config import tiny_qwen2_config
from x2i_tpu.models.qwen2 import Qwen2LM


@pytest.fixture(scope="module")
def hf_and_jax():
    from transformers import Qwen2Config as HFQwen2Config
    from transformers.models.qwen2 import Qwen2ForCausalLM
    torch.manual_seed(0)
    hf_cfg = HFQwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=1000000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=True,
        attn_implementation="eager")
    hf = Qwen2ForCausalLM(hf_cfg).eval().float()

    cfg = tiny_qwen2_config()
    model = Qwen2LM(cfg)
    params = {"params": qwen2_params_from_hf(hf.state_dict(), cfg)}
    return hf, model, params, cfg


def test_prefill_hidden_states_match_hf(hf_and_jax, rng):
    hf, model, params, cfg = hf_and_jax
    B, S = 2, 12
    ids = rng.integers(0, cfg.vocab_size, (B, S))
    pos = np.tile(np.arange(S), (B, 1))

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 position_ids=torch.tensor(pos),
                 output_hidden_states=True)
    want = torch.stack(out.hidden_states, dim=1).numpy()  # (B, L+1, S, H)

    all_hidden, final = model.apply(
        params, jnp.asarray(ids), position_ids=jnp.asarray(pos))
    got = np.asarray(all_hidden)
    assert got.shape == want.shape == (B, cfg.num_hidden_layers + 1, S, 64)
    np.testing.assert_allclose(got, want, atol=3e-5)

    # logits from the final-norm'd states (tied embeddings)
    logits = model.apply(params, final, method=Qwen2LM.logits_from_normed)
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               atol=2e-3)


def test_prefill_with_right_padding_matches_hf(hf_and_jax, rng):
    hf, model, params, cfg = hf_and_jax
    B, S, VALID = 1, 10, 7
    ids = rng.integers(0, cfg.vocab_size, (B, S))
    mask = np.zeros((B, S), np.int64)
    mask[:, :VALID] = 1
    pos = np.tile(np.arange(S), (B, 1))     # same positions both sides

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 position_ids=torch.tensor(pos),
                 output_hidden_states=True)
    want = torch.stack(out.hidden_states, dim=1).numpy()

    all_hidden, _ = model.apply(
        params, jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        position_ids=jnp.asarray(pos))
    # compare only valid positions (HF eager attends pad rows differently)
    np.testing.assert_allclose(np.asarray(all_hidden)[:, :, :VALID],
                               want[:, :, :VALID], atol=3e-5)


def test_decode_matches_prefill(hf_and_jax, rng):
    """Cached prefill + N decode steps == uncached prefill over the full
    sequence (KV-cache correctness)."""
    hf, model, params, cfg = hf_and_jax
    B, S0, STEPS, MAX = 1, 6, 3, 16
    ids = rng.integers(0, cfg.vocab_size, (B, S0 + STEPS))
    mask_full = jnp.ones((B, S0 + STEPS), jnp.bool_)

    ref_hidden, _ = model.apply(params, jnp.asarray(ids))

    cache = model.apply(params, B, MAX, method=Qwen2LM.init_cache)
    mask0 = jnp.ones((B, S0), jnp.bool_)
    h0, logits0, cache = model.apply(
        params, model.apply(params, jnp.asarray(ids[:, :S0]),
                            method=Qwen2LM.embed),
        mask0, cache, method=Qwen2LM.prefill_cached)
    np.testing.assert_allclose(np.asarray(h0),
                               np.asarray(ref_hidden[:, :, :S0]), atol=1e-5)

    for t in range(STEPS):
        idx = S0 + t
        tok = jnp.asarray(ids[:, idx:idx + 1])
        emb = model.apply(params, tok, method=Qwen2LM.embed)
        kv_mask = (jnp.arange(MAX)[None, :] <= idx)
        pos = jnp.full((B, 1), idx, jnp.int32)
        h, logits, cache = model.apply(
            params, emb, cache, idx, kv_mask, pos,
            method=Qwen2LM.decode_step)
        np.testing.assert_allclose(
            np.asarray(h[:, :, 0]), np.asarray(ref_hidden[:, :, idx]),
            atol=2e-5)


def test_prefill_chunk_matches_full(hf_and_jax, rng):
    """Chunked prefill at a cache offset (streaming sessions) reproduces
    the one-shot cached prefill hidden states exactly."""
    hf, model, params, cfg = hf_and_jax
    B, S, MAX, SPLIT = 1, 10, 16, 4
    ids = rng.integers(0, cfg.vocab_size, (B, S))

    ref_hidden, _ = model.apply(params, jnp.asarray(ids))

    cache = model.apply(params, B, MAX, method=Qwen2LM.init_cache)
    emb = lambda sl: model.apply(params, jnp.asarray(ids[:, sl]),
                                 method=Qwen2LM.embed)
    h0, _, cache = model.apply(
        params, emb(slice(0, SPLIT)), cache, 0,
        jnp.ones((B, SPLIT), jnp.bool_), method=Qwen2LM.prefill_chunk)
    h1, _, cache = model.apply(
        params, emb(slice(SPLIT, S)), cache, SPLIT,
        jnp.ones((B, S - SPLIT), jnp.bool_), method=Qwen2LM.prefill_chunk)
    np.testing.assert_allclose(np.asarray(h0),
                               np.asarray(ref_hidden[:, :, :SPLIT]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1),
                               np.asarray(ref_hidden[:, :, SPLIT:S]),
                               atol=2e-5)
