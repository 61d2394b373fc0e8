"""Decode loop: greedy tokens match HF generate; per-step hiddens match
full-sequence prefill; EOS handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from x2i_tpu.convert.torch_models import qwen2_params_from_hf
from x2i_tpu.core.config import tiny_qwen2_config
from x2i_tpu.models.decoding import (concat_answer_hiddens,
                                     greedy_decode_with_hiddens)
from x2i_tpu.models.qwen2 import Qwen2LM

pytestmark = pytest.mark.slow


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


def test_greedy_matches_hf_generate(hf_and_jax, rng):
    hf, model, params, cfg = hf_and_jax
    B, S0, T = 1, 6, 5
    ids = rng.integers(0, 512, (B, S0))
    with torch.no_grad():
        out = hf.generate(torch.tensor(ids), max_new_tokens=T,
                          do_sample=False, eos_token_id=-1,
                          pad_token_id=0)
    want_tokens = out[:, S0:].numpy()

    emb = model.apply(params, jnp.asarray(ids), method=Qwen2LM.embed)
    prefill, steps, tokens, valid = greedy_decode_with_hiddens(
        model, params, emb, jnp.ones((B, S0), bool), T, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(tokens), want_tokens)
    assert np.asarray(valid).all()


def test_step_hiddens_match_full_prefill(hf_and_jax, rng):
    """Per-step hidden exports must equal a full uncached forward over
    prompt+generated tokens — the tensor use_answer conditions on."""
    hf, model, params, cfg = hf_and_jax
    B, S0, T = 1, 5, 4
    ids = rng.integers(0, 512, (B, S0))
    emb = model.apply(params, jnp.asarray(ids), method=Qwen2LM.embed)
    prefill, steps, tokens, valid = greedy_decode_with_hiddens(
        model, params, emb, jnp.ones((B, S0), bool), T, eos_token_id=-1)

    full_ids = np.concatenate([ids, np.asarray(tokens)], axis=1)
    ref_all, _ = model.apply(params, jnp.asarray(full_ids))
    cat = concat_answer_hiddens(prefill, steps)
    # positions: prefill part exact; step t corresponds to full position
    # S0-1+... note step t's hiddens are for token[t] INPUT at pos S0+t
    np.testing.assert_allclose(np.asarray(cat)[:, :, :S0],
                               np.asarray(ref_all)[:, :, :S0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(cat)[:, :, S0:],
                               np.asarray(ref_all)[:, :, S0:], atol=2e-5)


def test_eos_marks_invalid(hf_and_jax, rng):
    hf, model, params, cfg = hf_and_jax
    B, S0, T = 1, 4, 6
    ids = rng.integers(0, 512, (B, S0))
    emb = model.apply(params, jnp.asarray(ids), method=Qwen2LM.embed)
    # pick the first generated token as "EOS" so everything after is invalid
    _, _, tokens, _ = greedy_decode_with_hiddens(
        model, params, emb, jnp.ones((B, S0), bool), T, eos_token_id=-1)
    eos = int(np.asarray(tokens)[0, 0])
    _, _, tokens2, valid2 = greedy_decode_with_hiddens(
        model, params, emb, jnp.ones((B, S0), bool), T, eos_token_id=eos)
    v = np.asarray(valid2)[0]
    assert v[0]                       # the EOS step itself is included
    assert not v[1:].any()            # everything after is marked invalid
