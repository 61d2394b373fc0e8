"""InternLM2 support: run the actual reference modeling_internlm2.py
(read-only import) and check the wqkv-deinterleave converter + shared
Qwen2LM reproduce its hidden states."""

import importlib.util
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from x2i_tpu.convert.torch_models import internlm2_params_from_hf
from x2i_tpu.core.config import Qwen2Config
from x2i_tpu.models.qwen2 import Qwen2LM

pytestmark = pytest.mark.slow

REF_DIR = "/root/reference/model_internvl/internvl"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_internlm2():
    import importlib
    import types
    try:
        pkg = types.ModuleType("ref_ilm2_pkg")
        pkg.__path__ = [REF_DIR]
        sys.modules["ref_ilm2_pkg"] = pkg
        cfg_mod = importlib.import_module(
            "ref_ilm2_pkg.configuration_internlm2")
        mod = importlib.import_module("ref_ilm2_pkg.modeling_internlm2")
    except Exception as exn:              # noqa: BLE001
        pytest.skip(f"reference internlm2 not importable: {exn!r}")
    return cfg_mod, mod


def test_internlm2_matches_reference(ref_internlm2, rng):
    cfg_mod, mod = ref_internlm2
    torch.manual_seed(0)
    hf_cfg = cfg_mod.InternLM2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=1e6, rms_norm_eps=1e-6,
        bias=False, tie_word_embeddings=False, attn_implementation="eager")
    hf_cfg.attn_implementation = "eager"
    ref = mod.InternLM2ForCausalLM(hf_cfg).eval().float()

    cfg = Qwen2Config(vocab_size=256, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=16, rope_theta=1e6, rms_norm_eps=1e-6,
                      tie_word_embeddings=False, attention_bias=False,
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      use_pallas_attention=False)
    params = {"params": internlm2_params_from_hf(ref.state_dict(), cfg)}

    B, S = 2, 10
    ids = rng.integers(0, 256, (B, S))
    pos = np.tile(np.arange(S), (B, 1))
    with torch.no_grad():
        out = ref(input_ids=torch.tensor(ids),
                  position_ids=torch.tensor(pos),
                  output_hidden_states=True)
    want = torch.stack(out.hidden_states, dim=1).numpy()

    model = Qwen2LM(cfg)
    got, final = model.apply(params, jnp.asarray(ids),
                             position_ids=jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)

    logits = model.apply(params, final, method=Qwen2LM.logits_from_normed)
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               atol=2e-3)
