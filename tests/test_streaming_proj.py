"""Streamed proj channel mix (accumulated inside the LM layer scan) must
equal the stacked path Proj(all_hidden) in every non-t5 mix mode.

This is the long-prompt memory path: the reference stacks all layer hidden
states before the proj (/root/reference/infer/inference_minicpm.py:116-118,
(B, L+1, S, H)); at 32k tokens on the 7B shape that stack is 6.8 GiB. The
streamed path (models/proj.py::streaming_mix_spec +
models/qwen2.py::Qwen2LM.encode_premixed) keeps one (B, S, H) accumulator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2i_tpu.core.config import ProjConfig, tiny_qwen2_config
from x2i_tpu.models.proj import Proj, streaming_mix_spec
from x2i_tpu.models.qwen2 import Qwen2LM


def _proj_cfg(mode):
    return ProjConfig(in_channels=3, input_dim=64, output_dim0=8,
                      output_dim1=16, use_scale=(mode == "scale"),
                      use_cnn=(mode == "cnn"), dtype=jnp.float32,
                      param_dtype=jnp.float32)


@pytest.mark.parametrize("mode", ["scale", "cnn", "mean"])
def test_streamed_mix_matches_stacked(mode, rng):
    lm_cfg = tiny_qwen2_config()
    lm = Qwen2LM(lm_cfg)
    ids = jnp.asarray(rng.integers(0, lm_cfg.vocab_size, (2, 12)))
    lm_params = lm.init(jax.random.key(0), ids)

    pcfg = _proj_cfg(mode)
    proj = Proj(pcfg)
    proj_params = proj.init(
        jax.random.key(1),
        jnp.zeros((1, pcfg.in_channels, 12, pcfg.input_dim), jnp.float32))

    # stacked reference path
    all_hidden, _ = lm.apply(lm_params, ids)
    pooled_ref, seq_ref = proj.apply(proj_params, all_hidden)

    # streamed path
    weights, mix_fn = streaming_mix_spec(pcfg, proj_params,
                                         lm_cfg.num_hidden_layers)
    mixed, normed = lm.apply(lm_params, ids, weights, mix_fn,
                             method=Qwen2LM.encode_premixed)
    pooled_s, seq_s = proj.apply(proj_params, mixed, method=Proj.mlp)

    np.testing.assert_allclose(np.asarray(seq_s), np.asarray(seq_ref),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled_s), np.asarray(pooled_ref),
                               atol=2e-5, rtol=1e-5)
    # the fused prefill still exposes the final-norm'd states for logits
    _, last_ref = lm.apply(lm_params, ids)
    np.testing.assert_allclose(np.asarray(normed), np.asarray(last_ref),
                               atol=1e-6)


def test_streaming_mix_spec_rejects_t5_and_bad_channels():
    pcfg = _proj_cfg("cnn")
    proj = Proj(pcfg)
    params = proj.init(
        jax.random.key(0), jnp.zeros((1, 3, 8, 64), jnp.float32))
    with pytest.raises(ValueError):
        streaming_mix_spec(pcfg, params, num_layers=7)

    t5cfg = ProjConfig(in_channels=3, input_dim=64, use_t5=True,
                       dtype=jnp.float32, param_dtype=jnp.float32)
    with pytest.raises(ValueError):
        streaming_mix_spec(t5cfg, params, num_layers=2)
