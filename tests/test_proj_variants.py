"""Legacy proj variants: shapes/finiteness across the recorded design
space (reference model_internvl/proj.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2i_tpu.models.proj_variants import (LegacyProj, LegacyProjConfig,

                                          MLPProj, TransformerProj)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("depth,deep", [(3, False), (3, True), (6, False)])
def test_mlp_variants(rng, depth, deep):
    m = MLPProj(in_dim=16, out_dim=24, out_dim1=8, depth=depth,
                deep_pooled_head=deep)
    x = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    pooled, seq = m.apply(params, x)
    assert pooled.shape == (2, 8) and seq.shape == (2, 5, 24)
    assert np.isfinite(np.asarray(seq)).all()


def test_transformer_proj(rng):
    m = TransformerProj(d_model=16, n_heads=4, out_dim1=8, out_dim2=24,
                        num_layers=2, ffn_dim=32)
    x = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    pooled, seq = m.apply(params, x)
    assert pooled.shape == (2, 8) and seq.shape == (2, 5, 24)


@pytest.mark.parametrize("variant", ["proj", "proj2", "proj3"])
def test_legacy_proj_variants(rng, variant):
    cfg = LegacyProjConfig(in_channels=3, input_dim=16, output_dim0=8,
                           output_dim1=24, num_layers=1, num_heads=2,
                           head_dim=8)
    m = LegacyProj(cfg, variant=variant)
    x = jnp.asarray(rng.standard_normal((2, 3, 5, 16)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    pooled, seq = m.apply(params, x)
    assert pooled.shape == (2, 8) and seq.shape == (2, 5, 24)
    assert np.isfinite(np.asarray(seq)).all()
