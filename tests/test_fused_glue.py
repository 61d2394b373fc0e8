"""Fused glue kernels (ops/fused_glue.py) must match the unfused
layer_norm/_modulate/gelu + w8a8 quantization chain within quantization
noise. Bit-exactness is not a meaningful contract: the kernel body is one
fused program while the unfused chain is several, so the compiler is free
to contract mul+add to fma and reassociate — bf16 intermediates differ by
1-2 ulp between equally-valid compilations. We require (a) int8 codes
within ONE step, (b) per-row scales within bf16 noise, (c) dequantized
values within ~1.5 quant steps of the unfused chain's values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2i_tpu.ops.fused_glue import (gelu_quant, ln_mod, ln_mod_quant,
                                    quant_rows)
from x2i_tpu.ops.norms import layer_norm
from x2i_tpu.ops.quant import (QuantDense, quantize_kernel, w8a8_matmul,
                               w8a8_matmul_prequant)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _reference_quant(mf):
    """The quantization inside w8a8_matmul (ops/quant.py)."""
    amax = jnp.max(jnp.abs(mf), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(mf / a_scale), -127, 127).astype(jnp.int8)
    return q, a_scale


def _assert_dequant_close(q, s, ref, steps=1.5):
    """Dequantized kernel output within `steps` quantization steps of the
    unfused chain's (bf16) values."""
    deq = np.asarray(q, np.float32) * np.asarray(s, np.float32)
    err = np.abs(deq - np.asarray(ref, np.float32))
    assert err.max() <= steps * np.asarray(s, np.float32).max(), err.max()


def _assert_quant_close(q, q_ref, max_flip_frac=0.10):
    """int8 codes may differ by ONE step: the kernel body is one fused
    program (XLA may contract mul+add to fma and reassociate the row
    reductions) while the unfused chain rounds between ops, so bf16
    intermediates differ in the last ulp and round-to-nearest ties flip.
    A 1-step difference is the same magnitude as the activation-quant
    rounding itself; anything larger would be a real kernel bug."""
    d = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() <= max_flip_frac, (d != 0).mean()


@pytest.mark.parametrize("seq", [256, 200])   # 200: ragged final block
def test_ln_mod_quant_matches_unfused(rng, seq):
    x = jnp.asarray(rng.standard_normal((2, seq, 128)), jnp.bfloat16)
    shift = jnp.asarray(rng.standard_normal((2, 128)) * 0.1, jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((2, 128)) * 0.1, jnp.bfloat16)

    y = layer_norm(x)
    m = y * (1.0 + scale[:, None, :]) + shift[:, None, :]   # _modulate
    q_ref, s_ref = _reference_quant(m.astype(jnp.float32))

    q, s = ln_mod_quant(x, shift, scale, block_rows=64, interpret=True)
    _assert_quant_close(q, q_ref)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=0.02)
    _assert_dequant_close(q, s, m)


@pytest.mark.parametrize("seq", [256, 200])   # 200: ragged final block
def test_ln_mod_matches_unfused(rng, seq):
    """The no-quantize ln_mod (w8/w4/bf16 glue) matches the XLA
    layer_norm + _modulate chain within bf16 ulp noise."""
    x = jnp.asarray(rng.standard_normal((2, seq, 128)), jnp.bfloat16)
    shift = jnp.asarray(rng.standard_normal((2, 128)) * 0.1, jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal((2, 128)) * 0.1, jnp.bfloat16)

    y = layer_norm(x)
    ref = y * (1.0 + scale[:, None, :]) + shift[:, None, :]   # _modulate

    out = ln_mod(x, shift, scale, block_rows=64, interpret=True)
    assert out.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_gelu_quant_matches_unfused(rng):
    x = jnp.asarray(rng.standard_normal((1, 192, 256)), jnp.bfloat16)
    g = jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)
    q_ref, s_ref = _reference_quant(g.astype(jnp.float32))
    q, s = gelu_quant(x, block_rows=64, interpret=True)
    _assert_quant_close(q, q_ref)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=0.02)
    _assert_dequant_close(q, s, g)


def test_quant_rows_matches_w8a8_matmul(rng):
    """quant_rows + w8a8_matmul_prequant == w8a8_matmul exactly."""
    x = jnp.asarray(rng.standard_normal((2, 96, 128)), jnp.bfloat16)
    k = rng.standard_normal((128, 64)).astype(np.float32)
    qk, sc = quantize_kernel(k)
    qk, sc = jnp.asarray(qk), jnp.asarray(sc)

    ref = w8a8_matmul(x, qk, sc)
    q, a = quant_rows(x, block_rows=32, interpret=True)
    out = w8a8_matmul_prequant(q, a, qk, sc, out_dtype=x.dtype)
    # rescale runs in differently-fused programs -> bf16-ulp tolerance
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=0.2)


def test_quantdense_tuple_input(rng):
    """QuantDense on an (xq, a_scale) tuple matches QuantDense on x."""
    x = jnp.asarray(rng.standard_normal((1, 64, 128)), jnp.bfloat16)
    layer = QuantDense(32, mode="w8a8")
    params = layer.init(jax.random.key(0), x)
    # give the zero-init kernel real content
    k = rng.standard_normal((128, 32)).astype(np.float32)
    qk, sc = quantize_kernel(k)
    params = {"params": {"qkernel": jnp.asarray(qk),
                         "scale": jnp.asarray(sc),
                         "bias": params["params"]["bias"]}}
    ref = layer.apply(params, x)
    q, a = quant_rows(x, block_rows=32, interpret=True)
    out = layer.apply(params, (q, a))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=0.2)


def test_quantdense_tuple_rejects_w8(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.bfloat16)
    layer = QuantDense(8, mode="w8")
    params = layer.init(jax.random.key(0), x)
    q, a = quant_rows(x, block_rows=8, interpret=True)
    with pytest.raises(ValueError, match="w8a8"):
        layer.apply(params, (q, a))


@pytest.mark.parametrize("quant", ["w8a8", "w8"])
def test_flux_fused_glue_end_to_end(rng, quant):
    """Tiny FLUX forward with fused_glue on vs off: same params, same
    inputs, outputs within quantization noise of each other. w8a8
    exercises the "quant" glue mode, w8 the "ln" (bf16-out) mode."""
    from jax.experimental import pallas as _  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    from x2i_tpu.core.config import tiny_flux_config
    from x2i_tpu.diffusion.sampling import prepare_latent_image_ids
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.ops.quant import quantize_tree

    def build(fused):
        cfg = tiny_flux_config(quantized=quant, fused_glue=fused,
                               dtype=jnp.bfloat16,
                               param_dtype=jnp.bfloat16)
        return cfg, FluxTransformer2D(cfg)

    cfg0, m0 = build(False)
    cfg1, m1 = build(True)
    grid, s_txt = 8, 16
    s_img = (grid // 2) ** 2
    lat = jnp.asarray(rng.standard_normal((1, s_img, cfg0.in_channels)),
                      jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((1, s_txt, 64)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, 32)), jnp.bfloat16)
    t = jnp.full((1,), 0.7, jnp.float32)
    img_ids = prepare_latent_image_ids(grid, grid)
    txt_ids = jnp.zeros((s_txt, 3), jnp.float32)

    # real (non-zero) quantized weights: init a bf16 model and quantize
    cfg_f, m_f = (tiny_flux_config(dtype=jnp.bfloat16,
                                   param_dtype=jnp.bfloat16),
                  None)
    m_f = FluxTransformer2D(cfg_f)
    params = m_f.init(jax.random.key(0), lat, txt, pooled, t, img_ids,
                      txt_ids)
    qparams = jax.tree_util.tree_map(
        jnp.asarray, quantize_tree(jax.tree_util.tree_map(np.asarray,
                                                          params)))

    ref = m0.apply(qparams, lat, txt, pooled, t, img_ids, txt_ids)
    with pltpu.force_tpu_interpret_mode():
        out = m1.apply(qparams, lat, txt, pooled, t, img_ids, txt_ids)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    if quant == "w8a8":
        # both are valid w8a8 evaluations; differences are bounded by the
        # activation-quant step noise accumulated over the blocks
        assert corr > 0.999, corr
        assert rel < 0.05, rel
    else:
        # 'ln' mode computes identical bf16 math with no quantization
        # noise — only fusion-order rounding differs
        assert corr > 0.9999, corr
        assert rel < 1e-2, rel
