"""int8 weight-only quantization: tree rewrite + quantized FLUX parity."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import tiny_flux_config
from x2i_tpu.diffusion.sampling import prepare_latent_image_ids
from x2i_tpu.models.flux import FluxTransformer2D
from x2i_tpu.ops.quant import quantize_kernel, quantize_tree


def test_quantize_kernel_roundtrip(rng):
    w = rng.standard_normal((32, 16)).astype(np.float32)
    q, s = quantize_kernel(w)
    assert q.dtype == np.int8 and s.shape == (16,)
    deq = q.astype(np.float32) * s
    assert np.max(np.abs(deq - w)) < np.max(np.abs(w)) / 127 + 1e-6


def test_quantize_kernel_stacked(rng):
    w = rng.standard_normal((3, 8, 16)).astype(np.float32)  # scan-stacked
    q, s = quantize_kernel(w)
    assert q.shape == (3, 8, 16) and s.shape == (3, 16)


@pytest.mark.slow
def test_quantized_flux_matches_fp(rng):
    cfg = tiny_flux_config()
    qcfg = tiny_flux_config(quantized=True)
    B, GRID, S_TXT = 1, 8, 8
    s_img = (GRID // 2) ** 2
    hidden = jnp.asarray(rng.standard_normal((B, s_img, cfg.in_channels)),
                         jnp.float32)
    encoder = jnp.asarray(
        rng.standard_normal((B, S_TXT, cfg.joint_attention_dim)), jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((B,), 0.5)
    img_ids = prepare_latent_image_ids(GRID, GRID)
    txt_ids = jnp.zeros((S_TXT, 3))

    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    ref = model.apply(params, hidden, encoder, pooled, t, img_ids, txt_ids)

    qparams = {"params": quantize_tree(params["params"])}
    qmodel = FluxTransformer2D(qcfg)
    got = qmodel.apply(qparams, hidden, encoder, pooled, t, img_ids, txt_ids)

    ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    # weight-only int8 should track fp closely on a tiny model
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.05, err


def test_quantized_param_structure(rng):
    cfg = tiny_flux_config(quantized=True)
    B, GRID, S_TXT = 1, 4, 4
    s_img = (GRID // 2) ** 2
    model = FluxTransformer2D(cfg)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((B, s_img, cfg.in_channels)),
        jnp.zeros((B, S_TXT, cfg.joint_attention_dim)),
        jnp.zeros((B, cfg.pooled_projection_dim)),
        jnp.zeros((B,)), prepare_latent_image_ids(GRID, GRID),
        jnp.zeros((S_TXT, 3)))
    db = params["params"]["double_blocks"]
    assert db["img_q"]["qkernel"].dtype == jnp.int8
    assert db["img_q"]["scale"].dtype == jnp.float32


@pytest.mark.slow
def test_w8a8_flux_matches_fp(rng):
    """Dynamic-activation int8 matmuls still track the fp model."""
    cfg = tiny_flux_config()
    qcfg = tiny_flux_config(quantized="w8a8")
    B, GRID, S_TXT = 1, 8, 8
    s_img = (GRID // 2) ** 2
    hidden = jnp.asarray(rng.standard_normal((B, s_img, cfg.in_channels)),
                         jnp.float32)
    encoder = jnp.asarray(
        rng.standard_normal((B, S_TXT, cfg.joint_attention_dim)), jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((B,), 0.5)
    img_ids = prepare_latent_image_ids(GRID, GRID)
    txt_ids = jnp.zeros((S_TXT, 3))

    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    ref = model.apply(params, hidden, encoder, pooled, t, img_ids, txt_ids)

    qparams = {"params": quantize_tree(params["params"])}
    got = FluxTransformer2D(qcfg).apply(qparams, hidden, encoder, pooled,
                                        t, img_ids, txt_ids)
    ref, got = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.15, err


def test_w8a8_dense_accuracy(rng):
    """Per-token+per-channel W8A8 matmul tracks f32 closely."""
    from x2i_tpu.ops.quant import QuantDense, quantize_kernel
    import flax.linen as nn
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    q, s = quantize_kernel(w)
    params = {"params": {"qkernel": q, "scale": s,
                         "bias": np.zeros(16, np.float32)}}
    got = QuantDense(16, dtype=jnp.float32, param_dtype=jnp.float32,
                     mode="w8a8").apply(params, x)
    want = np.asarray(x) @ w
    rel = np.abs(np.asarray(got) - want).max() / np.abs(want).max()
    assert rel < 0.03, rel


def test_w8a8_ste_gradient(rng):
    """w8a8 is differentiable w.r.t. the input (straight-through backward
    against the dequantized kernel); frozen qkernel/scale get no grads."""
    from x2i_tpu.ops.quant import QuantDense, quantize_kernel
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    q, s = quantize_kernel(w)
    params = {"params": {"qkernel": q, "scale": s,
                         "bias": np.zeros(16, np.float32)}}
    layer = QuantDense(16, dtype=jnp.float32, param_dtype=jnp.float32,
                       mode="w8a8")

    dx = jax.grad(lambda x: jnp.sum(layer.apply(params, x) ** 2))(x)
    wq = q.astype(np.float32) * s                       # dequantized kernel
    y = layer.apply(params, x)
    want = 2.0 * np.asarray(y) @ wq.T                   # d/dx sum(y^2), STE
    rel = np.abs(np.asarray(dx) - want).max() / np.abs(want).max()
    assert rel < 0.05, rel
    assert not np.allclose(np.asarray(dx), 0.0)

    # grads w.r.t. params exist structurally but are zero (frozen stack)
    gp = jax.grad(lambda p: jnp.sum(layer.apply(p, x) ** 2),
                  allow_int=True)(params)
    assert np.allclose(np.asarray(gp["params"]["scale"]), 0.0)


def test_w8_gradient_matches_dense(rng):
    """w8 custom VJP (barrier-pinned W^T) gives the exact dense-dequant
    gradient."""
    from x2i_tpu.ops.quant import QuantDense, quantize_kernel
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    q, s = quantize_kernel(w)
    params = {"params": {"qkernel": q, "scale": s,
                         "bias": np.zeros(16, np.float32)}}
    layer = QuantDense(16, dtype=jnp.float32, param_dtype=jnp.float32,
                       mode="w8")
    dx = jax.grad(lambda x: jnp.sum(layer.apply(params, x) ** 2))(x)
    wq = q.astype(np.float32) * s
    want = 2.0 * (np.asarray(x) @ wq) @ wq.T
    np.testing.assert_allclose(np.asarray(dx), want, rtol=1e-5, atol=1e-5)


def test_qwen2_quantized_matches_bf16():
    """int8 Qwen2LM (Qwen2Config.quantized) tracks the bf16 model closely:
    the MLLM encoder can sit next to the int8 DiT on one chip."""
    import numpy as np
    from x2i_tpu.core.config import tiny_qwen2_config
    from x2i_tpu.models.qwen2 import Qwen2LM
    from x2i_tpu.ops.quant import quantize_tree

    cfg = tiny_qwen2_config(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                            use_pallas_attention=False)
    qcfg = tiny_qwen2_config(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                             use_pallas_attention=False, quantized="w8a8")
    lm, qlm = Qwen2LM(cfg), Qwen2LM(qcfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (1, 24)),
        jnp.int32)
    params = lm.init(jax.random.key(0), ids)
    qparams = jax.tree_util.tree_map(
        jnp.asarray,
        quantize_tree(jax.tree_util.tree_map(np.asarray, params)))

    states, _ = lm.apply(params, ids)
    qstates, _ = qlm.apply(qparams, ids)
    a = np.asarray(states, np.float32).ravel()
    b = np.asarray(qstates, np.float32).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
    assert np.isfinite(b).all()


# --- w4 (nibble-packed int4, group scales) --------------------------------


def test_w4_pack_unpack_roundtrip(rng):
    from x2i_tpu.ops.quant import _unpack_int4, pack_int4

    q = rng.integers(-8, 8, (32, 16)).astype(np.int8)
    packed = pack_int4(q)
    assert packed.shape == (16, 16) and packed.dtype == np.int8
    got = np.asarray(_unpack_int4(jnp.asarray(packed)))
    np.testing.assert_array_equal(got, q)


def test_w4_quantize_kernel_roundtrip(rng):
    from x2i_tpu.ops.quant import _unpack_int4, quantize_kernel_w4

    w = rng.standard_normal((256, 24)).astype(np.float32)
    p, s = quantize_kernel_w4(w, group=128)
    assert p.shape == (128, 24) and s.shape == (2, 24)
    deq = (np.asarray(_unpack_int4(jnp.asarray(p)), np.float32)
           .reshape(2, 128, 24) * s[:, None, :]).reshape(256, 24)
    # worst-case error is half a quantization step per group
    step = np.repeat(s, 128, axis=0) * 1.001
    assert np.all(np.abs(deq - w) <= step / 2 + 1e-6)


def test_w4_quantize_kernel_stacked(rng):
    from x2i_tpu.ops.quant import quantize_kernel_w4

    w = rng.standard_normal((3, 256, 16)).astype(np.float32)
    p, s = quantize_kernel_w4(w, group=128)
    assert p.shape == (3, 128, 16) and s.shape == (3, 2, 16)


def test_w4_matmul_matches_dequant(rng):
    from x2i_tpu.ops.quant import (_unpack_int4, quantize_kernel_w4,
                                   w4_matmul)

    w = rng.standard_normal((256, 32)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    p, s = quantize_kernel_w4(w, group=64)
    got = w4_matmul(x, jnp.asarray(p), jnp.asarray(s))
    deq = (np.asarray(_unpack_int4(jnp.asarray(p)), np.float32)
           .reshape(4, 64, 32) * s[:, None, :]).reshape(256, 32)
    want = np.asarray(x) @ deq
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
    # and the dequantized kernel tracks the fp kernel
    err = np.abs(deq - w).max()
    assert err < np.abs(w).max() / 7 + 1e-6


def test_w4_dense_gradient(rng):
    from x2i_tpu.ops.quant import QuantDense, _unpack_int4, quantize_kernel_w4

    w = rng.standard_normal((128, 16)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    p, s = quantize_kernel_w4(w, group=128)
    params = {"params": {"pkernel": p, "scale": s,
                         "pre_scale": np.ones(128, np.float32),
                         "bias": np.zeros(16, np.float32)}}
    layer = QuantDense(16, dtype=jnp.float32, param_dtype=jnp.float32,
                       mode="w4")
    y = layer.apply(params, x)
    deq = (np.asarray(_unpack_int4(jnp.asarray(p)), np.float32)
           * s[0][None, :])
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ deq,
                               rtol=2e-5, atol=2e-5)
    dx = jax.grad(lambda x: jnp.sum(layer.apply(params, x) ** 2))(x)
    want = 2.0 * (np.asarray(x) @ deq) @ deq.T
    np.testing.assert_allclose(np.asarray(dx), want, rtol=1e-4, atol=1e-4)


def test_w4_flux_matches_dequantized_fp(rng):
    """The w4 FLUX must match the fp model run on the DEQUANTIZED weights
    exactly (plumbing correctness); int4 quality vs the original weights is
    only sanity-checked by correlation — tiny random-normal nets are an
    adversarial case for 4-bit (the real study is tools/quant_quality.py)."""
    from x2i_tpu.ops.quant import dequantize_tree

    cfg = tiny_flux_config()
    qcfg = tiny_flux_config(quantized="w4")
    B, GRID, S_TXT = 1, 8, 8
    s_img = (GRID // 2) ** 2
    hidden = jnp.asarray(rng.standard_normal((B, s_img, cfg.in_channels)),
                         jnp.float32)
    encoder = jnp.asarray(
        rng.standard_normal((B, S_TXT, cfg.joint_attention_dim)), jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((B,), 0.5)
    img_ids = prepare_latent_image_ids(GRID, GRID)
    txt_ids = jnp.zeros((S_TXT, 3))

    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    ref = model.apply(params, hidden, encoder, pooled, t, img_ids, txt_ids)

    qtree = quantize_tree(params["params"], mode="w4")
    qmodel = FluxTransformer2D(qcfg)
    got = qmodel.apply({"params": qtree}, hidden, encoder, pooled, t,
                       img_ids, txt_ids)

    deq = model.apply({"params": dequantize_tree(qtree)}, hidden, encoder,
                      pooled, t, img_ids, txt_ids)
    want, got = np.asarray(deq, np.float32), np.asarray(got, np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    a, b = np.asarray(ref, np.float32).ravel(), got.ravel()
    # iid-normal tiny weights + sub-128 dims (per-channel scales) are the
    # int4 worst case; 0.95 just guards against sign/packing bugs.
    assert np.corrcoef(a, b)[0, 1] > 0.95


# --- w4 AWQ (activation-aware equalization) --------------------------------


def _outlier_act_amax(rng, inn, n_hot=8, hot=16.0):
    amax = np.abs(rng.standard_normal(inn)).astype(np.float64) + 1.0
    amax[rng.choice(inn, n_hot, replace=False)] *= hot
    return amax


def test_w4_awq_reduces_output_error(rng):
    """At LLM.int8()-style outlier-channel activation statistics the
    AWQ-equalized int4 kernel must beat plain round-to-nearest w4 on true
    output error (the whole point of the method)."""
    from x2i_tpu.ops.quant import (_dequant_w4, quantize_kernel_w4,
                                   quantize_kernel_w4_awq)

    inn, out = 256, 64
    w = rng.standard_normal((inn, out)).astype(np.float32) * 0.05
    amax = _outlier_act_amax(rng, inn)
    x = (rng.laplace(size=(512, inn)) * (amax / 4.0)).astype(np.float32)
    ref = x @ w

    p0, s0 = quantize_kernel_w4(w, group=128)
    plain = x @ np.asarray(_dequant_w4(jnp.asarray(p0), jnp.asarray(s0),
                                       jnp.float32))
    pk, sc, inv_s = quantize_kernel_w4_awq(w, amax, group=128)
    awq = (x * inv_s) @ np.asarray(_dequant_w4(jnp.asarray(pk),
                                               jnp.asarray(sc), jnp.float32))

    err_plain = float(np.mean((plain - ref) ** 2))
    err_awq = float(np.mean((awq - ref) ** 2))
    assert err_awq < 0.7 * err_plain, (err_awq, err_plain)


def test_w4_awq_dense_and_dequantize_tree_agree(rng):
    """QuantDense(mode=w4) with AWQ params == x @ (pre_scale * deq kernel);
    dequantize_tree reconstructs that same effective kernel."""
    from x2i_tpu.ops.quant import (QuantDense, dequantize_tree,
                                   quantize_kernel_w4_awq)

    inn, out = 128, 16
    w = rng.standard_normal((inn, out)).astype(np.float32) * 0.1
    amax = _outlier_act_amax(rng, inn, n_hot=4)
    pk, sc, inv_s = quantize_kernel_w4_awq(w, amax, group=64)
    tree = {"pkernel": pk, "scale": sc, "pre_scale": inv_s,
            "bias": np.zeros(out, np.float32)}
    layer = QuantDense(out, dtype=jnp.float32, param_dtype=jnp.float32,
                       mode="w4", group=64)
    x = jnp.asarray(rng.standard_normal((4, inn)), jnp.float32)
    y = layer.apply({"params": tree}, x)

    eff = dequantize_tree({"q": tree})["q"]["kernel"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ eff,
                               rtol=3e-5, atol=3e-5)


# --- w4a8 (int4 storage, int8 MXU compute) ---------------------------------


def test_w4a8_quantize_kernel_shapes_and_error(rng):
    """Double quantization: codes*m reconstruct within the snapped group
    step; mscale stays in [1, 15]."""
    from x2i_tpu.ops.quant import (_w4a8_weight_int8, quantize_kernel_w4a8)

    w = rng.standard_normal((256, 24)).astype(np.float32)
    p, m, s = quantize_kernel_w4a8(w, group=128)
    assert p.shape == (128, 24) and m.shape == (2, 24) and s.shape == (24,)
    assert m.dtype == np.int8 and 1 <= m.min() and m.max() <= 15
    w8 = np.asarray(_w4a8_weight_int8(jnp.asarray(p), jnp.asarray(m)))
    assert np.abs(w8).max() <= 105            # 7 * 15
    deq = w8.astype(np.float32) * s[None, :]
    # per-(group, out) realized step = m * s; error <= half a step
    step = np.repeat(m.astype(np.float32) * s[None, :], 128, axis=0)
    assert np.all(np.abs(deq - w) <= step / 2 + 1e-6)


def test_w4a8_quantize_kernel_stacked(rng):
    from x2i_tpu.ops.quant import quantize_kernel_w4a8

    w = rng.standard_normal((3, 256, 16)).astype(np.float32)
    p, m, s = quantize_kernel_w4a8(w, group=128)
    assert p.shape == (3, 128, 16) and m.shape == (3, 2, 16) \
        and s.shape == (3, 16)


def test_w4a8_matmul_matches_reference(rng):
    """w4a8_matmul == numpy: per-token int8 activation quant, int8 dot
    against code4*m, rescale."""
    from x2i_tpu.ops.quant import (_w4a8_weight_int8, quantize_kernel_w4a8,
                                   w4a8_matmul)

    w = rng.standard_normal((256, 24)).astype(np.float32)
    x = rng.standard_normal((4, 256)).astype(np.float32)
    p, m, s = quantize_kernel_w4a8(w, group=128)
    got = np.asarray(w4a8_matmul(jnp.asarray(x), jnp.asarray(p),
                                 jnp.asarray(m), jnp.asarray(s)),
                     np.float32)
    a_scale = np.maximum(np.abs(x).max(-1, keepdims=True), 1e-6) / 127.0
    xq = np.clip(np.round(x / a_scale), -127, 127).astype(np.int32)
    w8 = np.asarray(_w4a8_weight_int8(jnp.asarray(p), jnp.asarray(m)),
                    np.int32)
    want = (xq @ w8).astype(np.float32) * a_scale * s[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_w4a8_dense_prequant_chunks_match(rng):
    """QuantDense w4a8: a [attn | mlp]-style chunked prequant input equals
    the unchunked matmul on the concatenated activation."""
    from x2i_tpu.ops.quant import QuantDense, quantize_kernel_w4a8

    inn, out, B = 512, 24, 4
    w = rng.standard_normal((inn, out)).astype(np.float32)
    x = rng.standard_normal((B, inn)).astype(np.float32)
    p, m, s = quantize_kernel_w4a8(w, group=128)
    params = {"params": {"pkernel": jnp.asarray(p), "mscale": jnp.asarray(m),
                         "scale": jnp.asarray(s),
                         "bias": jnp.zeros((out,), jnp.bfloat16)}}
    layer = QuantDense(out, mode="w4a8", dtype=jnp.float32)
    full = np.asarray(layer.apply(params, jnp.asarray(x)), np.float32)

    # prequantize per chunk exactly like the fused glue kernels do
    def prequant(xc):
        a = np.maximum(np.abs(xc).max(-1, keepdims=True), 1e-6) / 127.0
        q = np.clip(np.round(xc / a), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(a.astype(np.float32))

    chunked = np.asarray(layer.apply(
        params, [prequant(x[:, :256]), prequant(x[:, 256:])]), np.float32)
    # chunked quantization sees per-chunk amax -> small rescale delta
    np.testing.assert_allclose(chunked, full, rtol=0.05, atol=0.5)
    # a chunk STRADDLING the half-split boundary (like the real single
    # block's 3072 | 12288 split of in=15360, half=7680)
    straddle = np.asarray(layer.apply(
        params, [prequant(x[:, :128]), prequant(x[:, 128:])]), np.float32)
    np.testing.assert_allclose(straddle, full, rtol=0.05, atol=0.5)


def test_w4a8_flux_matches_dequantized_fp(rng):
    """The w4a8 FLUX == fp model on the DEQUANTIZED weights (plumbing
    exactness up to int8 activation rounding), and quantize_tree/
    dequantize_tree round-trip the new param layout."""
    from x2i_tpu.ops.quant import dequantize_tree

    cfg = tiny_flux_config()
    qcfg = tiny_flux_config(quantized="w4a8")
    B, GRID, S_TXT = 1, 8, 8
    s_img = (GRID // 2) ** 2
    hidden = jnp.asarray(rng.standard_normal((B, s_img, cfg.in_channels)),
                         jnp.float32)
    encoder = jnp.asarray(
        rng.standard_normal((B, S_TXT, cfg.joint_attention_dim)), jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((B,), 0.5)
    img_ids = prepare_latent_image_ids(GRID, GRID)
    txt_ids = jnp.zeros((S_TXT, 3))

    model = FluxTransformer2D(cfg)
    params = model.init(jax.random.key(0), hidden, encoder, pooled, t,
                        img_ids, txt_ids)
    qtree = quantize_tree(params["params"], mode="w4a8")
    qmodel = FluxTransformer2D(qcfg)
    got = qmodel.apply({"params": qtree}, hidden, encoder, pooled, t,
                       img_ids, txt_ids)
    deq = model.apply({"params": dequantize_tree(qtree)}, hidden, encoder,
                      pooled, t, img_ids, txt_ids)
    want, got = np.asarray(deq, np.float32), np.asarray(got, np.float32)
    # int8 activation rounding separates the two (same class as w8a8)
    err = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert err.mean() < 0.05, err.mean()
    a = np.asarray(model.apply(params, hidden, encoder, pooled, t,
                               img_ids, txt_ids), np.float32).ravel()
    assert np.corrcoef(a, got.ravel())[0, 1] > 0.95
