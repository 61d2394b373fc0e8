"""Golden tests for ops: norms, RoPE conventions, attention (vs torch SDPA),
and the Pallas flash kernel in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from x2i_tpu.ops import flash_attention as fa
from x2i_tpu.ops.attention import attention
from x2i_tpu.ops.norms import layer_norm, rms_norm
from x2i_tpu.ops.rope import (apply_rope_half, apply_rope_interleaved,
                              flux_rope_freqs, rope_freqs_half)


def test_rms_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    want = torch.nn.functional.rms_norm(
        torch.tensor(x), (64,), torch.tensor(w), eps=1e-6).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    want = F.layer_norm(torch.tensor(x), (32,), torch.tensor(w),
                        torch.tensor(b), eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _torch_flux_rope(ids, axes_dim, theta=10000.0):
    """Reference math: diffusers FluxPosEmbed + get_1d_rotary_pos_embed with
    use_real=True, repeat_interleave_real=True."""
    cos_out, sin_out = [], []
    pos = torch.tensor(ids, dtype=torch.float64)
    for i, dim in enumerate(axes_dim):
        freqs = 1.0 / (theta ** (
            torch.arange(0, dim, 2, dtype=torch.float64) / dim))
        ang = torch.outer(pos[:, i], freqs)
        cos_out.append(ang.cos().repeat_interleave(2, dim=1))
        sin_out.append(ang.sin().repeat_interleave(2, dim=1))
    return (torch.cat(cos_out, -1).float().numpy(),
            torch.cat(sin_out, -1).float().numpy())


def test_flux_rope_freqs_match_reference_math(rng):
    ids = np.stack([np.zeros(40), np.repeat(np.arange(8), 5),
                    np.tile(np.arange(5), 8)], axis=1)
    cos, sin = flux_rope_freqs(jnp.asarray(ids), (16, 56, 56))
    tcos, tsin = _torch_flux_rope(ids, (16, 56, 56))
    np.testing.assert_allclose(np.asarray(cos), tcos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), tsin, atol=1e-5)


def test_apply_rope_interleaved_matches_torch(rng):
    """diffusers apply_rotary_emb(use_real=True, use_real_unbind_dim=-1)."""
    B, S, H, D = 1, 12, 2, 16
    x = rng.standard_normal((B, S, H, D)).astype(np.float32)
    ids = np.stack([np.arange(S), np.arange(S) * 2, np.zeros(S)], axis=1)
    cos, sin = flux_rope_freqs(jnp.asarray(ids), (4, 6, 6))
    got = apply_rope_interleaved(jnp.asarray(x), cos[:, None, :],
                                 sin[:, None, :])

    xt = torch.tensor(x)
    tc = torch.tensor(np.asarray(cos))[None, :, None, :]
    ts = torch.tensor(np.asarray(sin))[None, :, None, :]
    x_real, x_imag = xt.reshape(*xt.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    want = (xt * tc + x_rot * ts).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_apply_rope_half_matches_torch(rng):
    """LLaMA/Qwen2 rotate_half convention."""
    B, S, H, D = 2, 7, 3, 32
    x = rng.standard_normal((B, S, H, D)).astype(np.float32)
    pos = np.arange(S)
    cos, sin = rope_freqs_half(jnp.asarray(pos), D, theta=1e6)
    got = apply_rope_half(jnp.asarray(x), cos, sin)

    xt = torch.tensor(x)
    inv = 1.0 / (1e6 ** (torch.arange(0, D, 2).float() / D))
    ang = torch.outer(torch.tensor(pos).float(), inv)
    tc = torch.cat([ang.cos(), ang.cos()], -1)[None, :, None, :]
    ts = torch.cat([ang.sin(), ang.sin()], -1)[None, :, None, :]
    rot = torch.cat([-xt[..., D // 2:], xt[..., :D // 2]], -1)
    want = (xt * tc + rot * ts).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _torch_sdpa(q, k, v, causal=False, kv_mask=None):
    """q,k,v: (B, S, H, D) numpy; GQA-aware."""
    qt = torch.tensor(q).transpose(1, 2)
    kt = torch.tensor(k).transpose(1, 2)
    vt = torch.tensor(v).transpose(1, 2)
    attn_mask = None
    if kv_mask is not None:
        attn_mask = torch.tensor(kv_mask)[:, None, None, :]
    out = F.scaled_dot_product_attention(
        qt, kt, vt, attn_mask=attn_mask, is_causal=causal,
        enable_gqa=qt.shape[1] != kt.shape[1])
    return out.transpose(1, 2).numpy()


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("gqa", [1, 2])
def test_xla_attention_matches_torch_sdpa(rng, causal, gqa):
    B, S, H, D = 2, 24, 4, 16
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H // gqa, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H // gqa, D)).astype(np.float32)
    got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                    causal=causal, implementation="xla")
    want = _torch_sdpa(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_xla_attention_kv_mask(rng):
    B, S, H, D = 2, 16, 2, 8
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    mask = np.ones((B, S), bool)
    mask[:, 10:] = False
    got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                    kv_mask=jnp.asarray(mask), implementation="xla")
    want = _torch_sdpa(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_flash_matches_xla_interpret(rng, causal, monkeypatch):
    """Pallas kernel correctness via interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    B, H, S, D = 1, 1, 128, 64
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fa.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), causal=causal)
    want = fa.xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_flash_gqa_and_mask_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu
    B, Hq, Hk, S, D = 1, 4, 2, 128, 64
    q = rng.standard_normal((B, Hq, S, D)).astype(np.float32)
    k = rng.standard_normal((B, Hk, S, D)).astype(np.float32)
    v = rng.standard_normal((B, Hk, S, D)).astype(np.float32)
    mask = np.ones((B, S), bool)
    mask[:, 100:] = False
    with pltpu.force_tpu_interpret_mode():
        got = fa.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v), kv_mask=jnp.asarray(mask))
    want = fa.xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            kv_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_attention_grads_flow(rng):
    B, S, H, D = 1, 8, 2, 4
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))

    def loss(q, k, v):
        return jnp.sum(attention(q, k, v, implementation="xla") ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for t in g:
        assert np.isfinite(np.asarray(t)).all()
        assert float(jnp.abs(t).sum()) > 0


@pytest.mark.parametrize("causal,gqa,masked",
                         [(False, 1, False), (True, 1, False),
                          (False, 2, True), (True, 2, True)])
@pytest.mark.slow
def test_pallas_backward_matches_xla_interpret(rng, causal, gqa, masked):
    """Fused Pallas backward (dq/dk/dv) vs autodiff through the XLA path."""
    from jax.experimental.pallas import tpu as pltpu
    B, Hq, S, D = 1, 2, 128, 64
    Hk = Hq // gqa
    q = jnp.asarray(rng.standard_normal((B, Hq, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, S, D)), jnp.float32)
    mask = None
    if masked:
        m = np.ones((B, S), bool)
        m[:, 100:] = False
        mask = jnp.asarray(m)

    def loss_pallas(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, kv_mask=mask,
                                          causal=causal) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(fa.xla_attention(q, k, v, kv_mask=mask,
                                        causal=causal) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("causal,masked", [(False, False), (True, True)])
@pytest.mark.slow
def test_pallas_chunked_forward_interpret(rng, causal, masked):
    """Online-softmax chunked kernel == full-KV result."""
    from jax.experimental.pallas import tpu as pltpu
    from x2i_tpu.ops.flash_attention import _flash_forward_chunked
    B, H, S, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    mask = None
    if masked:
        m = np.ones((B, S), bool)
        m[:, 200:] = False
        mask = jnp.asarray(m)
    with pltpu.force_tpu_interpret_mode():
        got, lse = _flash_forward_chunked(q, k, v, mask, causal=causal,
                                          scale=0.125, block_q=128,
                                          block_k=128, return_lse=True)
    want = fa.xla_attention(q, k, v, kv_mask=mask, causal=causal,
                            scale=0.125)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
    assert np.isfinite(np.asarray(lse)).all()


def test_long_sequence_dispatch(rng, monkeypatch):
    """kv_seq > MAX_KV_SEQ routes to the chunked kernel and still grads."""
    from jax.experimental.pallas import tpu as pltpu
    import x2i_tpu.ops.flash_attention as famod
    monkeypatch.setattr(famod, "MAX_KV_SEQ", 128)   # force chunked path
    B, H, S, D = 1, 1, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = famod.flash_attention(q, k, v)
        g = jax.grad(lambda q: jnp.sum(
            famod.flash_attention(q, k, v) ** 2))(q)
    want = famod.xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
    gx = jax.grad(lambda q: jnp.sum(
        famod.xla_attention(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gx), atol=2e-3)


@pytest.mark.slow
def test_dispatcher_pads_odd_lengths_to_kernel(rng):
    """Odd joint sequence lengths (832^2-960^2 latent grids) must run the
    Pallas kernel via pad-and-mask, matching XLA attention exactly — the
    former 2.6x XLA-fallback cliff (ROUND1_NOTES.md item 7)."""
    from jax.experimental.pallas import tpu as pltpu

    from x2i_tpu.ops.attention import attention

    B, S, H, D = 1, 3216, 2, 64      # 104x104 grid + 512 txt -> 3216
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        implementation="pallas")
    want = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                     implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_dispatcher_pad_path_respects_kv_mask(rng):
    from jax.experimental.pallas import tpu as pltpu

    from x2i_tpu.ops.attention import attention

    B, S, H, D = 2, 200, 2, 64
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    mask = np.ones((B, S), bool)
    mask[:, 150:] = False
    with pltpu.force_tpu_interpret_mode():
        got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        kv_mask=jnp.asarray(mask),
                        implementation="pallas")
    want = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                     kv_mask=jnp.asarray(mask), implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_half_rope_layout_matches_interleaved(rng):
    """flux_rope_freqs_half + apply_rope_half on half_layout_perm-permuted
    channels == permuted apply_rope_interleaved: the q.k scores (and so
    attention outputs) are invariant to the shared permutation."""
    from x2i_tpu.ops.rope import (apply_rope_half, apply_rope_interleaved,
                                  flux_rope_freqs, flux_rope_freqs_half,
                                  half_layout_perm)

    axes = (8, 12, 12)
    D = sum(axes)
    S, H = 10, 3
    ids = jnp.asarray(rng.integers(0, 50, (S, 3)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, S, H, D)), jnp.float32)

    cos_i, sin_i = flux_rope_freqs(ids, axes)
    want = apply_rope_interleaved(x, cos_i[:, None, :], sin_i[:, None, :])

    perm = half_layout_perm(D)
    cos_h, sin_h = flux_rope_freqs_half(ids, axes)
    got = apply_rope_half(x[..., perm], cos_h, sin_h)

    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(want)[..., perm], atol=1e-6)


def _rope_tables(rng, S, D):
    from x2i_tpu.ops.rope import flux_rope_freqs_half
    ids = jnp.asarray(rng.integers(0, 50, (S, 3)), jnp.float32)
    d3 = D // 4
    return flux_rope_freqs_half(ids, (D - 2 * d3, d3, d3))


def _preapply_bhsd(x, cos, sin):
    from x2i_tpu.ops.rope import apply_rope_half
    return jnp.swapaxes(apply_rope_half(jnp.swapaxes(x, 1, 2), cos, sin),
                        1, 2)


def test_flash_kernel_rope_matches_preapplied(rng):
    """In-kernel rope (rotate-half via lane roll + signed sin, K rotated
    once per head into scratch) == rope applied in XLA before the kernel."""
    from jax.experimental.pallas import tpu as pltpu
    B, H, S, D = 1, 2, 256, 128
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    cos, sin = _rope_tables(rng, S, D)
    with pltpu.force_tpu_interpret_mode():
        got = fa.flash_attention(q, k, v, rope=(cos, sin))
        want = fa.flash_attention(_preapply_bhsd(q, cos, sin),
                                  _preapply_bhsd(k, cos, sin), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize("gqa", [False, True])
def test_flash_kernel_rope_grads_match(rng, gqa):
    """Backward through the rope-fused kernel: cotangents are counter-
    rotated through the orthogonal transpose map. The GQA case exercises
    the dkv kernel's per-group rotated-Q scratch."""
    from jax.experimental.pallas import tpu as pltpu
    B, H, S, D = 1, 2, 128, 128
    HK = 1 if gqa else H
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, HK, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, HK, S, D)), jnp.float32)
    cos, sin = _rope_tables(rng, S, D)

    def loss_fused(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, rope=(cos, sin)) ** 2)

    def loss_pre(q, k, v):
        return jnp.sum(fa.flash_attention(_preapply_bhsd(q, cos, sin),
                                          _preapply_bhsd(k, cos, sin),
                                          v) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(loss_pre, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-4)


def test_flash_kernel_rope_grads_masked_causal(rng):
    """Rope-fused backward with a kv mask AND causal: the dkv kernel's
    (BK, Sq) orientation masks score ROWS with the (BK, 1) kv mask and
    builds the causal predicate kv-major (hardware-validated 2026-08-19;
    this pins the interpret-mode equivalence)."""
    from jax.experimental.pallas import tpu as pltpu
    B, H, S, D = 2, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    cos, sin = _rope_tables(rng, S, D)
    m = np.ones((B, S), bool)
    m[:, S - 37:] = False
    kv_mask = jnp.asarray(m)

    def loss_fused(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, kv_mask=kv_mask,
                                          causal=True,
                                          rope=(cos, sin)) ** 2)

    def loss_pre(q, k, v):
        return jnp.sum(fa.flash_attention(_preapply_bhsd(q, cos, sin),
                                          _preapply_bhsd(k, cos, sin), v,
                                          kv_mask=kv_mask,
                                          causal=True) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(loss_pre, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-4)


def test_dispatcher_rope_pad_path(rng):
    """attention(rope=...) through the pad-and-mask dispatcher (odd S)
    == XLA path with rope pre-applied."""
    from jax.experimental.pallas import tpu as pltpu
    B, S, H, D = 1, 200, 2, 128
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    cos, sin = _rope_tables(rng, S, D)
    with pltpu.force_tpu_interpret_mode():
        got = attention(q, k, v, rope=(cos, sin), implementation="pallas")
    want = attention(q, k, v, rope=(cos, sin), implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_ring_attention_matches_full(rng):
    """Ring attention over a 4-device ring == full-sequence attention
    (exact log-space merge, not an approximation)."""
    from jax.sharding import Mesh

    from x2i_tpu.ops.ring_attention import ring_attention

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    B, S, H, D = 2, 256, 3, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "tensor"))
    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda q, k, v: ring_attention(q, k, v, "tensor", 4))(q, k, v)
    want = attention(q, k, v, implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)
    with pytest.raises(ValueError):
        ring_attention(q[:, :255], k[:, :255], v[:, :255], "tensor", 4)


def test_ring_attention_grads_match_full(rng):
    """Reverse-ring backward: grads of ring attention == grads of full
    attention (dk/dv make the complete circle back to their owners)."""
    from jax.sharding import Mesh

    from x2i_tpu.ops.ring_attention import ring_attention

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    B, S, H, D = 1, 128, 2, 32
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, "tensor", 4) * w)

    def loss_full(q, k, v):
        return jnp.sum(attention(q, k, v, implementation="xla") * w)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "tensor"))
    with jax.set_mesh(mesh):
        gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_flash_kernel_qk_norm_matches_preapplied(rng):
    """In-kernel qk_norm (per-head-dim RMSNorm folded before the in-kernel
    rotation) == rms_norm applied in XLA before the rope-fused kernel."""
    from jax.experimental.pallas import tpu as pltpu

    from x2i_tpu.ops.norms import rms_norm
    B, H, S, D = 1, 2, 256, 128
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    qw = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32)
    kw = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32)
    cos, sin = _rope_tables(rng, S, D)
    with pltpu.force_tpu_interpret_mode():
        got = fa.flash_attention(q, k, v, rope=(cos, sin),
                                 qk_norm=(qw, kw, 1e-6))
        want = fa.flash_attention(rms_norm(q, qw), rms_norm(k, kw), v,
                                  rope=(cos, sin))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_attention_qk_norm_xla_fallback(rng):
    """attention(qk_norm=...) on the XLA path == module-order norm+rope."""
    from x2i_tpu.ops.norms import rms_norm
    from x2i_tpu.ops.rope import apply_rope_half, rope_freqs_half
    B, S, H, D = 1, 64, 2, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    qw = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32)
    kw = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.float32)
    pos = jnp.arange(S, dtype=jnp.float32)
    cos, sin = rope_freqs_half(pos, D, 10000.0)
    got = attention(q, k, v, rope=(cos, sin), qk_norm=(qw, kw, 1e-6),
                    implementation="xla")
    want = attention(apply_rope_half(rms_norm(q, qw), cos, sin),
                     apply_rope_half(rms_norm(k, kw), cos, sin), v,
                     implementation="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_pipelined_softmax_matches_monolithic(rng, monkeypatch):
    """The software-pipelined softmax (KV-chunked scores, no row-max
    subtraction — exact by the clamp argument in _flash_kernel) must
    match the monolithic exact body bit-for-bit within f32 tolerance,
    with and without in-kernel rope + qk-norm."""
    from jax.experimental.pallas import tpu as pltpu
    B, H, S, D = 1, 2, 256, 128
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    cos, sin = _rope_tables(rng, S, D)
    qw = jnp.asarray(rng.uniform(0.5, 1.5, (D,)), jnp.float32)
    kw = jnp.asarray(rng.uniform(0.5, 1.5, (D,)), jnp.float32)
    for kwargs in ({}, {"rope": (cos, sin)},
                   {"rope": (cos, sin), "qk_norm": (qw, kw, 1e-6)}):
        with pltpu.force_tpu_interpret_mode():
            monkeypatch.setenv("X2I_FA_PIPELINE", "0")
            want = fa.flash_attention(q, k, v, **kwargs)
            monkeypatch.setenv("X2I_FA_PIPELINE", "1")
            monkeypatch.setenv("X2I_FA_PIPELINE_KC", "128")
            got = fa.flash_attention(q, k, v, **kwargs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)
