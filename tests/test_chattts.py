"""MiniCPM-o TTS stack: DVAE/ConvNeXt golden vs torch mirrors, FSQ
invariants, ConditionalChatTTS prefill/generate, vocoder ISTFT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from x2i_tpu.models.chattts import (ChatTTSConfig, ConditionalChatTTS,

                                    ConvNeXt1DBlock, DVAE, DVAEDecoder,
                                    VocosVocoder, fsq_codes_to_indices,
                                    fsq_indices_to_codes, fsq_quantize,
                                    make_generation_kv_mask)

pytestmark = pytest.mark.slow


def _torch_convnext(dim, inter, kernel, dilation):
    """Mirror of the reference ConvNeXtBlock
    (modeling_minicpmo.py:2208-2259)."""
    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.dwconv = tnn.Conv1d(dim, dim, kernel,
                                     padding=dilation * (kernel // 2),
                                     dilation=dilation, groups=dim)
            self.norm = tnn.LayerNorm(dim, eps=1e-6)
            self.pw1 = tnn.Linear(dim, inter)
            self.pw2 = tnn.Linear(inter, dim)
            self.coef = tnn.Parameter(torch.full((dim,), 1e-6))

        def forward(self, x):          # (B, C, T)
            r = x
            y = self.dwconv(x).transpose(1, 2)
            y = self.pw2(tnn.functional.gelu(self.pw1(self.norm(y))))
            return r + (y * self.coef).transpose(1, 2)
    return Block()


def test_convnext_block_matches_torch(rng):
    dim, inter, k, dil, T = 16, 64, 7, 2, 20
    tb = _torch_convnext(dim, inter, k, dil)
    x = rng.standard_normal((2, T, dim)).astype(np.float32)

    jb = ConvNeXt1DBlock(dim, inter, k, dil)
    params = jb.init(jax.random.key(0), jnp.asarray(x))
    # copy torch weights -> flax tree
    p = params["params"]
    p["dwconv"]["kernel"] = jnp.asarray(
        tb.dwconv.weight.detach().numpy().transpose(2, 1, 0))
    p["dwconv"]["bias"] = jnp.asarray(tb.dwconv.bias.detach().numpy())
    p["norm"]["scale"] = jnp.asarray(tb.norm.weight.detach().numpy())
    p["norm"]["bias"] = jnp.asarray(tb.norm.bias.detach().numpy())
    p["pwconv1"]["kernel"] = jnp.asarray(tb.pw1.weight.detach().numpy().T)
    p["pwconv1"]["bias"] = jnp.asarray(tb.pw1.bias.detach().numpy())
    p["pwconv2"]["kernel"] = jnp.asarray(tb.pw2.weight.detach().numpy().T)
    p["pwconv2"]["bias"] = jnp.asarray(tb.pw2.bias.detach().numpy())
    p["coef"] = jnp.asarray(tb.coef.detach().numpy())

    got = jb.apply({"params": p}, jnp.asarray(x))
    want = tb(torch.tensor(x).transpose(1, 2)).transpose(1, 2)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=2e-5)


def test_fsq_roundtrip():
    """indices -> codes -> indices is the identity; quantize lands on the
    code lattice."""
    levels = (5, 5, 5, 5)
    n = int(np.prod(levels))
    idx = jnp.arange(n)
    codes = fsq_indices_to_codes(idx, levels)
    assert codes.shape == (n, 4)
    assert float(jnp.max(jnp.abs(codes))) <= 1.0
    back = fsq_codes_to_indices(codes, levels)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))

    z = jnp.asarray(np.random.default_rng(0).standard_normal((32, 4)),
                    jnp.float32)
    q = fsq_quantize(z, levels)
    # every quantized vector is a valid lattice point
    rt = fsq_indices_to_codes(fsq_codes_to_indices(q, levels), levels)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(q), atol=1e-6)


def test_dvae_shapes_and_roundtrip(rng):
    """encode: (B, T, 100) -> (B, T/2, 4) codes in range; decode returns
    (B, T, 100); decode(encode(x)) is finite and code-stable."""
    dvae = DVAE()
    mel = jnp.asarray(rng.standard_normal((1, 16, 100)) * 0.5 + 1.0,
                      jnp.float32)
    params = dvae.init(jax.random.key(0), mel, method=dvae.encode_decode)
    codes = dvae.apply(params, mel, method=dvae.encode)
    assert codes.shape == (1, 8, 4)
    assert int(jnp.min(codes)) >= 0 and int(jnp.max(codes)) < 625

    out = dvae.apply(params, codes, method=dvae.decode)
    assert out.shape == (1, 16, 100)
    assert np.isfinite(np.asarray(out)).all()

    # quantization idempotence: re-encoding the decoder's input feats is
    # covered by FSQ roundtrip; here decode must be deterministic
    out2 = dvae.apply(params, codes, method=dvae.decode)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def _tiny_tts_cfg():
    return ChatTTSConfig(
        llm_dim=32, hidden_size=64, intermediate_size=128,
        num_attention_heads=4, num_hidden_layers=2, num_audio_tokens=50,
        num_text_tokens=120, num_vq=4, spk_emb_token_id=100,
        audio_bos_token_id=101, streaming_text_reserved_len=24,
        streaming_text_chunk_size=4, streaming_audio_chunk_size=6,
        top_k=5, top_p=0.9)


def test_chattts_prefill_and_generate(rng):
    """Text prefill -> audio generation: codes in range, cache advances,
    eos stops the counter."""
    cfg = _tiny_tts_cfg()
    model = ConditionalChatTTS(cfg)
    cond = cfg.condition_length
    max_len = cond + 16

    ids = np.full((1, 2 + cfg.streaming_text_reserved_len), 3)
    ids[0, 1] = cfg.spk_emb_token_id            # [Stts][spk][text...]
    ids = jnp.asarray(ids)
    positions = jnp.arange(ids.shape[1])[None]
    spk = jnp.asarray(rng.standard_normal((1, 1, cfg.llm_dim)),
                      jnp.float32)

    cache0 = model.init_cache(max_len)
    text_mask = jnp.ones((cfg.streaming_text_reserved_len,), bool)
    variables = model.init(
        {"params": jax.random.key(0)}, ids, positions, cache0, spk,
        jnp.zeros((1, 1, cfg.num_vq), jnp.int32), text_mask,
        method=ConditionalChatTTS.init_all)
    cache = model.apply(variables, ids, positions, cache0, spk,
                        method=model.prefill_text)
    assert cache[0].shape[2] == max_len

    audio_buf = jnp.zeros((1, 16, cfg.num_vq), jnp.int32)
    audio_ids, cache, n, finished = model.apply(
        variables, audio_buf, cache, jnp.asarray(cond - 1), text_mask,
        jax.random.key(1), 12, 2, method=model.generate)
    n = int(n)
    assert 2 <= n <= 12
    got = np.asarray(audio_ids)[0, :n]
    assert (got >= 0).all() and (got < cfg.num_audio_tokens).all()


def test_generation_kv_mask_streaming_semantics():
    """Text visibility is gated by how many audio chunks were generated
    (make_streaming_chunk_mask_generation, :2464-2530)."""
    cfg = _tiny_tts_cfg()
    prefix = 1 + cfg.num_spk_embs
    reserved = cfg.streaming_text_reserved_len
    kv_len = cfg.condition_length + 20
    text_mask = jnp.zeros((reserved,), bool).at[:8].set(True)

    # right at the first audio position: 1 chunk of text visible
    past = cfg.condition_length - 1
    m = np.asarray(make_generation_kv_mask(cfg, text_mask, kv_len,
                                           jnp.asarray(past)))[0]
    assert m[0] and m[prefix - 1]                      # bos + spk visible
    chunks = int(np.ceil((past - reserved) / cfg.streaming_audio_chunk_size))
    vis = min(chunks * cfg.streaming_text_chunk_size, reserved)
    vis = min(vis, 8)                                  # prefilled only
    np.testing.assert_array_equal(m[prefix:prefix + reserved],
                                  np.arange(reserved) < vis)
    assert not m[past + 1:].any()                      # beyond current pos

    # after many audio tokens: more text chunks become visible
    past2 = cfg.condition_length - 1 + 2 * cfg.streaming_audio_chunk_size
    m2 = np.asarray(make_generation_kv_mask(cfg, text_mask, kv_len,
                                            jnp.asarray(past2)))[0]
    assert m2[prefix:prefix + reserved].sum() >= m[
        prefix:prefix + reserved].sum()


def test_vocos_vocoder_istft(rng):
    """Vocoder output has hop*T samples and reconstructs finite audio."""
    voc = VocosVocoder(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    mel = jnp.asarray(rng.standard_normal((2, 12, 20)), jnp.float32)
    params = voc.init(jax.random.key(0), mel)
    audio = voc.apply(params, mel)
    assert audio.shape == (2, (12 - 1) * 16 + 64 - 64)
    assert np.isfinite(np.asarray(audio)).all()


def test_dvae_decoder_matches_torch(rng):
    """DVAEDecoder conv_in/out graph vs a torch mirror
    (modeling_minicpmo.py:2306-2345)."""
    idim, odim, hidden, bn, n_layer = 12, 10, 16, 8, 2

    class TDec(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c0 = tnn.Conv1d(idim, bn, 3, 1, 1)
            self.c1 = tnn.Conv1d(bn, hidden, 3, 1, 1)
            self.blocks = tnn.ModuleList(
                [_torch_convnext(hidden, hidden * 4, 7, 2)
                 for _ in range(n_layer)])
            self.out = tnn.Conv1d(hidden, odim, 1, bias=False)

        def forward(self, x):          # (B, C, T)
            y = self.c1(tnn.functional.gelu(self.c0(x)))
            for b in self.blocks:
                y = b(y)
            return self.out(y)

    td = TDec()
    x = rng.standard_normal((1, 14, idim)).astype(np.float32)
    jd = DVAEDecoder(idim, odim, n_layer=n_layer, bn_dim=bn, hidden=hidden)
    params = jd.init(jax.random.key(0), jnp.asarray(x))
    p = params["params"]

    def conv_w(c):
        return jnp.asarray(c.weight.detach().numpy().transpose(2, 1, 0))

    p["conv_in0"]["kernel"] = conv_w(td.c0)
    p["conv_in0"]["bias"] = jnp.asarray(td.c0.bias.detach().numpy())
    p["conv_in1"]["kernel"] = conv_w(td.c1)
    p["conv_in1"]["bias"] = jnp.asarray(td.c1.bias.detach().numpy())
    p["conv_out"]["kernel"] = conv_w(td.out)
    for i, tb in enumerate(td.blocks):
        bp = p[f"block_{i}"]
        bp["dwconv"]["kernel"] = conv_w(tb.dwconv)
        bp["dwconv"]["bias"] = jnp.asarray(tb.dwconv.bias.detach().numpy())
        bp["norm"]["scale"] = jnp.asarray(tb.norm.weight.detach().numpy())
        bp["norm"]["bias"] = jnp.asarray(tb.norm.bias.detach().numpy())
        bp["pwconv1"]["kernel"] = jnp.asarray(
            tb.pw1.weight.detach().numpy().T)
        bp["pwconv1"]["bias"] = jnp.asarray(tb.pw1.bias.detach().numpy())
        bp["pwconv2"]["kernel"] = jnp.asarray(
            tb.pw2.weight.detach().numpy().T)
        bp["pwconv2"]["bias"] = jnp.asarray(tb.pw2.bias.detach().numpy())
        bp["coef"] = jnp.asarray(tb.coef.detach().numpy())

    got = jd.apply({"params": p}, jnp.asarray(x))
    want = td(torch.tensor(x).transpose(1, 2)).transpose(1, 2)
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=3e-5)


def _fake_dvae_state_dict(rng):
    """Numpy state dict with the reference DVAE names/shapes
    (modeling_minicpmo.py:2349-2427)."""
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    sd = {
        "dvae.coef": r(1, 100, 1),
        "dvae.downsample_conv.0.weight": r(512, 100, 3),
        "dvae.downsample_conv.0.bias": r(512),
        "dvae.downsample_conv.2.weight": r(512, 512, 4),
        "dvae.downsample_conv.2.bias": r(512),
        "dvae.out_conv.weight": r(100, 512, 3),
    }
    for name, idim, odim in (("encoder", 512, 1024), ("decoder", 512, 512)):
        p = f"dvae.{name}."
        sd[p + "conv_in.0.weight"] = r(128, idim, 3)
        sd[p + "conv_in.0.bias"] = r(128)
        sd[p + "conv_in.2.weight"] = r(256, 128, 3)
        sd[p + "conv_in.2.bias"] = r(256)
        sd[p + "conv_out.weight"] = r(odim, 256, 1)
        for i in range(12):
            b = p + f"decoder_block.{i}."
            sd[b + "dwconv.weight"] = r(256, 1, 7)
            sd[b + "dwconv.bias"] = r(256)
            sd[b + "norm.weight"] = r(256)
            sd[b + "norm.bias"] = r(256)
            sd[b + "pwconv1.weight"] = r(1024, 256)
            sd[b + "pwconv1.bias"] = r(1024)
            sd[b + "pwconv2.weight"] = r(256, 1024)
            sd[b + "pwconv2.bias"] = r(256)
            sd[b + "coef"] = r(256)
    for g in (0, 1):
        b = f"dvae.vq_layer.quantizer.rvqs.{g}."
        sd[b + "project_in.weight"] = r(4, 512)
        sd[b + "project_in.bias"] = r(4)
        sd[b + "project_out.weight"] = r(512, 4)
        sd[b + "project_out.bias"] = r(512)
    return sd


def test_dvae_converter_roundtrip(rng):
    """dvae_params_from_reference produces a tree the DVAE accepts; encode
    and decode run with converted weights."""
    from x2i_tpu.convert.torch_models import dvae_params_from_reference
    sd = _fake_dvae_state_dict(rng)
    params = {"params": dvae_params_from_reference(sd)}
    dvae = DVAE()
    ref = dvae.init(jax.random.key(0),
                    jnp.zeros((1, 8, 100)), method=dvae.encode_decode)
    # identical tree structure
    assert (jax.tree_util.tree_structure(ref["params"])
            == jax.tree_util.tree_structure(params["params"]))
    mel = jnp.asarray(rng.standard_normal((1, 8, 100)), jnp.float32)
    codes = dvae.apply(params, mel, method=dvae.encode)
    out = dvae.apply(params, codes, method=dvae.decode)
    assert out.shape == (1, 8, 100) and np.isfinite(np.asarray(out)).all()


def test_weight_norm_head_matches_torch(rng):
    """The converted weight-norm head equals torch's weight_norm linear."""
    from x2i_tpu.convert.torch_models import _weight_norm
    lin = tnn.Linear(16, 30, bias=False)
    wn = torch.nn.utils.parametrizations.weight_norm(lin)
    sd = {f"head_code.0.{k}": v for k, v in wn.state_dict().items()}
    v, g = _weight_norm(sd, "head_code.0.")
    x = rng.standard_normal((4, 16)).astype(np.float32)
    want = wn(torch.tensor(x)).detach().numpy()
    w = v * (g / np.linalg.norm(v, axis=0))[None, :]
    np.testing.assert_allclose(x @ w, want, atol=1e-5)


def test_chattts_converter_structure(rng):
    """chattts_params_from_reference matches the flax tree structure."""
    from x2i_tpu.convert.torch_models import chattts_params_from_reference
    cfg = _tiny_tts_cfg()
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.05
    H, I = cfg.hidden_size, cfg.intermediate_size
    sd = {
        "tts.emb_text.weight": r(cfg.num_text_tokens, H),
        "tts.model.norm.weight": r(H),
        "tts.projector.linear1.weight": r(H, cfg.llm_dim),
        "tts.projector.linear1.bias": r(H),
        "tts.projector.linear2.weight": r(H, H),
        "tts.projector.linear2.bias": r(H),
    }
    for i in range(cfg.num_vq):
        sd[f"tts.emb_code.{i}.weight"] = r(cfg.num_audio_tokens, H)
        sd[f"tts.head_code.{i}.weight_g"] = r(cfg.num_audio_tokens, 1)
        sd[f"tts.head_code.{i}.weight_v"] = r(cfg.num_audio_tokens, H)
    for l in range(cfg.num_hidden_layers):
        p = f"tts.model.layers.{l}."
        sd[p + "input_layernorm.weight"] = r(H)
        sd[p + "post_attention_layernorm.weight"] = r(H)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[p + f"self_attn.{n}.weight"] = r(H, H)
        sd[p + "mlp.gate_proj.weight"] = r(I, H)
        sd[p + "mlp.up_proj.weight"] = r(I, H)
        sd[p + "mlp.down_proj.weight"] = r(H, I)
    params = {"params": chattts_params_from_reference(sd, cfg)}

    model = ConditionalChatTTS(cfg)
    ids = jnp.full((1, 2 + cfg.streaming_text_reserved_len), 3)
    positions = jnp.arange(ids.shape[1])[None]
    spk = jnp.asarray(rng.standard_normal((1, 1, cfg.llm_dim)), jnp.float32)
    cache0 = model.init_cache(cfg.condition_length + 4)
    text_mask = jnp.ones((cfg.streaming_text_reserved_len,), bool)
    ref = model.init({"params": jax.random.key(0)}, ids, positions, cache0,
                     spk, jnp.zeros((1, 1, cfg.num_vq), jnp.int32),
                     text_mask, method=ConditionalChatTTS.init_all)
    assert (jax.tree_util.tree_structure(ref["params"])
            == jax.tree_util.tree_structure(params["params"]))
    logits = model.apply(params, ids, positions, cache0, spk,
                         jnp.zeros((1, 1, cfg.num_vq), jnp.int32),
                         text_mask, method=model.init_all)
    assert np.isfinite(np.asarray(logits)).all()
