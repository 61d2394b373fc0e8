"""ChatTTS GPT + DVAE decoder goldens vs the REFERENCE's own torch code.

Round-1 validated these modules against builder-written torch mirrors;
here the reference implementation itself (minicpm/modeling_minicpmo.py,
executed with random weights) is the oracle — the same pattern the
InternLM2 goldens use. The TTS deps the image path never touches
(librosa/soundfile/vocos/vector_quantize_pytorch) are stubbed; GFSQ
cannot be constructed without vector_quantize_pytorch, so the DVAE
golden covers the decoder/out-conv/coef path from embedded features and
the GPT golden covers prefill + the masked decode step end to end.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow


def _stub(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref():
    """Import the reference minicpm modeling module with its unused audio
    deps stubbed and removed transformers 4.x symbols shimmed."""
    if "minicpm.modeling_minicpmo" in sys.modules:
        return sys.modules["minicpm.modeling_minicpmo"]
    lib = _stub("librosa")
    lib.power_to_db = lambda s: 10 * np.log10(np.maximum(1e-10, s))
    _stub("soundfile")
    vq = _stub("vector_quantize_pytorch")

    class _FakeGRFSQ(torch.nn.Module):
        """Constructor-only stand-in; the DVAE golden nulls vq_layer."""

        def __init__(self, **kw):
            super().__init__()

    vq.GroupedResidualFSQ = _FakeGRFSQ
    v = _stub("vocos")
    v.Vocos = object
    vp = _stub("vocos.pretrained")
    vp.instantiate_class = lambda *a, **k: None

    import transformers.models.whisper.modeling_whisper as WM
    if not hasattr(WM, "WHISPER_ATTENTION_CLASSES"):
        WM.WHISPER_ATTENTION_CLASSES = {"eager": WM.WhisperAttention,
                                        "sdpa": WM.WhisperAttention}
    tf = sys.modules["transformers"]
    try:
        from transformers import LogitsWarper  # noqa: F401
    except ImportError:
        from transformers import LogitsProcessor
        tf.LogitsWarper = LogitsProcessor

    sys.path.insert(0, "/root/reference")
    try:
        # the vendored resampler relies on old torch star-exports of
        # typing names; pre-seed them in a module object we exec ourselves
        import typing

        import minicpm  # the package __init__ is empty/safe
        spec = importlib.util.spec_from_file_location(
            "minicpm.resampler", "/root/reference/minicpm/resampler.py")
        rs = importlib.util.module_from_spec(spec)
        rs.List = typing.List
        rs.Dict = typing.Dict
        sys.modules["minicpm.resampler"] = rs
        spec.loader.exec_module(rs)
        import minicpm.modeling_minicpmo as M
    finally:
        sys.path.remove("/root/reference")
    return M


import importlib.util  # noqa: E402  (used in the fixture)


def _tiny_cfgs(ref):
    from minicpm.configuration_minicpm import ConditionalChatTTSConfig

    from x2i_tpu.models.chattts import ChatTTSConfig

    kw = dict(llm_dim=32, hidden_size=64, intermediate_size=128,
              num_attention_heads=4, num_hidden_layers=2,
              num_audio_tokens=50, num_text_tokens=120, num_vq=4,
              spk_emb_token_id=100, audio_bos_token_id=101,
              streaming_text_reserved_len=16, streaming_text_chunk_size=4,
              streaming_audio_chunk_size=6)
    ours = ChatTTSConfig(**kw)
    theirs = ConditionalChatTTSConfig(
        **kw, use_speaker_embedding=True, use_llm_hidden_state=False,
        use_text=True, streaming=True, use_mlp=True,
        num_spk_embs=1, attn_implementation="sdpa")
    return ours, theirs


@pytest.fixture(scope="module")
def models(ref):
    """Reference ConditionalChatTTS (random weights, DVAE stubbed out of
    __init__) + our flax twin built from its converted state dict."""
    import jax
    import jax.numpy as jnp

    from x2i_tpu.convert.torch_models import chattts_params_from_reference
    from x2i_tpu.models.chattts import ConditionalChatTTS

    our_cfg, ref_cfg = _tiny_cfgs(ref)
    orig_dvae = ref.DVAE
    ref.DVAE = lambda: torch.nn.Identity()
    try:
        torch.manual_seed(0)
        rmodel = ref.ConditionalChatTTS(ref_cfg).eval().float()
    finally:
        ref.DVAE = orig_dvae

    # the installed transformers no longer accepts legacy list caches;
    # the reference code passes/indexes them, so adapt at the boundary
    from transformers.cache_utils import DynamicCache
    orig_forward = rmodel.model.forward

    def fwd(*a, past_key_values=None, **k):
        if isinstance(past_key_values, (list, tuple)):
            past_key_values = DynamicCache.from_legacy_cache(
                tuple(tuple(p) for p in past_key_values))
        out = orig_forward(*a, past_key_values=past_key_values, **k)
        if out.past_key_values is not None and not isinstance(
                out.past_key_values, (list, tuple)):
            out.past_key_values = list(out.past_key_values
                                       .to_legacy_cache())
        return out

    rmodel.model.forward = fwd

    params = {"params": chattts_params_from_reference(
        rmodel.state_dict(), our_cfg, prefix="")}
    return rmodel, ConditionalChatTTS(our_cfg), params, our_cfg


def _ref_cache(ref_model, max_len):
    cfg = ref_model.model.config
    hd = cfg.hidden_size // cfg.num_attention_heads
    return [(torch.zeros(1, cfg.num_attention_heads, max_len, hd),
             torch.zeros(1, cfg.num_attention_heads, max_len, hd))
            for _ in range(cfg.num_hidden_layers)]


def test_prefill_text_cache_matches_reference(models):
    import jax
    import jax.numpy as jnp

    rmodel, ours, params, cfg = models
    rng = np.random.default_rng(0)
    n_text = 10
    reserved = cfg.streaming_text_reserved_len
    ids = [99] + [cfg.spk_emb_token_id] + list(
        rng.integers(0, 90, n_text)) + [0] * (reserved - n_text)
    S = len(ids)
    max_len = S + 1 + 8
    spk = rng.standard_normal((1, 1, cfg.llm_dim)).astype(np.float32)

    rcache = _ref_cache(rmodel, max_len)
    with torch.no_grad():
        rcache = rmodel.prefill_text(
            input_ids=torch.tensor([ids]),
            position_ids=torch.arange(S)[None],
            past_key_values=rcache,
            lm_spk_emb_last_hidden_states=torch.tensor(spk))

    cache0 = ours.init_cache(max_len)
    k_all, v_all = ours.apply(
        params, jnp.asarray([ids]), jnp.arange(S)[None], cache0,
        jnp.asarray(spk), method=ours.prefill_text)

    for layer in range(cfg.num_hidden_layers):
        want_k = rcache[layer][0][0, :, :S].numpy()        # (H, S, D)
        want_v = rcache[layer][1][0, :, :S].numpy()
        got_k = np.asarray(k_all[layer, 0, :S]).transpose(1, 0, 2)
        got_v = np.asarray(v_all[layer, 0, :S]).transpose(1, 0, 2)
        np.testing.assert_allclose(got_k, want_k, atol=2e-4,
                                   err_msg=f"k layer {layer}")
        np.testing.assert_allclose(got_v, want_v, atol=2e-4,
                                   err_msg=f"v layer {layer}")


def test_decode_step_logits_match_reference(models, ref):
    """Audio-bos decode step: reference model forward under its own
    make_streaming_chunk_mask_generation vs our decode_step with
    make_generation_kv_mask — backbone, masks, and weight-normed logit
    heads all in one equality."""
    import jax.numpy as jnp

    rmodel, ours, params, cfg = models
    rng = np.random.default_rng(1)
    n_text = 10
    reserved = cfg.streaming_text_reserved_len
    ids = [99] + [cfg.spk_emb_token_id] + list(
        rng.integers(0, 90, n_text)) + [0] * (reserved - n_text)
    S = len(ids)                           # 1 + 1 + reserved
    max_len = S + 1 + 8
    spk = rng.standard_normal((1, 1, cfg.llm_dim)).astype(np.float32)

    # reference: prefill, then one forward at the audio-bos position
    rcache = _ref_cache(rmodel, max_len)
    with torch.no_grad():
        rcache = rmodel.prefill_text(
            input_ids=torch.tensor([ids]),
            position_ids=torch.arange(S)[None],
            past_key_values=rcache,
            lm_spk_emb_last_hidden_states=torch.tensor(spk))
        past_seen = S
        emb = rmodel.emb_text(
            torch.full((1, 1), cfg.audio_bos_token_id))
        # text mask over [Stts][spk][reserved][Ptts]
        tmask = torch.ones(1 + 1 + reserved + 1, dtype=torch.long)
        tmask[2 + n_text:2 + reserved] = 0
        mask = ref.make_streaming_chunk_mask_generation(
            inputs_embeds=emb, past_seen_tokens=past_seen,
            streaming_tts_text_mask=tmask,
            streaming_reserved_length=reserved,
            streaming_audio_chunk_size=cfg.streaming_audio_chunk_size,
            streaming_text_chunk_size=cfg.streaming_text_chunk_size)
        trimmed = [(k[:, :, :past_seen], v[:, :, :past_seen])
                   for k, v in rcache]
        out = rmodel.model(
            inputs_embeds=emb,
            position_ids=torch.tensor([[past_seen]]),
            past_key_values=trimmed, use_cache=True,
            attention_mask=mask,
            cache_position=torch.tensor([past_seen]))
        hidden = out.last_hidden_state[:, -1]
        want = torch.stack(
            [rmodel.head_code[i](hidden) for i in range(cfg.num_vq)],
            dim=2).numpy()                 # (1, V, num_vq)

    # ours: same prefill, then decode_step at the same position
    cache = ours.apply(params, jnp.asarray([ids]), jnp.arange(S)[None],
                       ours.init_cache(max_len), jnp.asarray(spk),
                       method=ours.prefill_text)
    text_mask = jnp.asarray([True] * n_text
                            + [False] * (reserved - n_text))
    embeds = ours.apply(params, jnp.full((1, 1), cfg.audio_bos_token_id),
                        method=lambda m, i: m.emb_text(i))
    logits, _ = ours.apply(params, embeds, cache,
                           jnp.asarray(past_seen), text_mask,
                           method=ours.decode_step)
    got = np.asarray(logits)[:, None]      # (1, 1, V? ...)
    np.testing.assert_allclose(np.squeeze(got), np.squeeze(want),
                               atol=3e-4)


def test_dvae_decoder_matches_reference(models, ref):
    """DVAEDecoder (ConvNeXt stack) + out conv + coef vs the reference
    DVAE decode path from embedded features (GFSQ needs
    vector_quantize_pytorch and is excluded)."""
    import jax.numpy as jnp

    from x2i_tpu.convert.torch_models import dvae_params_from_reference
    from x2i_tpu.models.chattts import DVAE

    torch.manual_seed(2)
    rdvae = ref.DVAE().eval().float()
    rdvae.vq_layer = None                  # decode from features directly

    rng = np.random.default_rng(3)
    t = 6
    feats = rng.standard_normal((1, 1024, t)).astype(np.float32)

    with torch.no_grad():
        want = rdvae(torch.tensor(feats), mode="decode").numpy()

    params = {"params": dvae_params_from_reference(
        rdvae.state_dict(), prefix="")}
    ours = DVAE()

    def decode_feats(m, f):
        b, tt, _ = f.shape
        f = f.reshape(b, tt, 2, 512).reshape(b, 2 * tt, 512)
        return m.out_conv(m.decoder(f)) * m.coef

    got = ours.apply(params, jnp.asarray(feats.transpose(0, 2, 1)),
                     method=decode_feats)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), want, atol=2e-4)
