"""Long-audio (>30s) multi-chunk goldens vs the reference's own processor
and model code.

X2I's inference path calls the MiniCPM-o processor with chunk_input=True
(inference_minicpm.py:166), so EVERY audio expands into per-1s-chunk
<audio>...</audio> placeholder spans (processing_minicpmo.py:105-128) and
audio longer than 30s is split into consecutive 30s mel chunks
(:183-191) whose embeddings concatenate, skipping per-chunk pad rows,
into the spans in order (modeling_minicpmo.py:585-599). These tests pin:

  * the placeholder span math against the reference
    get_audio_placeholder itself over a length sweep (incl. 75s),
  * our chunked mel features against the reference audio_feature_extract
    driven by a real HF WhisperFeatureExtractor (bit-close mels + lens),
  * the composite splice for a 2-chunk audio with distinct lengths and
    1s-chunked whisper attention, vs the reference model end to end.

Fast tier: tiny configs, f32, CPU.
"""

import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ref_loader
from x2i_tpu.data.minicpm_vision import (audio_placeholder_len,
                                         audio_placeholder_spans,
                                         bounds_to_map, chunk_audio_mels)

LENGTHS = [1600, 15999, 16000, 16001, 480000, 480001,
           37 * 16000 + 123, 75 * 16000]


def _fake_proc_self():
    proc_mod = ref_loader.load_minicpmo_processor()
    cls = proc_mod.MiniCPMOProcessor
    self = types.SimpleNamespace(
        feature_extractor=types.SimpleNamespace(hop_length=160),
        tokenizer=types.SimpleNamespace(audio_start="<audio>",
                                        audio_end="</audio>"))
    self.get_audio_placeholder = cls.get_audio_placeholder.__get__(self)
    self.audio_feature_extract = cls.audio_feature_extract.__get__(self)
    return self


def test_placeholder_spans_golden():
    """Our span math == the reference get_audio_placeholder string, for
    chunk_input=True (the X2I path) and the single-span variant."""
    self = _fake_proc_self()
    for n in LENGTHS:
        ref = self.get_audio_placeholder(n, chunk_input=True,
                                         chunk_length=1)
        spans = audio_placeholder_spans(n, chunk_length=1.0)
        mine = "".join("<audio>" + "<unk>" * k + "</audio>"
                       for k in spans)
        assert mine == ref, f"samples={n}"
        ref1 = self.get_audio_placeholder(n, chunk_input=False,
                                          chunk_length=1)
        total = audio_placeholder_len(n)
        assert ("<audio>" + "<unk>" * total + "</audio>") == ref1, n


def test_75s_audio_three_chunks():
    """VERDICT r3 item 7 'done' criterion: a 75s clip produces 3 mel
    chunks (30+30+15s) whose valid pooled rows sum to the placeholder
    total, split into 75 spans of 25 tokens."""
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(75 * 16000).astype(np.float32) * 0.1
    mels, lens = chunk_audio_mels(audio)
    assert mels.shape == (3, 80, 3000)
    assert lens.tolist() == [3000, 3000, 1500]
    conv = (lens - 1) // 2 + 1
    pooled = (conv - 2) // 2 + 1
    spans = audio_placeholder_spans(len(audio))
    assert spans == [25] * 75
    assert int(pooled.sum()) == sum(spans) == 1875
    # map construction: rows skip the padded tail of the short chunk
    pooled_pad = ((mels.shape[2] - 1) // 2 + 1) // 2
    rows = np.concatenate([k * pooled_pad + np.arange(v)
                           for k, v in enumerate(pooled)])
    starts = np.cumsum([0] + [s + 2 for s in spans[:-1]])  # +2 markers
    bounds = [(int(s) + 1, int(s) + 1 + n) for s, n in zip(starts, spans)]
    amap = bounds_to_map([bounds], int(bounds[-1][1]) + 1, rows=rows)
    got = amap[0][amap[0] >= 0]
    np.testing.assert_array_equal(got, rows)


def test_mel_chunking_golden_vs_reference_extract():
    """chunk_audio_mels == the reference audio_feature_extract (real HF
    WhisperFeatureExtractor): same chunk split, same truncate-to-lens,
    same zero pad_sequence, bit-close mel values."""
    from transformers import WhisperFeatureExtractor
    self = _fake_proc_self()
    self.feature_extractor = WhisperFeatureExtractor(
        feature_size=80, sampling_rate=16000, hop_length=160,
        chunk_length=30, n_fft=400)
    rng = np.random.default_rng(1)
    # 65.4s: chunks of 30 / 30 / 5.4s exercise truncation + padding
    audio = (rng.standard_normal(int(65.4 * 16000))
             .astype(np.float32) * 0.1)
    feats, lens_list, phs = self.audio_feature_extract(
        [[audio]], None, True, 16000)
    ref_mels = feats.numpy()
    ref_lens = lens_list[0].numpy()

    mels, lens = chunk_audio_mels(audio)
    assert mels.shape == ref_mels.shape
    np.testing.assert_array_equal(lens, ref_lens)
    np.testing.assert_allclose(mels, ref_mels, rtol=1e-4, atol=2e-4)
    # and the placeholder list agrees with the host-side span math
    spans = audio_placeholder_spans(len(audio))
    assert phs[0][0] == "".join(
        "<audio>" + "<unk>" * k + "</audio>" for k in spans)


def test_composite_multichunk_audio_golden(rng):
    """Two mel chunks with distinct valid lengths + 1s-chunked whisper
    attention through the reference MiniCPMO (config.chunk_input=True
    splice: concat chunks, fill bounds sequentially) vs MiniCPMOEncoder
    with frame_mask + chunk bias + rows-aware audio_map."""
    from test_minicpm_reference_golden import _tiny_ref_minicpmo
    from x2i_tpu.convert.load import minicpmo_params_from_hf
    from x2i_tpu.core.config import Qwen2Config
    from x2i_tpu.models.minicpmo import MiniCPMOConfig, MiniCPMOEncoder
    from x2i_tpu.models.siglip import SiglipVisionConfig
    from x2i_tpu.models.whisper_enc import WhisperConfig, chunk_bias

    ref, rcfg = _tiny_ref_minicpmo()
    B, S = 1, 24
    # chunk lens 16 and 6 mel frames -> conv 8 / 3 valid -> pooled 4 / 1;
    # lens=6 < 8 conv frames makes the reference's quirky padding mask
    # actually fire (it compares conv indices against MEL lengths,
    # modeling_minicpmo.py:497-505 — under-masking we replicate exactly)
    mel = np.zeros((2, 8, 16), np.float32)
    mel[0] = rng.standard_normal((8, 16)).astype(np.float32)
    mel[1, :, :6] = rng.standard_normal((8, 6)).astype(np.float32)
    lens = np.array([16, 6], np.int32)
    # chunk_length=0.08 -> int(0.08*50)=4-frame attention chunks: real
    # chunking inside the 8-frame conv sequence
    chunk_len = 0.08
    audio_bounds = [torch.tensor([[10, 14], [15, 16]])]
    ids = rng.integers(5, 500, (B, S))
    data = {
        "input_ids": torch.from_numpy(ids),
        "pixel_values": [[]],
        "tgt_sizes": [[]],
        "image_bound": [torch.zeros(0, 2, dtype=torch.long)],
        "audio_features": torch.from_numpy(mel),
        "audio_feature_lens": [torch.from_numpy(lens.astype(np.int64))],
        "audio_bounds": audio_bounds,
    }
    assert rcfg.chunk_input
    with torch.no_grad():
        emb, _ = ref.get_vllm_embedding(data)
        emb = ref.get_omni_embedding(data, input_embeddings=emb,
                                     chunk_length=chunk_len)
        out = ref.llm.model(inputs_embeds=emb,
                            attention_mask=torch.ones((B, S),
                                                      dtype=torch.long),
                            output_hidden_states=True)
        ref_stack = torch.stack(out.hidden_states, dim=1).numpy()

    aud = WhisperConfig(num_mel_bins=8, d_model=16, encoder_layers=2,
                        encoder_attention_heads=4, encoder_ffn_dim=64,
                        max_source_positions=64, dtype=jnp.float32,
                        param_dtype=jnp.float32)
    vis = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=3, num_attention_heads=4,
                             image_size=70, patch_size=7,
                             drop_last_layer=True, dtype=jnp.float32,
                             param_dtype=jnp.float32)
    llm = Qwen2Config(vocab_size=512, hidden_size=128,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=2,
                      head_dim=64, dtype=jnp.float32,
                      param_dtype=jnp.float32,
                      use_pallas_attention=False)
    cfg = MiniCPMOConfig(vision=vis, audio=aud, llm=llm, query_num=4,
                         resampler_heads=1)
    params = {"params": minicpmo_params_from_hf(ref.state_dict(), cfg)}

    conv_lens = (lens - 1) // 2 + 1                    # [8, 3]
    t_conv = (mel.shape[2] - 1) // 2 + 1               # 8
    # reference mask semantics: conv index vs MEL length (see above)
    frame_mask = np.arange(t_conv)[None] < lens[:, None]
    pooled_pad = t_conv // 2                           # 4
    pooled = (conv_lens - 2) // 2 + 1                  # [4, 1]
    rows = np.concatenate([k * pooled_pad + np.arange(v)
                           for k, v in enumerate(pooled)])
    amap = bounds_to_map([[(10, 14), (15, 16)]], S, rows=rows)
    audio = {"mel": jnp.asarray(mel),
             "frame_mask": jnp.asarray(frame_mask),
             "attn_bias": jnp.asarray(
                 chunk_bias(t_conv, int(chunk_len * 50)))}

    enc = MiniCPMOEncoder(cfg)
    stack = enc.apply(params, jnp.asarray(ids),
                      jnp.asarray(np.ones((B, S), bool)), None, audio,
                      None, jnp.asarray(amap))
    np.testing.assert_allclose(np.asarray(stack), ref_stack,
                               rtol=5e-4, atol=5e-5)
