"""Streaming session: chunked prefill + incremental generate vs one-shot."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import tiny_qwen2_config
from x2i_tpu.models.qwen2 import Qwen2LM
from x2i_tpu.streaming import StreamingSession, make_qwen2_session

pytestmark = pytest.mark.slow


def _toy_tokenizer():
    # byte-level toy tokenizer over a small vocab
    def tokenize(s):
        return [ord(c) % 200 for c in s]

    def detokenize(ids):
        return "".join(chr(97 + (i % 26)) for i in ids)
    return tokenize, detokenize


def _build():
    cfg = tiny_qwen2_config(vocab_size=256)
    model = Qwen2LM(cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 4), jnp.int32))
    return cfg, model, params


def test_session_matches_one_shot_decode(rng):
    """Three prefill chunks + greedy generate == one full-prompt greedy
    decode (same tokens, same text)."""
    cfg, model, params = _build()
    tok, detok = _toy_tokenizer()
    term = [255]

    sess = make_qwen2_session(model, params, tok, detok, max_len=96,
                              terminators=term, jit=False)
    consumed = [sess.prefill("s1", "user", "hello "),
                sess.prefill("s1", "user", "streaming "),
                sess.prefill("s1", "user", "world")]
    text, ids, hidden = sess.generate(max_new_tokens=8,
                                      assistant_prompt="")

    # one-shot reference: greedy decode from exactly the consumed text
    # (role bookkeeping may have inserted im_start markers, :1096-1112)
    prompt_ids = tok("".join(consumed))
    full = jnp.asarray([prompt_ids], jnp.int32)
    all_hidden, logits = model.apply(params, full)
    cache = model.apply(params, 1, 96, method=Qwen2LM.init_cache)
    emb = model.apply(params, full, method=Qwen2LM.embed)
    _, plogits, cache = model.apply(
        params, emb, jnp.ones_like(full, jnp.bool_), cache,
        method=Qwen2LM.prefill_cached)
    want_ids = []
    nxt = int(jnp.argmax(plogits[0, -1]))
    idx = full.shape[1]
    for _ in range(8):
        if nxt in term:
            break
        want_ids.append(nxt)
        e = model.apply(params, jnp.asarray([[nxt]], jnp.int32),
                        method=Qwen2LM.embed)
        kv = (jnp.arange(96)[None, :] <= idx)
        pos = jnp.full((1, 1), idx, jnp.int32)
        _, lg, cache = model.apply(params, e, cache, idx, kv, pos,
                                   method=Qwen2LM.decode_step)
        nxt = int(jnp.argmax(lg[0, -1]))
        idx += 1
    assert ids == want_ids
    assert text == detok(want_ids)
    if ids:
        assert hidden.shape == (1, len(ids), cfg.hidden_size)


def test_session_role_bookkeeping():
    """Reference role-transition strings (:1096-1112): im_start on a new
    user turn, tts_eos when generation was interrupted."""
    cfg, model, params = _build()
    tok, detok = _toy_tokenizer()
    sess = make_qwen2_session(model, params, tok, detok, max_len=256,
                              jit=False)
    t0 = sess.prefill("s2", "user", "first chunk")      # new session
    assert t0 == "first chunk"
    sess.state.new_user_msg = True
    sess.state.llm_generated = True
    sess.state.llm_generate_completed = True
    t1 = sess.prefill("s2", "user", "next turn")
    assert t1.startswith("<|im_end|>\n<|im_start|>user\n")
    sess.state.new_user_msg = True
    sess.state.llm_generate_completed = False
    t2 = sess.prefill("s2", "user", "barge-in")
    assert t2.startswith("<|tts_eos|>")

    # a new session id resets everything
    t3 = sess.prefill("s3", "user", "fresh")
    assert t3 == "fresh" and sess.state.session_id == "s3"


def test_tts_pipeline_speaks(rng):
    """Full speech chain on tiny configs: text -> codes -> mel -> wav."""
    from x2i_tpu.models.chattts import (ChatTTSConfig, ConditionalChatTTS,
                                        DVAE, VocosVocoder)
    from x2i_tpu.streaming import TTSPipeline

    cfg = ChatTTSConfig(
        llm_dim=32, hidden_size=64, intermediate_size=128,
        num_attention_heads=4, num_hidden_layers=2, num_audio_tokens=50,
        num_text_tokens=120, num_vq=4, spk_emb_token_id=100,
        audio_bos_token_id=101, streaming_text_reserved_len=16,
        streaming_text_chunk_size=4, streaming_audio_chunk_size=6,
        top_k=5, top_p=0.9)
    tts = ConditionalChatTTS(cfg)
    ids = jnp.full((1, 2 + cfg.streaming_text_reserved_len), 3)
    positions = jnp.arange(ids.shape[1])[None]
    spk = jnp.asarray(rng.standard_normal((1, 1, cfg.llm_dim)), jnp.float32)
    cache0 = tts.init_cache(cfg.condition_length + 4)
    tmask = jnp.ones((cfg.streaming_text_reserved_len,), bool)
    tts_params = tts.init({"params": jax.random.key(0)}, ids, positions,
                          cache0, spk,
                          jnp.zeros((1, 1, cfg.num_vq), jnp.int32), tmask,
                          method=ConditionalChatTTS.init_all)

    dvae = DVAE()
    dvae_params = dvae.init(jax.random.key(1), jnp.zeros((1, 8, 100)),
                            method=DVAE.encode_decode)
    voc = VocosVocoder(input_channels=100, dim=32, intermediate_dim=64,
                       num_layers=1, n_fft=64, hop_length=16)
    voc_params = voc.init(jax.random.key(2), jnp.zeros((1, 8, 100)))

    pipe = TTSPipeline(tts, tts_params, dvae, dvae_params, voc, voc_params,
                       tts_tokenize=lambda s: [ord(c) % 90 for c in s],
                       bos_token_id=99)
    wav, codes, n = pipe.speak("hi there", spk, jax.random.key(3),
                               max_audio_tokens=8)
    assert n >= 1
    assert codes.shape[2] == cfg.num_vq
    assert wav.shape[0] == 1 and np.isfinite(np.asarray(wav)).all()
