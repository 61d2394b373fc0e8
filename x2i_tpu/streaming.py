"""Streaming omni sessions: chunked prefill + incremental generation.

Mirrors MiniCPMO.streaming_prefill / streaming_generate
(/root/reference/minicpm/modeling_minicpmo.py:1051-1231): a session
accumulates chat turns as KV-cache chunks (video frames / audio chunks /
text arrive incrementally), then decodes the assistant reply token-by-token
from the cache; with a TTS head attached, reply text drives
ConditionalChatTTS audio-code generation, DVAE decode, and vocoding (the
omni speech path, :1232-1419).

The reference mutates module-level state (self.llm_past_key_values,
self.is_first, self.new_user_msg, self.llm_generated); here the session is
an explicit object over pure jitted functions — the LLM KV cache is a
fixed-size buffer and chunks prefill at a tracked offset
(Qwen2LM.prefill_chunk). Each new chunk LENGTH compiles once (chunks write
their true extent into the cache; padding them would poison later slots).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class StreamingState:
    """Reference session flags (modeling_minicpmo.py:1066-1112)."""
    session_id: Optional[str] = None
    cache: Any = None
    length: int = 0                  # filled cache slots
    last_logits: Any = None          # (1, V) at the last prefilled position
    new_user_msg: bool = True
    llm_generated: bool = False
    llm_generate_completed: bool = False


class StreamingSession:
    """Chunked-prefill chat session over a cached LM.

    llm: dict of param-bound callables:
      embed(ids (1, S)) -> (1, S, H)
      prefill_chunk(embeds, cache, index, mask) -> (hidden, logits, cache)
      decode_step(embeds, cache, index, kv_mask, positions)
        -> (hidden, logits, cache)
      init_cache(batch, max_len) -> cache
    tokenize: str -> list[int]; detokenize: list[int] -> str.
    """

    def __init__(self, llm: Dict[str, Callable], tokenize: Callable,
                 detokenize: Callable, max_len: int = 2048,
                 terminators: Optional[List[int]] = None):
        self.llm = llm
        self.tokenize = tokenize
        self.detokenize = detokenize
        self.max_len = max_len
        self.terminators = terminators or []
        self.state = StreamingState()

    # -- reference role bookkeeping (:1096-1112) -------------------------
    def _wrap_content(self, role: str, content: str, is_first: bool) -> str:
        s = self.state
        if is_first:
            return content                   # caller applies chat template
        if s.new_user_msg and role == "user":
            s.new_user_msg = False
            if s.llm_generated:
                if s.llm_generate_completed:
                    return "<|im_end|>\n<|im_start|>user\n" + content
                # generation was interrupted mid-stream: close the tts turn
                return ("<|tts_eos|><|im_end|>\n<|im_start|>user\n"
                        + content)
            return "<|im_start|>user\n" + content
        return content

    def prefill(self, session_id: str, role: str, content: str,
                embeds: Optional[jnp.ndarray] = None) -> str:
        """Append one message chunk to the session cache.

        content: already chat-templated text for the first chunk of a new
        session (the reference applies default_tts_chat_template there,
        :1114-1121); raw continuation text otherwise. embeds: optional
        precomputed multimodal embeddings (image/audio chunks spliced by
        the omni encoder) used instead of tokenizing `content`.

        Returns the exact text consumed (after role bookkeeping).
        """
        s = self.state
        is_first = s.session_id != session_id
        if is_first:
            self.state = s = StreamingState(session_id=session_id)
            s.cache = self.llm["init_cache"](1, self.max_len)
        if role in ("system", "assistant"):
            s.new_user_msg = True

        text = self._wrap_content(role, content, is_first)
        if embeds is None:
            ids = self.tokenize(text)
            if not ids:
                return text
            embeds = self.llm["embed"](jnp.asarray([ids], jnp.int32))
        n = embeds.shape[1]
        if s.length + n > self.max_len:
            raise ValueError(
                f"session overflow: {s.length}+{n} > {self.max_len}")
        mask = jnp.ones((1, n), jnp.bool_)
        _, logits, s.cache = self.llm["prefill_chunk"](embeds, s.cache,
                                                       s.length, mask)
        s.last_logits = logits[:, n - 1]
        s.length += n
        return text

    def generate(self, max_new_tokens: int = 128,
                 assistant_prompt: str = "<|im_end|>\n<|im_start|>"
                                         "assistant\n"):
        """Greedy-decode the assistant reply from the session cache
        (streaming_generate, :1161-1231).

        Returns (text, token_ids, hidden (1, n, H) final-layer states of
        the generated tokens — the TTS conditioning input)."""
        s = self.state
        assert s.cache is not None, "prefill first"
        if assistant_prompt:
            self.prefill(s.session_id, "generate", assistant_prompt)
        s.llm_generated = True
        s.llm_generate_completed = False
        s.new_user_msg = True

        ids: List[int] = []
        hiddens = []
        next_id = int(jnp.argmax(s.last_logits[0]))
        for _ in range(max_new_tokens):
            if next_id in self.terminators:
                s.llm_generate_completed = True
                break
            ids.append(next_id)
            idx = s.length                    # append slot for this token
            if idx >= self.max_len:
                break
            emb = self.llm["embed"](jnp.asarray([[next_id]], jnp.int32))
            kv_mask = (jnp.arange(self.max_len)[None, :] <= idx)
            pos = jnp.full((1, 1), idx, jnp.int32)
            hidden, logits, s.cache = self.llm["decode_step"](
                emb, s.cache, idx, kv_mask, pos)
            s.length += 1
            s.last_logits = logits[:, -1]
            hiddens.append(np.asarray(hidden[0, -1, 0]))
            next_id = int(jnp.argmax(s.last_logits[0]))
        text = self.detokenize(ids)
        hid = (np.stack(hiddens, axis=0)[None] if hiddens else None)
        return text, ids, hid


def make_qwen2_session(model, params, tokenize, detokenize,
                       max_len: int = 2048,
                       terminators: Optional[List[int]] = None,
                       jit: bool = True) -> StreamingSession:
    """Bind a Qwen2LM (the MiniCPM-o LLM) into a StreamingSession."""
    import jax

    from x2i_tpu.models.qwen2 import Qwen2LM

    def wrap(method):
        fn = lambda *a: model.apply(params, *a, method=method)
        return jax.jit(fn) if jit else fn

    llm = {
        "embed": wrap(Qwen2LM.embed),
        "prefill_chunk": wrap(Qwen2LM.prefill_chunk),
        "decode_step": wrap(Qwen2LM.decode_step),
        "init_cache": lambda b, n: model.apply(params, b, n,
                                               method=Qwen2LM.init_cache),
    }
    return StreamingSession(llm, tokenize, detokenize, max_len,
                            terminators)


class TTSPipeline:
    """Text+speaker-conditioned speech synthesis: ConditionalChatTTS codes
    -> DVAE mel -> vocoder waveform (the reference's omni speech path,
    modeling_minicpmo.py:1232-1419 with _generate_mel_spec_audio_streaming).

    tts_tokenize: TTS-side text tokenizer (the reference runs a separate
    ChatTTS tokenizer over the LLM reply text, :2652-2656).
    """

    def __init__(self, tts, tts_params, dvae, dvae_params, vocoder,
                 vocoder_params, tts_tokenize: Callable,
                 bos_token_id: int = 21134):
        self.tts = tts
        self.tts_params = tts_params
        self.dvae = dvae
        self.dvae_params = dvae_params
        self.vocoder = vocoder
        self.vocoder_params = vocoder_params
        self.tts_tokenize = tts_tokenize
        self.bos_token_id = bos_token_id

    def speak(self, text: str, spk_hidden, rng, max_audio_tokens: int = 256,
              temperature: float = 1.0, normalize_numbers: bool = True):
        """-> (waveform (1, n_samples), audio codes (1, n, num_vq), n).

        normalize_numbers: spell digits out per-language before tokenizing
        (the reference applies NumberToTextConverter in streaming TTS,
        minicpm/utils.py:44-123)."""
        cfg = self.tts.cfg
        if normalize_numbers:
            from x2i_tpu.data.tts_text import replace_numbers_with_text
            text = replace_numbers_with_text(text)
        reserved = cfg.streaming_text_reserved_len
        ids = self.tts_tokenize(text)[:reserved]
        n_text = len(ids)
        prefix = [self.bos_token_id] + [cfg.spk_emb_token_id] * (
            cfg.num_spk_embs * int(cfg.use_speaker_embedding))
        padded = prefix + ids + [0] * (reserved - n_text)
        input_ids = jnp.asarray([padded], jnp.int32)
        positions = jnp.arange(input_ids.shape[1])[None]

        max_len = cfg.condition_length + max_audio_tokens
        cache = self.tts.init_cache(max_len)
        cache = self.tts.apply(self.tts_params, input_ids, positions,
                               cache, spk_hidden,
                               method=self.tts.prefill_text)
        text_mask = (jnp.arange(reserved) < n_text)
        buf = jnp.zeros((1, max_audio_tokens, cfg.num_vq), jnp.int32)
        codes, cache, n, _ = self.tts.apply(
            self.tts_params, buf, cache,
            jnp.asarray(cfg.condition_length - 1), text_mask, rng,
            max_audio_tokens, temperature=temperature,
            method=self.tts.generate)
        # trim to the generated codes before mel decode — the reference
        # slices off the eos code and the unwritten tail before DVAE
        # (modeling_minicpmo.py: decode uses the accumulated codes only);
        # feeding the zero-initialized tail yields trailing garbage audio.
        n = max(int(n), 1)
        codes = codes[:, :n]
        mel = self.dvae.apply(self.dvae_params, codes,
                              method=self.dvae.decode)
        wav = self.vocoder.apply(self.vocoder_params, mel)
        return wav, codes, n
