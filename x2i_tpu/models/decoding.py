"""Autoregressive decode with per-step hidden-state export.

Two reference behaviors need this (SURVEY.md §7.1.6):
  * `use_answer` / reasoning2image: generate up to 128 tokens and condition
    the proj on cat(prefill_hiddens, per-step hiddens) along the sequence
    axis (/root/reference/infer/inference_qwenvl.py:121-132).
  * multi-turn chat: accumulate history, concatenate prefill + answer
    hidden states each turn (/root/reference/infer/inference_multi_turn.py:
    132-144).

TPU design: cached prefill fills the KV cache, then a `lax.scan` over decode
steps (static max_new_tokens; finished sequences keep emitting pad/EOS but
cost nothing extra) collects per-step hidden-state stacks as scan ys — the
same pure-functional trick as the DiT KD aux.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from x2i_tpu.models.qwen2 import Qwen2LM


def greedy_decode_with_hiddens(
        lm: Qwen2LM, params, inputs_embeds: jnp.ndarray,
        attention_mask: jnp.ndarray, max_new_tokens: int,
        eos_token_id: int,
        prefill_rope=None,
        step_pos0: Optional[jnp.ndarray] = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy decode exporting hidden states.

    Args:
      inputs_embeds: (B, S0, H) prefill embeddings (vision/audio already
        spliced).
      attention_mask: (B, S0) bool.
      max_new_tokens: static decode budget.
      prefill_rope: optional precomputed (cos, sin) for the prefill (e.g.
        Qwen2.5-VL M-RoPE built from 3D position ids).
      step_pos0: optional (B,) first decode position (for M-RoPE prompts:
        max 3D position + 1 — text continuation uses identical positions
        across the three streams, which reduces to 1D rope).

    Returns:
      prefill_hidden: (B, L+1, S0, H)
      step_hidden: (B, L+1, max_new_tokens, H) per-step stacks
      tokens: (B, max_new_tokens) generated ids (pad=eos after finish)
      valid: (B, max_new_tokens) bool — True until (incl.) first EOS.
    """
    b, s0, _ = inputs_embeds.shape
    max_len = s0 + max_new_tokens
    cache = lm.apply(params, b, max_len, method=Qwen2LM.init_cache)

    prefill_hidden, logits, cache = lm.apply(
        params, inputs_embeds, attention_mask, cache, prefill_rope,
        method=Qwen2LM.prefill_cached)

    # next-token from the last *valid* position (right padding aware)
    last_pos = jnp.sum(attention_mask.astype(jnp.int32), axis=-1) - 1
    next_logits = jnp.take_along_axis(
        logits, last_pos[:, None, None], axis=1)[:, 0]
    first_token = jnp.argmax(next_logits, axis=-1)

    def step(carry, i):
        cache, token, finished, pos = carry
        emb = lm.apply(params, token[:, None], method=Qwen2LM.embed)
        idx = s0 + i
        kv_mask = (jnp.arange(max_len)[None, :] < idx + 1) & \
            jnp.concatenate([attention_mask,
                             jnp.ones((b, max_new_tokens), bool)],
                            axis=-1)[:, :max_len]
        hiddens, logits, cache = lm.apply(
            params, emb, cache, idx, kv_mask, pos[:, None],
            method=Qwen2LM.decode_step)
        new_token = jnp.argmax(logits[:, 0], axis=-1)
        valid = jnp.logical_not(finished)
        finished = finished | (token == eos_token_id)
        return ((cache, new_token, finished, pos + 1),
                (hiddens[:, :, 0], token, valid))

    pos0 = (step_pos0 if step_pos0 is not None
            else jnp.sum(attention_mask.astype(jnp.int32), axis=-1))
    init = (cache, first_token, jnp.zeros((b,), bool), pos0)
    _, (step_hidden, tokens, valid) = jax.lax.scan(
        step, init, jnp.arange(max_new_tokens))

    # scan ys are (T, B, ...) -> (B, L+1, T, H) / (B, T)
    step_hidden = jnp.transpose(step_hidden, (1, 2, 0, 3))
    tokens = jnp.swapaxes(tokens, 0, 1)
    valid = jnp.swapaxes(valid, 0, 1)
    return prefill_hidden, step_hidden, tokens, valid


def concat_answer_hiddens(prefill_hidden: jnp.ndarray,
                          step_hidden: jnp.ndarray) -> jnp.ndarray:
    """cat along seq dim — the use_answer / multi-turn conditioning
    (inference_qwenvl.py:124-131; inference_multi_turn.py:132-144)."""
    return jnp.concatenate([prefill_hidden, step_hidden], axis=2)
