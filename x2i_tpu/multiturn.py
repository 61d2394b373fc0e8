"""Multi-turn conversational image generation.

Mirrors /root/reference/infer/inference_multi_turn.py: an interactive
session accumulates Qwen chat history; each turn the LM generates an
answer, the prefill AND answer hidden states are concatenated along the
sequence axis (:132-144), projected, and an image is generated with a fixed
seed (:149-156) so successive turns refine the same latent trajectory.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from x2i_tpu.models.decoding import (concat_answer_hiddens,
                                     greedy_decode_with_hiddens)
from x2i_tpu.models.qwen2 import Qwen2LM


@dataclasses.dataclass
class ChatTurn:
    user: str
    assistant: str


class MultiTurnSession:
    """Chat-conditioned generation session.

    Args:
      lm, lm_params: the (frozen) Qwen2-family LM.
      tokenize: fn(history: List[ChatTurn], user_msg: str) -> (ids, mask)
        building the full chat-template prompt over the history.
      detokenize: fn(token_ids) -> str.
      proj_apply: (params, (B, C, S, H)) -> (pooled, prompt_embeds).
      generate_image: fn(pooled, prompt_embeds, seed) -> images.
      eos_token_id / max_new_tokens: decode settings (reference uses
        max_new_tokens=128 and fixed seed 0).
    """

    def __init__(self, lm: Qwen2LM, lm_params, tokenize: Callable,
                 detokenize: Callable, proj_apply: Callable, proj_params,
                 generate_image: Callable, eos_token_id: int,
                 max_new_tokens: int = 128, seed: int = 0):
        self.lm = lm
        self.lm_params = lm_params
        self.tokenize = tokenize
        self.detokenize = detokenize
        self.proj_apply = proj_apply
        self.proj_params = proj_params
        self.generate_image = generate_image
        self.eos_token_id = eos_token_id
        self.max_new_tokens = max_new_tokens
        self.seed = seed
        self.history: List[ChatTurn] = []

    def turn(self, user_msg: str) -> Tuple[str, Any]:
        """One conversation turn -> (assistant_text, image)."""
        ids, mask = self.tokenize(self.history, user_msg)
        ids = jnp.asarray(ids)
        mask = jnp.asarray(mask, bool)
        emb = self.lm.apply(self.lm_params, ids, method=Qwen2LM.embed)

        prefill, steps, tokens, valid = greedy_decode_with_hiddens(
            self.lm, self.lm_params, emb, mask, self.max_new_tokens,
            self.eos_token_id)

        answer_ids = np.asarray(tokens)[0][np.asarray(valid)[0]]
        answer = self.detokenize(answer_ids)
        self.history.append(ChatTurn(user=user_msg, assistant=answer))

        # cat prefill + answer states along seq (multi_turn.py:132-144)
        all_hidden = concat_answer_hiddens(prefill, steps)
        pooled, prompt_embeds = self.proj_apply(self.proj_params,
                                                all_hidden)
        image = self.generate_image(pooled, prompt_embeds, seed=self.seed)
        return answer, image

    def reset(self) -> None:
        self.history = []
