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


def build_random_session(seed: int = 0, max_new_tokens: int = 8,
                         gen_cfg=None) -> MultiTurnSession:
    """Multi-turn session over the tiny random-weight pipeline — the full
    REPL code path (history -> chat prompt -> decode -> cat hiddens ->
    proj -> image) without checkpoints."""
    from x2i_tpu.pipeline import build_random_pipeline

    pipe = build_random_pipeline("tiny", seed=seed, gen_cfg=gen_cfg)
    ctx = pipe._random_ctx
    lm_cfg = ctx["lm_cfg"]
    seq = 64

    def tokenize(history: List[ChatTurn], user_msg: str):
        text = "".join(f"<u>{t.user}<a>{t.assistant}" for t in history)
        text += f"<u>{user_msg}<a>"
        ids = np.zeros((1, seq), np.int32)
        toks = [hash(c) % lm_cfg.vocab_size for c in text][-seq:]
        ids[0, :len(toks)] = toks
        mask = np.zeros((1, seq), bool)
        mask[0, :max(len(toks), 1)] = True
        return ids, mask

    def detokenize(token_ids) -> str:
        return " ".join(f"t{int(t)}" for t in token_ids)

    return MultiTurnSession(
        lm=ctx["lm"], lm_params=ctx["lm_params"], tokenize=tokenize,
        detokenize=detokenize, proj_apply=pipe.proj.apply,
        proj_params=pipe.proj_params, generate_image=pipe.generate,
        eos_token_id=1, max_new_tokens=max_new_tokens, seed=seed)


def build_session_from_checkpoints(model: str, flux_path: str,
                                   mllm_path: str, proj_path: str,
                                   num_steps: int = 4, height: int = 1024,
                                   width: int = 1024, seed: int = 0,
                                   max_new_tokens: int = 128,
                                   quantized="w8") -> MultiTurnSession:
    """Checkpoint-backed multi-turn session (Qwen2-family LMs). Text-only
    chat turns with the model's own chat template; images each turn are
    the reference script's fixed-path variant and can be added via the
    pipeline task surface instead."""
    from transformers import AutoTokenizer

    from x2i_tpu.convert.load import build_pipeline_from_checkpoints

    pipe = build_pipeline_from_checkpoints(
        model=model, flux_path=flux_path, mllm_path=mllm_path,
        proj_path=proj_path, num_steps=num_steps, height=height,
        width=width, seed=seed, quantized=quantized)
    tok = AutoTokenizer.from_pretrained(mllm_path, trust_remote_code=True)

    def tokenize(history: List[ChatTurn], user_msg: str):
        msgs = []
        for t in history:
            msgs.append({"role": "user", "content": t.user})
            msgs.append({"role": "assistant", "content": t.assistant})
        msgs.append({"role": "user", "content": user_msg})
        text = tok.apply_chat_template(msgs, tokenize=False,
                                       add_generation_prompt=True)
        enc = tok(text)
        ids = np.asarray([enc["input_ids"]], np.int32)
        mask = np.asarray([enc["attention_mask"]], bool)
        return ids, mask

    def detokenize(token_ids) -> str:
        return tok.decode(token_ids, skip_special_tokens=True)

    ctx = getattr(pipe.encoder_fn, "ctx", None)
    if ctx is None or "lm" not in ctx:
        raise ValueError(f"model family of {model!r} does not export an "
                         "LM handle for multi-turn chat (Qwen2-family "
                         "encoders do)")
    return MultiTurnSession(
        lm=ctx["lm"], lm_params=ctx["lm_params"], tokenize=tokenize,
        detokenize=detokenize, proj_apply=pipe.proj.apply,
        proj_params=pipe.proj_params, generate_image=pipe.generate,
        eos_token_id=ctx["eos_token_id"],
        max_new_tokens=max_new_tokens, seed=seed)
