"""Qwen2-family causal LM with per-layer hidden-state export.

This one LM backs three reference stacks: the Qwen2 LM inside InternVL2.5
(/root/reference/model_internvl/modeling_qwen2.py:1080), inside MiniCPM-o
(Qwen2-7B, /root/reference/minicpm/modeling_minicpmo.py:98), and the LM half
of Qwen2.5-VL. X2I never decodes text on the image path — it runs a single
prefill forward and exports *all* per-layer hidden states (embeddings +
every block output = num_layers+1 channels, SURVEY.md §2.10), which feed the
proj. Here the blocks run under nn.scan and the hidden-state stack is the
scan ys — no output_hidden_states plumbing, it's simply the natural output.

Decode (for `use_answer` reasoning2image and multi-turn chat,
/root/reference/infer/inference_qwenvl.py:121-132) uses a KV cache threaded
through the same scanned blocks.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2i_tpu.core.config import Qwen2Config
from x2i_tpu.ops.attention import attention
from x2i_tpu.ops.norms import rms_norm
from x2i_tpu.ops.rope import apply_rope_half, rope_freqs_half


class RMSNorm(nn.Module):
    eps: float = 1e-6
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                       self.param_dtype)
        return rms_norm(x, w, self.eps)


class Qwen2Block(nn.Module):
    """One decoder layer; carry=(hidden, kv_cache_slot) under nn.scan."""
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, hidden, cos, sin, kv_mask, cache, cache_index,
                 causal=True, causal_offset=0):
        """
        Args:
          hidden: (B, S, H)
          cos/sin: (B, S, head_dim) rotary tables for these positions.
          kv_mask: (B, S_kv) bool over the kv sequence (cache or self).
          cache: optional (k_cache, v_cache) each (B, S_max, Hk, D) to
            read+update at cache_index; None for cache-less prefill.
          cache_index: scalar int32 write offset when cache is not None.
          causal: causal masking; True for prefill (queries at absolute
            positions 0..S-1), False for single-token decode.
          causal_offset: absolute position of query row 0 (chunked prefill
            at a nonzero cache offset).

        Returns: (new_hidden, updated_cache)
        """
        cfg = self.cfg
        b, s, _ = hidden.shape
        h, hk, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                    cfg.head_dim)
        from x2i_tpu.ops.quant import make_dense
        _dense = make_dense(cfg.quantized, cfg.dtype, cfg.param_dtype)
        dense = lambda feats, name, bias: _dense(feats, name, use_bias=bias)

        x = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="input_norm")(
            hidden)
        ab = cfg.attention_bias
        q = dense(h * d, "q_proj", ab)(x).reshape(b, s, h, d)
        k = dense(hk * d, "k_proj", ab)(x).reshape(b, s, hk, d)
        v = dense(hk * d, "v_proj", ab)(x).reshape(b, s, hk, d)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)

        if cache is None:
            impl = "auto" if cfg.use_pallas_attention else "xla"
            attn = attention(q, k, v, kv_mask=kv_mask, causal=causal,
                             implementation=impl)
            new_cache = None
        else:
            k_cache, v_cache = cache
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k.astype(k_cache.dtype), cache_index, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v.astype(v_cache.dtype), cache_index, axis=1)
            attn = attention(q, k_cache, v_cache, kv_mask=kv_mask,
                             causal=causal, implementation="xla",
                             causal_offset=causal_offset)
            new_cache = (k_cache, v_cache)

        attn = dense(cfg.hidden_size, "o_proj", False)(
            attn.reshape(b, s, h * d))
        hidden = hidden + attn

        x = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="post_attn_norm")(
            hidden)
        gate = dense(cfg.intermediate_size, "gate_proj", False)(x)
        up = dense(cfg.intermediate_size, "up_proj", False)(x)
        down = dense(cfg.hidden_size, "down_proj", False)(
            nn.silu(gate) * up)
        hidden = hidden + down
        return hidden, new_cache


class ScannedQwen2Block(nn.Module):
    """nn.scan wrapper emitting per-layer hidden states as ys.

    With (mix_w, mix_fn, mix_acc) the per-layer states are NOT emitted:
    instead `mix_fn(state, mix_w[l])` is accumulated into a running
    (B, S, H) f32 sum inside the scan carry — the proj channel mix
    computed without ever materializing the (B, L, S, H) stack
    (models/proj.py::streaming_mix_spec)."""
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, hidden, cos, sin, kv_mask, cache, cache_index,
                 causal=True, causal_offset=0,
                 mix_w=None, mix_fn=None, mix_acc=None):
        if mix_w is None:
            def body(block, carry, layer_cache):
                hidden = carry
                new_hidden, new_cache = block(hidden, cos, sin, kv_mask,
                                              layer_cache, cache_index,
                                              causal, causal_offset)
                return new_hidden, (new_hidden, new_cache)

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(0,),
                out_axes=0,
                length=self.cfg.num_hidden_layers,
            )
            hidden, (layer_states, new_cache) = scan(
                Qwen2Block(self.cfg, name="block"), hidden, cache)
            return hidden, layer_states, new_cache

        def body(block, carry, layer_cache, w):
            hidden, acc = carry
            new_hidden, new_cache = block(hidden, cos, sin, kv_mask,
                                          layer_cache, cache_index,
                                          causal, causal_offset)
            acc = acc + mix_fn(new_hidden, w)
            return (new_hidden, acc), new_cache

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, 0),
            out_axes=0,
            length=self.cfg.num_hidden_layers,
        )
        (hidden, acc), new_cache = scan(
            Qwen2Block(self.cfg, name="block"), (hidden, mix_acc),
            cache, mix_w)
        return hidden, acc, new_cache


class Qwen2LM(nn.Module):
    """Embedding + scanned blocks + final norm (+ logits head for decode)."""
    cfg: Qwen2Config

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="embed_tokens")
        self.blocks = ScannedQwen2Block(cfg, name="layers")
        self.final_norm = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype,
                                  name="final_norm")
        if not cfg.tie_word_embeddings:
            from x2i_tpu.ops.quant import make_dense
            self.lm_head = make_dense(cfg.quantized, cfg.dtype,
                                      cfg.param_dtype)(
                cfg.vocab_size, "lm_head", use_bias=False)

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def logits(self, hidden):
        return self.logits_from_normed(self.final_norm(hidden))

    def logits_from_normed(self, normed):
        if self.cfg.tie_word_embeddings:
            return self.embed_tokens.attend(normed)
        return self.lm_head(normed)

    def __call__(self, input_ids: Optional[jnp.ndarray] = None,
                 attention_mask: Optional[jnp.ndarray] = None,
                 inputs_embeds: Optional[jnp.ndarray] = None,
                 position_ids: Optional[jnp.ndarray] = None,
                 rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        """Prefill forward exporting all hidden states.

        Returns:
          all_hidden: (B, num_layers+1, S, H) — embeddings first, matching
            torch.stack(outputs.hidden_states[0], dim=1)
            (/root/reference/infer/inference_minicpm.py:116-118).
          last_hidden: (B, S, H) final-norm'd output (for logits).
        """
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        b, s, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.bool_)
        attention_mask = attention_mask.astype(jnp.bool_)
        if rope is not None:
            # precomputed (cos, sin), e.g. M-RoPE (models/qwen2_5_vl.py)
            cos, sin = rope
        else:
            if position_ids is None:
                # left-pad-robust positions (HF generate convention)
                position_ids = jnp.clip(
                    jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1,
                    0, None)
            cos, sin = rope_freqs_half(position_ids, cfg.head_dim,
                                       cfg.rope_theta)

        hidden = inputs_embeds
        final, layer_states, _ = self.blocks(hidden, cos, sin,
                                             attention_mask, None, None)
        normed = self.final_norm(final)
        # (L, B, S, H) -> (B, L, S, H); prepend embeddings channel. HF's
        # hidden_states tuple final-norms its LAST entry — match that, the
        # proj consumes this channel.
        layer_states = jnp.swapaxes(layer_states, 0, 1)
        all_hidden = jnp.concatenate(
            [inputs_embeds[:, None], layer_states[:, :-1], normed[:, None]],
            axis=1)
        return all_hidden, normed

    def encode_premixed(self, input_ids, mix_weights, mix_fn,
                        attention_mask: Optional[jnp.ndarray] = None,
                        inputs_embeds: Optional[jnp.ndarray] = None,
                        position_ids: Optional[jnp.ndarray] = None,
                        rope: Optional[Tuple[jnp.ndarray,
                                             jnp.ndarray]] = None):
        """Prefill with the proj channel mix fused into the layer scan.

        Computes exactly Proj.mix(all_hidden) (+ conv bias) without ever
        materializing the (B, L+1, S, H) stack — at a 32k-token prompt on
        the 7B shape that stack is 6.8 GiB bf16; here peak extra memory is
        one (B, S, H) f32 accumulator. mix_weights/mix_fn come from
        models/proj.py::streaming_mix_spec; feed the result to Proj.mlp.

        Returns (mixed (B, S, H) f32, last_hidden (B, S, H) final-norm'd).
        """
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        b, s, _ = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.bool_)
        attention_mask = attention_mask.astype(jnp.bool_)
        if rope is not None:
            cos, sin = rope
        else:
            if position_ids is None:
                position_ids = jnp.clip(
                    jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1,
                    0, None)
            cos, sin = rope_freqs_half(position_ids, cfg.head_dim,
                                       cfg.rope_theta)

        acc0 = mix_fn(inputs_embeds, mix_weights["embed"])
        final, acc, _ = self.blocks(inputs_embeds, cos, sin, attention_mask,
                                    None, None, mix_w=mix_weights["layers"],
                                    mix_fn=mix_fn, mix_acc=acc0)
        normed = self.final_norm(final)
        acc = acc + mix_fn(normed, mix_weights["final"])
        if mix_weights.get("bias") is not None:
            acc = acc + mix_weights["bias"]
        return acc, normed

    def decode_step(self, token_embeds, cache, cache_index, kv_mask,
                    position_ids):
        """One decode step. token_embeds (B, 1, H); cache pytree with
        leading layer axis; kv_mask (B, S_max) valid-key mask including the
        token just written."""
        cfg = self.cfg
        cos, sin = rope_freqs_half(position_ids, cfg.head_dim, cfg.rope_theta)
        final, layer_states, new_cache = self.blocks(
            token_embeds, cos, sin, kv_mask, cache, cache_index, causal=False)
        normed = self.final_norm(final)
        layer_states = jnp.swapaxes(layer_states, 0, 1)
        all_hidden = jnp.concatenate(
            [token_embeds[:, None], layer_states[:, :-1], normed[:, None]],
            axis=1)
        return all_hidden, self.logits_from_normed(normed), new_cache

    def init_cache(self, batch: int, max_len: int):
        cfg = self.cfg
        shape = (cfg.num_hidden_layers, batch, max_len,
                 cfg.num_key_value_heads, cfg.head_dim)
        return (jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))

    def prefill_chunk(self, inputs_embeds, cache, cache_index,
                      chunk_mask):
        """Prefill a chunk at an arbitrary cache offset (streaming
        sessions, reference streaming_prefill
        modeling_minicpmo.py:1051-1160).

        inputs_embeds: (B, S) chunk; cache_index: scalar write offset;
        chunk_mask: (B, S) valid positions within the chunk (right-padded).
        Queries use absolute positions cache_index + i and may attend all
        previously cached tokens. Returns (all_hidden, logits, cache)."""
        cfg = self.cfg
        b, s, _ = inputs_embeds.shape
        chunk_mask = chunk_mask.astype(jnp.bool_)
        position_ids = (cache_index
                        + jnp.clip(jnp.cumsum(
                            chunk_mask.astype(jnp.int32), axis=-1) - 1,
                            0, None))
        cos, sin = rope_freqs_half(position_ids, cfg.head_dim,
                                   cfg.rope_theta)
        max_len = cache[0].shape[2]
        pos = jnp.arange(max_len)[None, :]
        rel = pos - cache_index
        in_chunk = (rel >= 0) & (rel < s)
        chunk_at_pos = jnp.take(chunk_mask, jnp.clip(rel[0], 0, s - 1),
                                axis=1)
        kv_mask = (pos < cache_index) | (in_chunk & chunk_at_pos)
        final, layer_states, new_cache = self.blocks(
            inputs_embeds, cos, sin, kv_mask, cache, cache_index,
            causal=True, causal_offset=cache_index)
        normed = self.final_norm(final)
        layer_states = jnp.swapaxes(layer_states, 0, 1)
        all_hidden = jnp.concatenate(
            [inputs_embeds[:, None], layer_states[:, :-1], normed[:, None]],
            axis=1)
        return all_hidden, self.logits_from_normed(normed), new_cache

    def prefill_cached(self, inputs_embeds, attention_mask, cache,
                       rope=None):
        """Prefill that also fills the KV cache, for decode continuation.

        Assumes the prompt occupies cache slots [0, S). rope: optional
        precomputed (cos, sin) (e.g. M-RoPE for multimodal prompts).
        Returns (all_hidden (B, L+1, S, H), logits (B, S, V), cache).
        """
        cfg = self.cfg
        b, s, _ = inputs_embeds.shape
        attention_mask = attention_mask.astype(jnp.bool_)
        if rope is not None:
            cos, sin = rope
        else:
            position_ids = jnp.clip(
                jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1,
                0, None)
            cos, sin = rope_freqs_half(position_ids, cfg.head_dim,
                                       cfg.rope_theta)
        max_len = cache[0].shape[2]
        kv_mask = jnp.concatenate(
            [attention_mask, jnp.zeros((b, max_len - s), jnp.bool_)], axis=-1)
        final, layer_states, new_cache = self.blocks(
            inputs_embeds, cos, sin, kv_mask, cache, 0, causal=True)
        normed = self.final_norm(final)
        layer_states = jnp.swapaxes(layer_states, 0, 1)
        all_hidden = jnp.concatenate(
            [inputs_embeds[:, None], layer_states[:, :-1], normed[:, None]],
            axis=1)
        return all_hidden, self.logits_from_normed(normed), new_cache
