"""MiniCPM-o TTS stack: ConditionalChatTTS + DVAE (FSQ codec) + vocoder.

Reference: /root/reference/minicpm/modeling_minicpmo.py — ConvNeXtBlock/GFSQ/
DVAEDecoder/DVAE (:2208-2427), ConditionalChatTTS (:2590-3185), streaming
chunk masks (:2464-2530), MultiModalProjector (:2577-2587), vocos vocoder
init (:140-189). The reference borrows DVAE/GPT sampling from ChatTTS and
FSQ from vector_quantize_pytorch; here the same architectures are built as
flax modules with jit-able decode loops (lax.fori_loop, fixed-size KV cache)
instead of python token loops over dynamic tensors.

Sequence format (ConditionalChatTTS docstring): [Stts bos] [spk emb x N]
[text tokens, fixed reserved length] [Ptts audio-bos] [audio tokens ...].
Audio token embeddings sum num_vq codebook embeddings; logits come from
num_vq weight-normed heads. Streaming: audio chunk k may only attend the
first k*text_chunk prefilled text tokens (make_generation_kv_mask).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2i_tpu.core.config import Qwen2Config
from x2i_tpu.models.qwen2 import RMSNorm, ScannedQwen2Block
from x2i_tpu.ops.rope import rope_freqs_half


@dataclasses.dataclass(frozen=True)
class ChatTTSConfig:
    """configuration_minicpm.py::ConditionalChatTTSConfig (:62-122)."""

    llm_dim: int = 3584              # MiniCPM-o-2.6 LLM hidden (cfg default
                                     # 2560 is overridden by checkpoints)
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_attention_heads: int = 12
    num_hidden_layers: int = 20
    max_position_embeddings: int = 4096
    num_audio_tokens: int = 626
    num_text_tokens: int = 21178
    num_mel_bins: int = 100
    num_vq: int = 4
    use_speaker_embedding: bool = True
    spk_emb_token_id: int = 21143
    num_spk_embs: int = 1
    audio_bos_token_id: int = 21132
    text_eos_token_id: int = 21133
    streaming_text_chunk_size: int = 10
    streaming_text_reserved_len: int = 300
    streaming_audio_chunk_size: int = 50
    use_mlp: bool = True
    top_p: float = 0.7
    top_k: int = 20
    repetition_penalty: float = 1.0
    repetition_window: int = 16
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def backbone(self) -> Qwen2Config:
        """The TTS GPT is a plain Llama (no attention bias, no GQA)."""
        return Qwen2Config(
            vocab_size=self.num_text_tokens,
            hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            num_key_value_heads=self.num_attention_heads,
            head_dim=self.hidden_size // self.num_attention_heads,
            attention_bias=False,
            rope_theta=10000.0,
            dtype=self.dtype, param_dtype=self.param_dtype,
            use_pallas_attention=False)

    @property
    def condition_length(self) -> int:
        """bos + spk embs + reserved text + audio bos."""
        return (1 + self.num_spk_embs * int(self.use_speaker_embedding)
                + self.streaming_text_reserved_len + 1)


class MultiModalProjector(nn.Module):
    """linear -> relu -> linear (modeling_minicpmo.py:2577-2587)."""
    out_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = lambda n, name: nn.Dense(n, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=name)
        return dense(self.out_dim, "linear2")(
            nn.relu(dense(self.out_dim, "linear1")(x)))


# ---------------------------------------------------------------------------
# DVAE: ConvNeXt codec with grouped-residual FSQ (ChatTTS dvae.py lineage)
# ---------------------------------------------------------------------------


class ConvNeXt1DBlock(nn.Module):
    """Depthwise conv1d -> LN -> pointwise MLP -> layer scale + residual
    (modeling_minicpmo.py:2208-2259). x: (B, T, C) channels-last."""
    dim: int
    intermediate_dim: int
    kernel: int
    dilation: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.dim, (self.kernel,),
                    kernel_dilation=(self.dilation,),
                    padding=[(self.dilation * (self.kernel // 2),) * 2],
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="norm")(y)
        y = nn.Dense(self.intermediate_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="pwconv2")(y)
        coef = self.param("coef", nn.initializers.constant(1e-6),
                          (self.dim,), self.param_dtype)
        return residual + y * coef


class DVAEDecoder(nn.Module):
    """conv_in (idim->bn->hidden) -> n ConvNeXt blocks -> conv_out
    (modeling_minicpmo.py:2306-2345). channels-last (B, T, C)."""
    idim: int
    odim: int
    n_layer: int = 12
    bn_dim: int = 64
    hidden: int = 256
    kernel: int = 7
    dilation: int = 2
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda n, k, name, bias=True: nn.Conv(
            n, (k,), padding="SAME", use_bias=bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        y = conv(self.bn_dim, 3, "conv_in0")(x)
        y = nn.gelu(y, approximate=False)   # reference nn.GELU() = erf
        y = conv(self.hidden, 3, "conv_in1")(y)
        for i in range(self.n_layer):
            y = ConvNeXt1DBlock(self.hidden, self.hidden * 4, self.kernel,
                                self.dilation, self.dtype,
                                self.param_dtype, name=f"block_{i}")(y)
        return conv(self.odim, 1, "conv_out", bias=False)(y)


def _fsq_basis(levels: Sequence[int]) -> jnp.ndarray:
    basis = [1]
    for l in levels[:-1]:
        basis.append(basis[-1] * l)
    return jnp.asarray(basis, jnp.int32)


def fsq_indices_to_codes(indices: jnp.ndarray,
                         levels: Sequence[int]) -> jnp.ndarray:
    """FSQ codebook lookup: index -> per-dim centered codes in [-1, 1]
    (vector_quantize_pytorch FSQ.indices_to_codes semantics)."""
    lv = jnp.asarray(levels, jnp.int32)
    half = lv // 2
    codes = (indices[..., None] // _fsq_basis(levels)) % lv
    return (codes - half) / half.astype(jnp.float32)


def fsq_codes_to_indices(codes: jnp.ndarray,
                         levels: Sequence[int]) -> jnp.ndarray:
    lv = jnp.asarray(levels, jnp.int32)
    half = lv // 2
    scaled = jnp.round(codes * half + half).astype(jnp.int32)
    return jnp.sum(scaled * _fsq_basis(levels), axis=-1)


def fsq_quantize(z: jnp.ndarray, levels: Sequence[int]) -> jnp.ndarray:
    """Bounded round-to-level quantization (FSQ.quantize): tanh bound to
    the level range, round, rescale to [-1, 1]."""
    lv = jnp.asarray(levels, jnp.float32)
    eps = 1e-3
    half_l = (lv - 1) * (1 + eps) / 2
    offset = jnp.where(jnp.asarray(levels) % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    bounded = jnp.tanh(z + shift) * half_l - offset
    half_width = jnp.asarray([l // 2 for l in levels], jnp.float32)
    return jnp.round(bounded) / half_width


class GroupedResidualFSQ(nn.Module):
    """G groups x R residual FSQ quantizers over the channel dim, each
    group with its own in/out projections (vector_quantize_pytorch
    GroupedResidualFSQ with dim=1024, levels=(5,5,5,5), G=2, R=2 as built
    by GFSQ, modeling_minicpmo.py:2262-2303). Residual quantizer r uses
    scale (levels-1)^-r over the running residual."""
    dim: int
    levels: Tuple[int, ...]
    groups: int
    num_quantizers: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        d = self.dim // self.groups
        cd = len(self.levels)
        self.project_in = [
            nn.Dense(cd, dtype=self.dtype, param_dtype=self.param_dtype,
                     name=f"project_in_{g}") for g in range(self.groups)]
        self.project_out = [
            nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                     name=f"project_out_{g}") for g in range(self.groups)]

    def _scales(self):
        lv = jnp.asarray(self.levels, jnp.float32) - 1.0
        return [lv ** (-float(r)) for r in range(self.num_quantizers)]

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, dim) -> indices (B, T, groups*num_quantizers)."""
        scales = self._scales()
        out = []
        for g, xg in enumerate(jnp.split(x, self.groups, axis=-1)):
            z = self.project_in[g](xg)                 # (B, T, cd)
            residual = z
            for r in range(self.num_quantizers):
                q = fsq_quantize(residual / scales[r], self.levels)
                out.append(fsq_codes_to_indices(q, self.levels))
                residual = residual - q * scales[r]
        return jnp.stack(out, axis=-1)                 # (B, T, G*R)

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices: (B, T, groups*num_quantizers) -> (B, T, dim)."""
        scales = self._scales()
        outs = []
        for g in range(self.groups):
            total = 0.0
            for r in range(self.num_quantizers):
                ind = indices[..., g * self.num_quantizers + r]
                total = total + fsq_indices_to_codes(
                    ind, self.levels) * scales[r]
            outs.append(self.project_out[g](total.astype(self.dtype)))
        return jnp.concatenate(outs, axis=-1)


class DVAE(nn.Module):
    """Mel codec (modeling_minicpmo.py:2349-2427): mel/coef -> downsample
    conv (stride 2) -> encoder -> FSQ indices; indices -> FSQ feats ->
    2x time-interleave -> decoder -> out conv -> mel * coef.

    Channels-last (B, T, C); the reference is (B, C, T)."""
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        dt, pt = self.dtype, self.param_dtype
        self.coef = self.param("coef", nn.initializers.uniform(1.0),
                               (100,), jnp.float32)
        self.down0 = nn.Conv(512, (3,), padding="SAME", dtype=dt,
                             param_dtype=pt, name="down0")
        self.down1 = nn.Conv(512, (4,), strides=(2,), padding=[(1, 1)],
                             dtype=dt, param_dtype=pt, name="down1")
        self.encoder = DVAEDecoder(512, 1024, n_layer=12, bn_dim=128,
                                   hidden=256, dtype=dt, param_dtype=pt,
                                   name="encoder")
        self.decoder = DVAEDecoder(512, 512, n_layer=12, bn_dim=128,
                                   hidden=256, dtype=dt, param_dtype=pt,
                                   name="decoder")
        self.out_conv = nn.Conv(100, (3,), padding="SAME", use_bias=False,
                                dtype=dt, param_dtype=pt, name="out_conv")
        self.vq = GroupedResidualFSQ(1024, (5, 5, 5, 5), 2, 2, dtype=dt,
                                     param_dtype=pt, name="vq")

    def encode(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel (B, T, 100) -> indices (B, T//2, 4)."""
        x = mel / self.coef
        x = nn.gelu(self.down0(x), approximate=False)
        x = nn.gelu(self.down1(x), approximate=False)
        x = self.encoder(x)                            # (B, T/2, 1024)
        return self.vq.encode(x)

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices (B, T, 4) -> mel (B, 2T, 100)."""
        feats = self.vq.decode(indices)                # (B, T, 1024)
        b, t, _ = feats.shape
        # (B, T, 2, 512) -> interleave the halves along time (reference
        # view(B,2,512,T).permute(0,2,3,1).flatten(2): frame t emits
        # [half0_t, half1_t])
        feats = feats.reshape(b, t, 2, 512).reshape(b, 2 * t, 512)
        mel = self.out_conv(self.decoder(feats))       # (B, 2T, 100)
        return mel * self.coef

    def __call__(self, indices):
        return self.decode(indices)

    def encode_decode(self, mel):
        """Round-trip; also the init method that touches every param."""
        return self.decode(self.encode(mel))


# ---------------------------------------------------------------------------
# Vocos-style vocoder: ConvNeXt backbone + ISTFT head
# ---------------------------------------------------------------------------


class VocosVocoder(nn.Module):
    """Mel -> waveform. The reference instantiates Vocos from a checkpoint
    yaml (modeling_minicpmo.py:140-189); ChatTTS's shipped config is a
    VocosBackbone(input 100, dim 512, intermediate 1536, 8 layers) with an
    ISTFT head (n_fft 1024, hop 256, center). Same graph here, ISTFT as
    framed overlap-add."""
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel (B, T, input_channels) -> audio (B, T * hop_length)."""
        dt, pt = self.dtype, self.param_dtype
        x = nn.Conv(self.dim, (7,), padding="SAME", dtype=dt,
                    param_dtype=pt, name="embed")(mel)
        x = nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=pt,
                         name="norm_in")(x)
        for i in range(self.num_layers):
            x = ConvNeXt1DBlock(self.dim, self.intermediate_dim, 7, 1,
                                dt, pt, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=dt, param_dtype=pt,
                         name="norm_out")(x)
        # ISTFT head: per-frame magnitude+phase -> time frames. The
        # inverse rFFT is an explicit real DFT matmul (MXU-friendly; the
        # TPU runtime here lacks complex FFT support):
        # x[t] = sum_k w_k (re_k cos(2pi k t / n) - im_k sin(...)),
        # w_k = (2 - [k in {0, n/2}]) / n.
        h = nn.Dense(self.n_fft + 2, dtype=dt, param_dtype=pt,
                     name="head")(x)                   # (B, T, n_fft+2)
        mag, phase = jnp.split(h, 2, axis=-1)
        mag = jnp.exp(jnp.clip(mag, None, 10.0)).astype(jnp.float32)
        phase = phase.astype(jnp.float32)
        re = mag * jnp.cos(phase)                      # (B, T, n_fft/2+1)
        im = mag * jnp.sin(phase)
        nf = self.n_fft
        k = jnp.arange(nf // 2 + 1, dtype=jnp.float32)[:, None]
        t = jnp.arange(nf, dtype=jnp.float32)[None, :]
        w = jnp.where((k == 0) | (k == nf // 2), 1.0, 2.0) / nf
        cos_b = w * jnp.cos(2 * jnp.pi * k * t / nf)   # (nf/2+1, nf)
        sin_b = w * jnp.sin(2 * jnp.pi * k * t / nf)
        frames = re @ cos_b - im @ sin_b               # (B, T, n_fft)
        window = jnp.hanning(self.n_fft).astype(jnp.float32)
        frames = frames * window

        b, t, _ = frames.shape
        out_len = (t - 1) * self.hop_length + self.n_fft
        idx = (jnp.arange(t)[:, None] * self.hop_length
               + jnp.arange(self.n_fft)[None, :])     # (T, n_fft)
        audio = jnp.zeros((b, out_len), jnp.float32).at[
            :, idx.reshape(-1)].add(frames.reshape(b, -1))
        env = jnp.zeros((out_len,), jnp.float32).at[
            idx.reshape(-1)].add(jnp.tile(window ** 2, (t,)))
        audio = audio / jnp.maximum(env, 1e-8)
        pad = self.n_fft // 2                          # center=True trim
        return audio[:, pad:-pad]


# ---------------------------------------------------------------------------
# ConditionalChatTTS: LLM-conditioned streaming audio-code GPT
# ---------------------------------------------------------------------------


def make_generation_kv_mask(cfg: ChatTTSConfig, text_mask: jnp.ndarray,
                            kv_len: int, past_seen: jnp.ndarray,
                            seq_end=None):
    """Which cache positions an audio query may attend
    (make_streaming_chunk_mask_generation, :2464-2530): always the bos/spk
    prefix and the audio region; text only the first
    ceil((past-reserved)/audio_chunk)*text_chunk prefilled tokens.

    text_mask: (reserved_len,) bool of prefilled text positions.
    past_seen drives the visible-text chunk computation; seq_end (default:
    past_seen) bounds the attended extent — chunked audio prefill passes the
    pre-chunk KV length as past_seen but the chunk end as seq_end, matching
    prefill_audio_ids (modeling_minicpmo.py:2892).
    Returns (1, kv_len) bool.
    """
    prefix = 1 + cfg.num_spk_embs * int(cfg.use_speaker_embedding)
    reserved = cfg.streaming_text_reserved_len
    pos = jnp.arange(kv_len)

    chunks = jnp.ceil((past_seen.astype(jnp.float32) - reserved)
                      / cfg.streaming_audio_chunk_size)
    visible_text_end = prefix + jnp.minimum(
        chunks * cfg.streaming_text_chunk_size, float(reserved))
    in_text = (pos >= prefix) & (pos < prefix + reserved)
    text_ok = (pos < visible_text_end) & jnp.pad(
        text_mask, (prefix, kv_len - prefix - reserved),
        constant_values=True)[pos]
    mask = jnp.where(in_text, text_ok, True)
    # the [Ptts] audio-bos slot (prefix + reserved) is permanently
    # invisible: the reference's invisible-text range runs to
    # reserved + 1 + num_spk + 1 (make_streaming_chunk_mask_generation,
    # modeling_minicpmo.py:2513-2520), which always covers it
    mask = mask & (pos != prefix + reserved)
    # nothing beyond the current sequence
    mask = mask & (pos <= (past_seen if seq_end is None else seq_end))
    return mask[None, :]


class ConditionalChatTTS(nn.Module):
    """The TTS GPT (modeling_minicpmo.py:2590-3185): Llama backbone with
    text embeddings, num_vq audio-code embeddings (summed), an LLM->TTS
    speaker projector, and num_vq weight-normed logit heads."""
    cfg: ChatTTSConfig

    def setup(self):
        cfg = self.cfg
        dt, pt = cfg.dtype, cfg.param_dtype
        self.emb_text = nn.Embed(cfg.num_text_tokens, cfg.hidden_size,
                                 dtype=dt, param_dtype=pt, name="emb_text")
        self.emb_code = [
            nn.Embed(cfg.num_audio_tokens, cfg.hidden_size, dtype=dt,
                     param_dtype=pt, name=f"emb_code_{i}")
            for i in range(cfg.num_vq)]
        if cfg.use_mlp:
            self.projector = MultiModalProjector(cfg.hidden_size, dt, pt,
                                                 name="projector")
        else:
            self.projector = nn.Dense(cfg.hidden_size, use_bias=False,
                                      dtype=dt, param_dtype=pt,
                                      name="projector")
        self.blocks = ScannedQwen2Block(cfg.backbone, name="blocks")
        self.norm = RMSNorm(1e-6, pt, name="norm")
        # weight-normed heads: w = g * v / ||v|| (torch weight_norm)
        self.head_v = [
            self.param(f"head_v_{i}", nn.initializers.lecun_normal(),
                       (cfg.hidden_size, cfg.num_audio_tokens), pt)
            for i in range(cfg.num_vq)]
        self.head_g = [
            self.param(f"head_g_{i}", nn.initializers.ones,
                       (cfg.num_audio_tokens,), pt)
            for i in range(cfg.num_vq)]

    # -- embeddings ------------------------------------------------------
    def embed_text(self, input_ids, spk_hidden=None):
        """Text embeddings with the spk-emb token replaced by the
        projected, L2-normalized LLM hidden state (:2744-2780)."""
        cfg = self.cfg
        emb = self.emb_text(input_ids)
        if spk_hidden is not None and cfg.use_speaker_embedding:
            proj = self.projector(spk_hidden)          # (B, n_spk, H)
            proj = proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)
            is_spk = (input_ids == cfg.spk_emb_token_id)
            # scatter each spk embedding into its token slot (num_spk=1
            # shipped); emulate with where over the (single) position
            emb = jnp.where(is_spk[..., None],
                            proj[:, :1].astype(emb.dtype), emb)
        return emb

    def embed_code(self, audio_ids):
        """audio_ids (B, S, num_vq) -> summed code embeddings."""
        out = 0.0
        for i in range(self.cfg.num_vq):
            out = out + self.emb_code[i](audio_ids[..., i])
        return out

    def code_logits(self, hidden):
        """(B, S, H) -> (B, S, num_audio_tokens, num_vq)."""
        outs = []
        for v, g in zip(self.head_v, self.head_g):
            w = v * (g / jnp.linalg.norm(v, axis=0))[None, :]
            outs.append(hidden.astype(w.dtype) @ w)
        return jnp.stack(outs, axis=-1)

    # -- cache plumbing --------------------------------------------------
    def init_cache(self, max_len: int):
        cfg = self.cfg.backbone
        shape = (cfg.num_hidden_layers, 1, max_len,
                 cfg.num_key_value_heads, cfg.head_dim)
        return (jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))

    def _run(self, embeds, positions, kv_mask, cache, cache_index,
             causal):
        cfg = self.cfg.backbone
        cos, sin = rope_freqs_half(positions, cfg.head_dim, cfg.rope_theta)
        hidden, _, new_cache = self.blocks(
            embeds, cos, sin, kv_mask, cache, cache_index, causal,
            causal_offset=cache_index)
        return self.norm(hidden), new_cache

    def prefill_text(self, input_ids, positions, cache, spk_hidden=None):
        """Write a chunk of text tokens into the cache (:2782-2855).
        positions: (B, S) absolute slots in the reserved text region."""
        embeds = self.embed_text(input_ids, spk_hidden)
        kv_len = cache[0].shape[2]
        kv_mask = (jnp.arange(kv_len)[None, :] <= positions[:, -1:])
        _, cache = self._run(embeds, positions, kv_mask, cache,
                             positions[0, 0], causal=True)
        return cache

    def prefill_audio(self, audio_ids, cache, cache_index, text_mask):
        """Prefill audio codes (sliding-window continuation, :2857-2915),
        prepending the audio-bos embedding."""
        bos = self.emb_text(jnp.full((audio_ids.shape[0], 1),
                                     self.cfg.audio_bos_token_id))
        embeds = jnp.concatenate([bos, self.embed_code(audio_ids)], axis=1)
        s = embeds.shape[1]
        positions = cache_index + jnp.arange(s)[None, :]
        kv_mask = make_generation_kv_mask(
            self.cfg, text_mask, cache[0].shape[2],
            cache_index, seq_end=cache_index + s - 1)
        _, cache = self._run(embeds, positions, kv_mask, cache,
                             cache_index, causal=True)
        return cache

    def decode_step(self, embeds, cache, cache_index, text_mask):
        """One-token step -> (logits (B, num_audio_tokens, num_vq), cache)."""
        positions = jnp.full((embeds.shape[0], 1), cache_index)
        kv_mask = make_generation_kv_mask(self.cfg, text_mask,
                                          cache[0].shape[2], cache_index)
        hidden, cache = self._run(embeds, positions, kv_mask, cache,
                                  cache_index, causal=False)
        return self.code_logits(hidden)[:, -1], cache

    def init_all(self, input_ids, positions, cache, spk_hidden,
                 audio_ids, text_mask):
        """Init method touching every parameter (text path + code
        embeddings + heads)."""
        cache = self.prefill_text(input_ids, positions, cache, spk_hidden)
        embeds = self.embed_code(audio_ids)
        logits, cache = self.decode_step(
            embeds[:, :1], cache,
            jnp.asarray(self.cfg.condition_length - 1), text_mask)
        return logits

    # -- sampling --------------------------------------------------------
    def generate(self, audio_ids, cache, cache_index, text_mask, rng,
                 max_new_tokens: int, min_new_tokens: int = 10,
                 temperature: float = 1.0):
        """Sample audio codes (:2917-3130) as a lax.fori_loop: per step,
        embed the previous num_vq codes (or audio-bos on the first audio
        position), run one cached step, apply repetition penalty /
        temperature / top-k / top-p per codebook, sample.

        audio_ids: (1, S_buf, num_vq) buffer whose first `start` entries
        (== cache_index - condition_length... callers pass the running
        count via cache_index) are valid. Returns (audio_ids, cache,
        n_generated, finished_at).
        """
        cfg = self.cfg
        cond_len = cfg.condition_length
        eos = cfg.num_audio_tokens - 1                 # ChatTTS convention

        win = min(cfg.repetition_window, audio_ids.shape[1])

        def sample_heads(logits, window, window_valid, rng, step):
            # logits (1, num_audio_tokens, num_vq) -> ids (num_vq,)
            l = logits[0].T.astype(jnp.float32)        # (num_vq, V)
            if cfg.repetition_penalty != 1.0:
                onehot = jax.nn.one_hot(window, l.shape[-1])  # (nvq,w,V)
                # per-token occurrence count in the window; reference
                # scales by penalty**freq (CustomRepetitionPenalty...Repeat,
                # modeling_minicpmo.py:2545-2549), not a binary flag.
                count = jnp.sum(onehot * window_valid[None, :, None],
                                axis=1)                # (num_vq, V)
                factor = jnp.power(cfg.repetition_penalty, count)
                l = jnp.where(l > 0, l / factor, l * factor)
            l = l / temperature
            l = jnp.where(step < min_new_tokens,
                          l.at[:, eos].set(-jnp.inf), l)
            # top-k
            kth = jnp.sort(l, axis=-1)[:, -cfg.top_k][:, None]
            l = jnp.where(l < kth, -jnp.inf, l)
            # top-p (nucleus)
            probs = jax.nn.softmax(l, axis=-1)
            sorted_p = jnp.sort(probs, axis=-1)[:, ::-1]
            cum = jnp.cumsum(sorted_p, axis=-1)
            cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1)
            cutoff = jnp.take_along_axis(sorted_p, cutoff_idx[:, None],
                                         axis=-1)
            l = jnp.where(probs < cutoff, -jnp.inf, l)
            return jax.random.categorical(rng, l, axis=-1)  # (num_vq,)

        def body(i, carry):
            audio_ids, cache, n, finished, rng = carry
            step_index = cache_index + n
            # audio-bos activation only at the very first audio position
            # (reference: progress == condition_length, :2989-3002)
            is_bos = (n == 0) & (cache_index == cond_len - 1)

            prev = jax.lax.dynamic_slice_in_dim(
                audio_ids, jnp.maximum(n - 1, 0), 1, axis=1)  # (1,1,nvq)
            embeds = jnp.where(
                is_bos,
                self.emb_text(jnp.full((1, 1), cfg.audio_bos_token_id)),
                self.embed_code(prev))
            logits, cache = self.decode_step(embeds, cache, step_index,
                                             text_mask)
            rng, sub = jax.random.split(rng)
            start = jnp.maximum(n - win, 0)
            window = jax.lax.dynamic_slice_in_dim(
                audio_ids, start, win, axis=1)[0].T    # (num_vq, win)
            window_valid = (start + jnp.arange(win)) < n
            next_ids = sample_heads(logits, window, window_valid, sub, n)
            next_ids = jnp.where(finished, eos, next_ids)
            audio_ids = jnp.where(
                finished, audio_ids,
                jax.lax.dynamic_update_slice_in_dim(
                    audio_ids, next_ids[None, None, :], n, axis=1))
            # reference stops when ANY codebook emits eos
            # (idx_next.eq(eos_token).any(1), modeling_minicpmo.py:3104);
            # the eos step is written at slot n but n does not advance, so
            # valid codes remain [0, n) — matching the reference trim.
            finished = finished | jnp.any(next_ids == eos)
            n = jnp.where(finished, n, n + 1)
            return audio_ids, cache, n, finished, rng

        finished = jnp.asarray(False)
        n0 = jnp.asarray(0, jnp.int32)
        audio_ids, cache, n, finished, _ = jax.lax.fori_loop(
            0, max_new_tokens, body,
            (audio_ids, cache, n0, finished, rng))
        return audio_ids, cache, n, finished
