"""Rotary position embeddings.

Two conventions are needed:

1. FLUX (diffusers FluxPosEmbed, used at
   /root/reference/lightcontrol/lightcontrol_flux.py:247,472): 3-axis RoPE
   with *interleaved* pair rotation — pairs are (x[2i], x[2i+1]) and cos/sin
   are repeat_interleaved to full head_dim.

2. Qwen2/LLaMA-style (reference model_internvl/modeling_qwen2.py): *half*
   rotation — pairs are (x[i], x[i+d/2]) and cos/sin are tiled twice.

All freq tables are computed in float32 (the torch reference uses float64 on
CUDA; positions here are small integers so f32 is exact enough — the max
position is the 128-wide latent grid or a ≤32k token index).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def flux_rope_freqs(ids: jnp.ndarray,
                    axes_dim: Sequence[int],
                    theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token cos/sin for FLUX 3-axis RoPE.

    Args:
      ids: (S, n_axes) float/int position ids — cat(txt_ids, img_ids).
      axes_dim: per-axis head-dim budget, e.g. (16, 56, 56); sums to head_dim.

    Returns:
      (cos, sin), each (S, head_dim), f32, repeat-interleaved so that
      cos[:, 2i] == cos[:, 2i+1].
    """
    ids = ids.astype(jnp.float32)
    coses, sins = [], []
    for i, dim in enumerate(axes_dim):
        pos = ids[:, i]                                      # (S,)
        freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        ang = pos[:, None] * freqs[None, :]                  # (S, dim/2)
        cos = jnp.repeat(jnp.cos(ang), 2, axis=-1)           # (S, dim)
        sin = jnp.repeat(jnp.sin(ang), 2, axis=-1)
        coses.append(cos)
        sins.append(sin)
    return jnp.concatenate(coses, axis=-1), jnp.concatenate(sins, axis=-1)


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray,
                           sin: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-pair rotation (diffusers apply_rotary_emb, use_real=True,
    use_real_unbind_dim=-1).

    Args:
      x: (..., S, D) query/key.
      cos, sin: (S, D) from flux_rope_freqs.
    """
    orig_dtype = x.dtype
    # strided-slice first in the original dtype (see apply_rope_half: a
    # whole-tensor f32 convert becomes a materialized f32 fusion root)
    x_even = x[..., 0::2].astype(jnp.float32)
    x_odd = x[..., 1::2].astype(jnp.float32)
    c, s = cos[..., 0::2], sin[..., 0::2]   # pair members share the angle
    out = jnp.stack([x_even * c - x_odd * s,
                     x_odd * c + x_even * s], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def flux_rope_freqs_half(ids: jnp.ndarray,
                         axes_dim: Sequence[int],
                         theta: float = 10000.0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FLUX 3-axis cos/sin in the HALF (rotate-half) channel layout.

    The interleaved pair (2m, 2m+1) maps to (m, D/2+m) under
    ``half_layout_perm``; both members share the pair's angle, so the
    half-layout table is the per-axis pair base concatenated across axes
    and then duplicated: cos_half = cat(base, base) with
    base[m] == cos_interleaved[2m]. Using it with ``apply_rope_half`` on
    permuted q/k reproduces the interleaved rotation exactly (the q.k
    scores are invariant to the shared channel permutation).
    """
    ids = ids.astype(jnp.float32)
    angs = []
    for i, dim in enumerate(axes_dim):
        pos = ids[:, i]
        freqs = 1.0 / (theta ** (jnp.arange(0, dim, 2,
                                            dtype=jnp.float32) / dim))
        angs.append(pos[:, None] * freqs[None, :])           # (S, dim/2)
    ang = jnp.concatenate(angs, axis=-1)                     # (S, D/2)
    ang = jnp.concatenate([ang, ang], axis=-1)               # (S, D)
    return jnp.cos(ang), jnp.sin(ang)


def half_layout_perm(head_dim: int):
    """Channel permutation taking interleaved-layout weights to half
    layout: new[m] = old[2m], new[D/2 + m] = old[2m + 1].

    Apply to the per-head output channels of the q/k projections (and any
    per-channel q/k norm scales); attention outputs are unchanged because
    the permutation is shared between q and k.
    """
    import numpy as np
    return np.concatenate([np.arange(0, head_dim, 2),
                           np.arange(1, head_dim, 2)])


def rope_freqs_half(positions: jnp.ndarray, head_dim: int,
                    theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LLaMA/Qwen2 convention: cos/sin tables tiled as cat(freqs, freqs).

    Args:
      positions: (..., S) integer positions.
    Returns:
      (cos, sin) with shape (..., S, head_dim), f32.
    """
    inv = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * inv     # (..., S, D/2)
    ang = jnp.concatenate([ang, ang], axis=-1)               # (..., S, D)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray,
                    sin: jnp.ndarray) -> jnp.ndarray:
    """Half-rotation: rotate_half(x) = cat(-x[d/2:], x[:d/2]).

    Args:
      x: (B, S, H, D).
      cos, sin: (B, S, D) or (S, D); broadcast over heads.
    """
    orig_dtype = x.dtype
    d2 = x.shape[-1] // 2
    # insert the head axis: (S, D) -> (S, 1, D); (B, S, D) -> (B, S, 1, D)
    cos = jnp.expand_dims(cos, -2)
    sin = jnp.expand_dims(sin, -2)
    # Slice in the original dtype and convert the halves inside the
    # multiply: converting the whole tensor first makes XLA materialize an
    # f32 copy of x as the producer-fusion root (2x HBM traffic); slicing
    # first keeps any materialized intermediate in orig dtype and the f32
    # converts live inside this fusion. The two output halves are computed
    # directly (no rotate_half operand — the concat is an output fusion;
    # cos/sin halves are equal by construction).
    x1 = x[..., :d2].astype(jnp.float32)
    x2 = x[..., d2:].astype(jnp.float32)
    c, s = cos[..., :d2], sin[..., :d2]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(orig_dtype)
