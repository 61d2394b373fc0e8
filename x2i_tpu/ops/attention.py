"""Attention dispatcher.

Canonical tensor layout everywhere in x2i_tpu is (batch, seq, heads, head_dim)
— the natural layout for the surrounding projections. The dispatcher
transposes to (B, H, S, D), picks the Pallas flash kernel when the platform
and shapes allow, and falls back to a plain-XLA implementation otherwise
(CPU tests, odd shapes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from x2i_tpu.ops import flash_attention as fa


def _platform() -> str:
    return jax.default_backend()


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              kv_mask: Optional[jnp.ndarray] = None,
              causal: bool = False,
              scale: Optional[float] = None,
              bias: Optional[jnp.ndarray] = None,
              implementation: str = "auto",
              causal_offset=0,
              rope=None, qk_norm=None) -> jnp.ndarray:
    """Multi-head (optionally grouped-query) attention.

    Args:
      q: (B, Sq, Hq, D)
      k, v: (B, Skv, Hk, D) with Hq % Hk == 0
      kv_mask: optional (B, Skv) bool — True where the key is valid.
      causal: apply causal mask (assumes Sq == Skv alignment at the end).
      bias: optional additive logits bias (B|1, H, Sq, Skv) — T5 relpos.
        Forces the XLA path.
      causal_offset: absolute position of query row 0 for chunked prefill
        against a KV cache (may be traced). Forces the XLA path when
        nonzero.
      implementation: 'auto' | 'pallas' | 'xla'.
      rope: optional (cos, sin) HALF-layout rotary tables, each (S, D)
        f32 (flux_rope_freqs_half), applied to both q and k. On the
        Pallas path (joint attention, Sq == Skv, non-causal) the rotation
        happens inside the kernel so un-roped projections feed it
        directly; otherwise it is applied here before dispatch.
      qk_norm: optional (q_scale (D,), k_scale (D,), eps) per-head-dim
        RMSNorm applied to q/k before rope — inside the kernel on the
        in-kernel-rope path (inference-only, no vjp), in XLA otherwise.

    Returns:
      (B, Sq, Hq, D) in q.dtype.
    """
    b, sq, hq, d = q.shape
    skv = k.shape[1]

    offset_static_zero = isinstance(causal_offset, int) and causal_offset == 0
    pallas_ok = bias is None and offset_static_zero and (
        implementation == "pallas" or (
            implementation == "auto" and _platform() not in ("cpu",)))
    use_pallas = pallas_ok and fa.supported((b, hq, sq, d), skv)

    # pad-and-mask path: the kernel needs S % 128 == 0; odd joint lengths
    # (e.g. 832^2..960^2 latent grids -> 3216..4112 tokens) previously fell
    # off a 2.6x cliff to XLA attention. Pad q rows (sliced off below) and
    # kv with masked-out keys instead. Non-causal only: end-padding both
    # sides would shift the kernel's causal diagonal alignment.
    pad_q, pad_kv = (-sq) % 128, (-skv) % 128
    pad_path = (not use_pallas and pallas_ok and not causal
                and d in (64, 128, 256) and (pad_q or pad_kv)
                and fa.supported((b, hq, sq + pad_q, d), skv + pad_kv))

    kernel_rope = (rope is not None and (use_pallas or pad_path)
                   and sq == skv and not causal)
    if qk_norm is not None and not kernel_rope:
        # no in-kernel path: apply the norm here (before rope, matching
        # the module order)
        from x2i_tpu.ops.norms import rms_norm
        qw, kw, eps = qk_norm
        # per-row (S, D) scales broadcast over the head axis of (B,S,H,D)
        qw = qw if qw.ndim == 1 else qw[:, None, :]
        kw = kw if kw.ndim == 1 else kw[:, None, :]
        q = rms_norm(q, qw, eps)
        k = rms_norm(k, kw, eps)
        qk_norm = None
    if rope is not None and not kernel_rope:
        from x2i_tpu.ops.rope import apply_rope_half
        cos, sin = rope
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        rope = None

    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    if pad_path:
        qp = jnp.pad(qt, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        kp = jnp.pad(kt, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        vp = jnp.pad(vt, ((0, 0), (0, 0), (0, pad_kv), (0, 0)))
        mask = kv_mask if kv_mask is not None else jnp.ones((b, skv), bool)
        mask = jnp.pad(mask.astype(bool), ((0, 0), (0, pad_kv)))
        if rope is not None:
            # zero-padded table rows rotate pad rows to zero — harmless:
            # pad keys are masked out, pad q rows are sliced off below
            rope = tuple(jnp.pad(t, ((0, pad_kv), (0, 0))) for t in rope)
        out = fa.flash_attention(qp, kp, vp, kv_mask=mask, causal=False,
                                 scale=scale, rope=rope,
                                 qk_norm=qk_norm)[:, :, :sq]
    elif use_pallas:
        out = fa.flash_attention(qt, kt, vt, kv_mask=kv_mask, causal=causal,
                                 scale=scale, rope=rope, qk_norm=qk_norm)
    else:
        out = fa.xla_attention(qt, kt, vt, kv_mask=kv_mask, causal=causal,
                               scale=scale, bias=bias,
                               causal_offset=causal_offset)
    return jnp.swapaxes(out, 1, 2)
