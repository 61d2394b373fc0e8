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
              causal_offset=0) -> jnp.ndarray:
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

    Returns:
      (B, Sq, Hq, D) in q.dtype.
    """
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    offset_static_zero = isinstance(causal_offset, int) and causal_offset == 0
    use_pallas = bias is None and offset_static_zero and (
        implementation == "pallas" or (
        implementation == "auto"
        and _platform() not in ("cpu",)
        and fa.supported(qt.shape, kt.shape[2])
    ))
    if use_pallas:
        out = fa.flash_attention(qt, kt, vt, kv_mask=kv_mask, causal=causal,
                                 scale=scale)
    else:
        out = fa.xla_attention(qt, kt, vt, kv_mask=kv_mask, causal=causal,
                               scale=scale, bias=bias,
                               causal_offset=causal_offset)
    return jnp.swapaxes(out, 1, 2)
