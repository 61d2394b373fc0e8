"""Normalization primitives (functional; f32 statistics, input-dtype output)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
             eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * lax.rsqrt(var + eps)
    if weight is not None:
        xf = xf * weight.astype(jnp.float32)
    return xf.astype(dtype)


def layer_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None,
               eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    if weight is not None:
        xf = xf * weight.astype(jnp.float32)
    if bias is not None:
        xf = xf + bias.astype(jnp.float32)
    return xf.astype(dtype)
