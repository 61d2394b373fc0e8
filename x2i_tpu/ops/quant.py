"""Weight-only int8 quantization for single-chip inference.

The full FLUX DiT is ~11.9B params: 23.7 GB in bf16 — over a single v5e
chip's 15.75 GB HBM. The reference sidesteps this with 80 GB A100s and
bitsandbytes 8-bit *optimizer* state (train only,
/root/reference/train/train_minicpm.py:441-451). For TPU serving we store
Dense kernels as int8 with per-output-channel f32 scales (11.9 GB) and
dequantize just-in-time inside the layer scan — XLA keeps only the current
block's bf16 weights live, so peak HBM = int8 params + one block + acts.

Two modes: "w8" keeps matmul compute in bf16 (memory win only,
near-lossless); "w8a8" also quantizes activations per token and runs the
int8 x int8 MXU path (2x bf16 rate on v5e), with a straight-through
backward so frozen quantized stacks stay differentiable w.r.t. inputs.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def w8a8_matmul(x, qkernel, scale):
    """int8 x int8 -> int32 MXU matmul with dynamic per-token activation
    scales. x (..., in) float; qkernel (in, out) int8; scale (out,) f32.

    Differentiable via a straight-through estimator: the backward pass
    computes dx against the dequantized kernel (exact for the
    weight-quantized matmul, ignoring the activation rounding), so the
    frozen-DiT distillation step can run the 2x int8 MXU rate forward.
    qkernel/scale receive zero cotangents — layers quantized this way are
    frozen by construction (the trainable proj/control nets stay bf16).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qkernel, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * a_scale * scale.astype(jnp.float32)


def _w8a8_fwd(x, qkernel, scale):
    # zero-size sentinel carries x's dtype (dtypes aren't valid residuals)
    return (w8a8_matmul(x, qkernel, scale),
            (jnp.zeros((0,), x.dtype), qkernel, scale))


def _w8a8_bwd(res, dy):
    x_sentinel, qkernel, scale = res
    x_dtype = x_sentinel.dtype
    # dx = dy @ W^T. The W^T relayout must stay INSIDE the DiT's scan loop:
    # it only depends on loop-invariant weights, so XLA hoists it and
    # materializes every layer's transposed int8 stack (+2 GB at full
    # size). Barrier the int8 kernel FIRST — guarding only the bf16
    # transpose still lets XLA hoist an int8 relayout feeding it — then
    # pin the dequant+transpose too (ephemeral ~19 MB, ~25 us/weight).
    qk = jax.lax.optimization_barrier(qkernel)
    w = qk.astype(x_dtype) * scale.astype(x_dtype)           # (in, out)
    wt = jax.lax.optimization_barrier(jnp.swapaxes(w, 0, 1))  # (out, in)
    dx = jax.lax.dot_general(
        dy.astype(x_dtype), wt, (((dy.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_dtype)
    return (dx, np.zeros(qkernel.shape, jax.dtypes.float0),
            jnp.zeros_like(scale))


w8a8_matmul.defvjp(_w8a8_fwd, _w8a8_bwd)


@jax.custom_vjp
def w8_matmul(x, qkernel, scale):
    """Weight-only int8 matmul: dequantize to x.dtype, bf16 MXU compute.

    Same backward treatment as w8a8_matmul: dx against the dequantized
    kernel with the W^T relayout pinned inside the loop (plain autodiff
    would let XLA hoist transposed copies of every layer's weight stack),
    zero cotangents for the frozen qkernel/scale."""
    w = qkernel.astype(x.dtype) * scale.astype(x.dtype)
    return jnp.dot(x, w)


def _w8_fwd(x, qkernel, scale):
    return (w8_matmul(x, qkernel, scale),
            (jnp.zeros((0,), x.dtype), qkernel, scale))


w8_matmul.defvjp(_w8_fwd, _w8a8_bwd)


class QuantDense(nn.Module):
    """Drop-in nn.Dense replacement storing int8 kernel + per-channel scale.

    Param layout: qkernel int8 (..., in, out); scale f32 (..., out);
    bias (out,) in param_dtype. Compatible with nn.scan stacking (leading
    layer axis).

    mode:
      "w8"   — weight-only: dequantize the kernel to bf16 per use; MXU runs
               bf16 (memory win only).
      "w8a8" — dynamic per-token activation quantization; the matmul runs
               int8 x int8 -> int32 on the MXU (2x bf16 rate on v5e), then
               rescales by (row_scale x channel_scale).
    """
    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    mode: str = "w8"

    @nn.compact
    def __call__(self, x):
        qkernel = self.param(
            "qkernel", nn.initializers.zeros, (x.shape[-1], self.features),
            jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        if self.mode == "w8a8":
            y = w8a8_matmul(x, qkernel, scale).astype(self.dtype)
        else:
            y = w8_matmul(x.astype(self.dtype), qkernel, scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


def make_dense(quantized, dtype, param_dtype):
    """Dense factory: nn.Dense or QuantDense with identical call signature.
    quantized: False | True ("w8") | "w8" | "w8a8"."""
    if quantized:
        mode = quantized if isinstance(quantized, str) else "w8"
        return lambda features, name, use_bias=True: QuantDense(
            features, use_bias=use_bias, dtype=dtype,
            param_dtype=param_dtype, mode=mode, name=name)
    return lambda features, name, use_bias=True: nn.Dense(
        features, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype,
        name=name)


def quantize_kernel(kernel: np.ndarray):
    """Symmetric per-output-channel int8. kernel (..., in, out) ->
    (qkernel int8, scale f32 (..., out)). For stacked scan params (L, in,
    out), scales are per (layer, channel)."""
    k = np.asarray(kernel, np.float32)
    amax = np.max(np.abs(k), axis=-2, keepdims=True)          # (..., 1, out)
    scale = np.maximum(amax / 127.0, 1e-12)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale, axis=-2)


def quantize_tree(params) -> Dict:
    """Rewrite a flax params tree: every 2D/3D 'kernel' becomes
    qkernel+scale (QuantDense layout). Conv kernels (4D+) and other leaves
    pass through."""
    if isinstance(params, dict):
        out = {}
        for name, val in params.items():
            if (isinstance(val, dict) and "kernel" in val
                    and not isinstance(val["kernel"], dict)
                    and getattr(val["kernel"], "ndim", 0) in (2, 3)):
                q, s = quantize_kernel(np.asarray(val["kernel"]))
                new = {"qkernel": q, "scale": s.astype(np.float32)}
                for extra, ev in val.items():
                    if extra != "kernel":
                        new[extra] = ev
                out[name] = new
            else:
                out[name] = quantize_tree(val)
        return out
    return params
