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
    # Rescale in f32 but cast to x.dtype INSIDE the custom_vjp: the vjp
    # output is a fusion/remat boundary, so an f32 root can become a
    # materialized f32 temp (216 MB per 12B block at the 128-grid point)
    # whenever the consumer's cast doesn't fuse across it. Numerics are
    # identical to casting immediately outside, which QuantDense did;
    # measured HBM-neutral on the 128-grid student program (XLA was
    # already folding the cast there) but it removes the dependence on
    # that folding and makes the op's output dtype follow x.
    return (acc.astype(jnp.float32) * a_scale
            * scale.astype(jnp.float32)).astype(x.dtype)


def _w8a8_fwd(x, qkernel, scale):
    # zero-size sentinel carries x's dtype (dtypes aren't valid residuals)
    return (w8a8_matmul(x, qkernel, scale),
            (jnp.zeros((0,), x.dtype), qkernel, scale))


def _w8a8_bwd(res, dy):
    x_sentinel, qkernel, scale = res
    x_dtype = x_sentinel.dtype
    # dx_i = sum_o dy_o * W_io: contract W's OUT dim directly instead of
    # materializing W^T. A swapaxes formulation (even behind
    # optimization_barriers — they are layout-transparent) made layout
    # assignment relayout the int8 param stacks feeding the scan: six
    # hoisted 171 MB copies of the double-block qkv stacks plus a 90 MB
    # per-layer bf16 W^T temp at full size (observed in the 12B student's
    # OOM allocation dump). With the direct contraction the dot consumes
    # the dequantized weight in its native (in, out) layout; the barrier
    # keeps the dequant itself inside the loop.
    qk = jax.lax.optimization_barrier(qkernel)
    w = qk.astype(x_dtype) * scale.astype(x_dtype)           # (in, out)
    dx = jax.lax.dot_general(
        dy.astype(x_dtype), w, (((dy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_dtype)
    return (dx, np.zeros(qkernel.shape, jax.dtypes.float0),
            jnp.zeros_like(scale))


w8a8_matmul.defvjp(_w8a8_fwd, _w8a8_bwd)


def w8a8_matmul_prequant(xq, a_scale, qkernel, scale, out_dtype=None):
    """int8 matmul over an ALREADY-quantized activation (xq int8 (..., in),
    a_scale f32 (..., 1) — the output form of ops/fused_glue kernels).
    Skips w8a8_matmul's in-graph dynamic quantization so the fused glue
    kernels own the only HBM pass over the activation. Inference-only (no
    custom_vjp; training keeps the unfused path)."""
    acc = jax.lax.dot_general(
        xq, qkernel, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * a_scale * scale.astype(jnp.float32)
    return out.astype(out_dtype) if out_dtype is not None else out


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
        # (xq int8, a_scale f32) tuple input = pre-quantized activation
        # from an ops/fused_glue kernel; a LIST of such tuples = chunks
        # along the input-feature axis (the matmul runs per chunk against
        # the matching kernel rows and sums — replaces a concatenate, so
        # e.g. the single block's [attn | mlp] 141 MB concat copy never
        # materializes). w8a8-only, inference-only.
        prequant = isinstance(x, (tuple, list))
        chunks = (list(x) if isinstance(x, list) else [x]) if prequant \
            else None
        in_features = (sum(c[0].shape[-1] for c in chunks) if prequant
                       else x.shape[-1])
        qkernel = self.param(
            "qkernel", nn.initializers.zeros, (in_features, self.features),
            jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        if prequant:
            if self.mode != "w8a8":
                raise ValueError("pre-quantized input requires mode w8a8")
            y, off = None, 0
            for xq, a_scale in chunks:
                f = xq.shape[-1]
                part = w8a8_matmul_prequant(
                    xq, a_scale, jax.lax.slice_in_dim(qkernel, off, off + f,
                                                      axis=0),
                    scale, out_dtype=self.dtype)
                y = part if y is None else y + part
                off += f
        elif self.mode == "w8a8":
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
