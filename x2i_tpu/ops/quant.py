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


# --- int4 (w4) weight-only mode -------------------------------------------
#
# Halves weight bytes again vs w8: the 11.9B-param DiT drops from 11.9 GB
# to ~6.0 GB + group scales, which is what lets the Qwen2.5-3B-class
# encoder colocate with the full DiT on one 16 GB chip (see
# tools/tpu_serve_singlechip.py). Per-(group-of-128-input-rows, out-channel)
# scales keep the quality loss far below per-channel int4.
#
# Storage is NIBBLE-PACKED int8 — two int4 codes per byte along the input
# dim — because jnp.int4 arrays cannot cross a jit boundary in this jax
# version (passing one as an argument raises RecursionError; verified
# 2026-08-18). int8 params work everywhere, and the unpack is two VPU
# shifts fused into the dequant.


def _w4_group(in_features: int, group: int) -> int:
    """Largest usable group size: `group` when it divides the input dim,
    else the whole input dim (per-channel scales)."""
    return group if group and in_features % group == 0 else in_features


def _unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """int8 (..., in//2, out) with two's-complement nibbles -> int8
    (..., in, out) values in [-8, 7]. Row 2i is the low nibble, 2i+1 the
    high nibble. Shifts sign-extend (arithmetic >> on signed int8)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    w = jnp.stack([lo, hi], axis=-2)                # (..., in//2, 2, out)
    return w.reshape(*packed.shape[:-2], 2 * packed.shape[-2],
                     packed.shape[-1])


def _dequant_w4(pkernel, scale, dtype):
    """packed int8 (in//2, out) + f32 scale (G, out) -> dtype (in, out)."""
    w = _unpack_int4(pkernel).astype(dtype)          # (..., in, out)
    inn, out = w.shape[-2], w.shape[-1]
    groups = scale.shape[-2]
    w = w.reshape(*w.shape[:-2], groups, inn // groups, out)
    w = w * scale[..., :, None, :].astype(dtype)
    return w.reshape(*pkernel.shape[:-2], inn, out)


@jax.custom_vjp
def w4_matmul(x, pkernel, scale):
    """Weight-only int4 matmul: unpack nibbles, dequantize per
    (input-group, out-channel), bf16 MXU compute. Same backward treatment
    as w8_matmul (dx against the dequantized kernel, contracted on W's out
    dim so no W^T relayout copies hoist out of layer scans)."""
    return jnp.dot(x, _dequant_w4(pkernel, scale, x.dtype))


def _w4_fwd(x, pkernel, scale):
    return (w4_matmul(x, pkernel, scale),
            (jnp.zeros((0,), x.dtype), pkernel, scale))


def _w4_bwd(res, dy):
    x_sentinel, pkernel, scale = res
    x_dtype = x_sentinel.dtype
    pk = jax.lax.optimization_barrier(pkernel)
    w = _dequant_w4(pk, scale, x_dtype)                      # (in, out)
    dx = jax.lax.dot_general(
        dy.astype(x_dtype), w, (((dy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_dtype)
    return (dx, np.zeros(pkernel.shape, jax.dtypes.float0),
            jnp.zeros_like(scale))


w4_matmul.defvjp(_w4_fwd, _w4_bwd)


# --- int4-stored, int8-computed (w4a8) mode -------------------------------
#
# w4's capacity (6.0 GB DiT, fits next to a 7B encoder) at w8a8's MXU
# rate: the flagship serving pair previously paid bf16 compute on the w4
# weights (DESIGN.md round-5 w8-gap analysis: bf16 DiT matmuls are ~2x
# the int8 time). Double quantization: the w4 per-(group, out) f32 scales
# factor into a per-out f32 base times a per-(group, out) int multiplier
# m in [1, 15]; the int8 MXU operand is then (int4 code x m) <= 120,
# reconstructed on the VPU from half the HBM bytes of w8a8's weights.
# Activations quantize per token exactly as w8a8. Weight quantization
# error: the int4 step plus the m rounding (measured end-to-end in
# tools/quant_e2e.py; m rounding adds <= 1/(2m) relative scale error).


def quantize_kernel_w4a8(kernel: np.ndarray, group: int = 128):
    """float (in, out) -> (pkernel int8 (in//2, out), mscale int8 (G, out)
    in [1,15], scale f32 (out,)). Codes are re-rounded against the
    REALIZED per-group scale m*s (not the ideal f32 group scale), so the
    only extra error vs w4 is the scale snap itself.

    Packing is HALF-SPLIT (not w4's row-interleave): packed row r holds
    in-row r in its LOW nibble and in-row r + in/2 in its HIGH nibble.
    Why: the matmul then reconstructs each half with pure elementwise
    shifts (no stack/reshape interleave, no repeat), which XLA fuses
    into the dot's operand read — the interleaved layout cost 698 ms of
    relayout copies per 1024² image (profiled; the int8 dots themselves
    run at w8a8's exact rate)."""
    kernel = np.asarray(kernel, np.float32)
    inn, out = kernel.shape[-2], kernel.shape[-1]
    if inn % 2:
        raise ValueError("w4a8 needs an even input dim")
    g = _w4a8_group(inn, group)
    groups = inn // g
    k = kernel.reshape(*kernel.shape[:-2], groups, g, out)
    gscale = np.maximum(np.abs(k).max(axis=-2), 1e-8) / 7.0  # (.., G, out)
    s = gscale.max(axis=-2) / 15.0                           # (.., out)
    m = np.clip(np.round(gscale / s[..., None, :]), 1, 15)   # (.., G, out)
    real = m * s[..., None, :]                               # snapped scale
    q = np.clip(np.round(k / real[..., :, None, :]), -7, 7) \
        .astype(np.int8).reshape(kernel.shape)
    half = inn // 2
    lo = q[..., :half, :].astype(np.uint8) & 0x0F
    hi = (q[..., half:, :].astype(np.uint8) & 0x0F) << 4
    return ((lo | hi).view(np.int8), m.astype(np.int8),
            s.astype(np.float32))


def _w4a8_group(in_features: int, group: int) -> int:
    """w4a8 group size: like _w4_group, but the group COUNT must be even
    (the half-split packing needs whole groups per half) — an odd count
    halves the group size (inn even => g even, so this always lands)."""
    g = _w4_group(in_features, group)
    if (in_features // g) % 2:
        g //= 2
    return g


def _w4a8_codes(pkernel):
    """half-split packed (..., in//2, out) -> (lo, hi) int8 codes for
    in-rows [0, in/2) and [in/2, in): two sign-extending shifts, no
    reshape/interleave."""
    lo = jnp.right_shift(jnp.left_shift(pkernel, 4), 4)
    hi = jnp.right_shift(pkernel, 4)
    return lo, hi


def _w4a8_scaled(codes, ms):
    """codes (..., rows, out) * per-group multipliers ms (..., Gp, out)
    -> int8 (|.| <= 105). The (Gp, g, out) view is a contiguous split of
    the rows axis, so both reshapes are layout-free and the whole thing
    stays an elementwise producer the dot fusion can absorb."""
    rows, out = codes.shape[-2], codes.shape[-1]
    gp = ms.shape[-2]
    c = codes.reshape(*codes.shape[:-2], gp, rows // gp, out)
    c = c * ms[..., :, None, :]
    return c.reshape(*codes.shape[:-2], rows, out)


def _w4a8_weight_int8(pkernel, mscale):
    """packed (in//2, out) + m (G, out) -> int8 codes (in, out), |.|<=105
    (materialized form — tests/backward/dequant; the forward never builds
    it)."""
    lo, hi = _w4a8_codes(pkernel)
    gh = mscale.shape[-2] // 2
    return jnp.concatenate(
        [_w4a8_scaled(lo, mscale[..., :gh, :]),
         _w4a8_scaled(hi, mscale[..., gh:, :])], axis=-2)


def _w4a8_acc(xq, pkernel, mscale, row0: int = 0):
    """int32 accumulator for kernel input rows [row0, row0 + f) where f =
    xq's lane count: up to two half-dots against elementwise-
    reconstructed codes (each half's xq slice and packed-row slice are
    contiguous — nothing to relayout; the shifts and group multiply fuse
    into the dot's operand read). row0 > 0 serves the chunked
    fused-glue path, whose chunks are row ranges of ONE kernel."""
    half = pkernel.shape[-2]
    inn = 2 * half
    groups = mscale.shape[-2]
    g = inn // groups
    gh = groups // 2
    a, b = row0, row0 + xq.shape[-1]
    dims = (((xq.ndim - 1,), (0,)), ((), ()))

    def rows(arr, lo_, hi_):
        return jax.lax.slice_in_dim(arr, lo_, hi_, axis=arr.ndim - 2)

    acc = None
    lo_end = min(b, half)
    if a < lo_end:
        lo = jnp.right_shift(jnp.left_shift(rows(pkernel, a, lo_end), 4),
                             4)
        part = jax.lax.dot_general(
            jax.lax.slice_in_dim(xq, 0, lo_end - a, axis=xq.ndim - 1),
            _w4a8_scaled(lo, mscale[..., a // g:lo_end // g, :]), dims,
            preferred_element_type=jnp.int32)
        acc = part
    if b > half:
        hi_start = max(a, half)
        hi = jnp.right_shift(rows(pkernel, hi_start - half, b - half), 4)
        part = jax.lax.dot_general(
            jax.lax.slice_in_dim(xq, hi_start - a, b - a,
                                 axis=xq.ndim - 1),
            _w4a8_scaled(hi, mscale[..., gh + (hi_start - half) // g:
                                    gh + (b - half) // g, :]), dims,
            preferred_element_type=jnp.int32)
        acc = part if acc is None else acc + part
    return acc


@jax.custom_vjp
def w4a8_matmul(x, pkernel, mscale, scale):
    """int4-stored weights at the int8 MXU rate: reconstruct int8 codes
    (code4 * m, |.| <= 105) on the VPU inside the dot fusions,
    per-token-quantize the activation, two half int8 dots, rescale by
    (a_scale x per-out scale). Accumulation bound: 105 * 127 * in/2 per
    dot. Same straight-through backward as w8a8 (frozen weights, dx
    against the dequantized kernel)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    acc = _w4a8_acc(xq, pkernel, mscale)
    return (acc.astype(jnp.float32) * a_scale
            * scale.astype(jnp.float32)).astype(x.dtype)


def w4a8_matmul_prequant(xq, a_scale, pkernel, mscale, scale,
                         row0: int = 0, out_dtype=None):
    """w4a8 over an ALREADY-quantized activation (fused-glue output),
    mirroring w8a8_matmul_prequant. row0: the kernel input row the
    activation's first lane corresponds to (chunked call sites pass the
    running offset; pkernel/mscale stay whole). Inference-only."""
    acc = _w4a8_acc(xq, pkernel, mscale, row0)
    out = acc.astype(jnp.float32) * a_scale * scale.astype(jnp.float32)
    return out.astype(out_dtype) if out_dtype is not None else out


def _w4a8_fwd(x, pkernel, mscale, scale):
    return (w4a8_matmul(x, pkernel, mscale, scale),
            (jnp.zeros((0,), x.dtype), pkernel, mscale, scale))


def _w4a8_bwd(res, dy):
    x_sentinel, pkernel, mscale, scale = res
    x_dtype = x_sentinel.dtype
    pk = jax.lax.optimization_barrier(pkernel)
    w = (_w4a8_weight_int8(pk, mscale).astype(x_dtype)
         * scale.astype(x_dtype))                            # (in, out)
    dx = jax.lax.dot_general(
        dy.astype(x_dtype), w, (((dy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x_dtype)
    return (dx, np.zeros(pkernel.shape, jax.dtypes.float0),
            np.zeros(mscale.shape, jax.dtypes.float0),
            jnp.zeros_like(scale))


w4a8_matmul.defvjp(_w4a8_fwd, _w4a8_bwd)


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
      "w4"   — nibble-packed int4 weights with per-(group, channel) scales;
               bf16 MXU compute. Param layout: pkernel int8 (in//2, out),
               scale f32 (ceil(in/group), out). Capacity mode: half the
               weight bytes of w8.
      "w4a8" — int4 storage, int8 MXU compute: per-(group, out) scales
               factor into int multipliers m (1..15) times a per-out f32
               base; the int8 operand (code4 * m, |.| <= 105) is
               reconstructed on the VPU. Param layout: pkernel int8
               (in//2, out), mscale int8 (G, out), scale f32 (out,).
               Capacity of w4, throughput of w8a8.
    """
    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    mode: str = "w8"
    group: int = 128                 # w4 input-group size for scales

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
        if self.mode == "w4a8":
            if in_features % 2:
                raise ValueError("w4a8 needs an even input dim")
            g = _w4a8_group(in_features, self.group)
            pkernel = self.param(
                "pkernel", nn.initializers.zeros,
                (in_features // 2, self.features), jnp.int8)
            mscale = self.param(
                "mscale", nn.initializers.ones,
                (in_features // g, self.features), jnp.int8)
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            if prequant:
                # chunked fused-glue input: each chunk is a row range of
                # THIS kernel; _w4a8_acc resolves it to contiguous
                # packed-row slices of the half-split layout (chunk
                # boundaries are group-aligned at every DiT call site:
                # 3072-multiples vs group 128)
                y, off = None, 0
                for xq, a_scale in chunks:
                    f = xq.shape[-1]
                    if off % g or f % g:
                        raise ValueError("w4a8 chunk not group-aligned")
                    part = w4a8_matmul_prequant(xq, a_scale, pkernel,
                                                mscale, scale, row0=off,
                                                out_dtype=self.dtype)
                    y = part if y is None else y + part
                    off += f
            else:
                y = w4a8_matmul(x.astype(self.dtype), pkernel, mscale,
                                scale)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), self.param_dtype)
                y = y + bias.astype(self.dtype)
            return y
        if self.mode == "w4":
            if prequant:
                raise ValueError("pre-quantized input requires mode w8a8")
            if in_features % 2:
                raise ValueError("w4 needs an even input dim")
            g = _w4_group(in_features, self.group)
            pkernel = self.param(
                "pkernel", nn.initializers.zeros,
                (in_features // 2, self.features), jnp.int8)
            gscale = self.param(
                "scale", nn.initializers.ones,
                (in_features // g, self.features), jnp.float32)
            # AWQ-style per-input-channel equalization (ones = identity):
            # quantize_kernel_w4_awq folds s into the kernel and stores
            # 1/s here, so salient channels keep 4-bit precision
            pre_scale = self.param("pre_scale", nn.initializers.ones,
                                   (in_features,), jnp.float32)
            y = w4_matmul((x * pre_scale.astype(x.dtype))
                          .astype(self.dtype), pkernel, gscale)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,), self.param_dtype)
                y = y + bias.astype(self.dtype)
            return y
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
    quantized: False | True ("w8") | "w8" | "w8a8" | "w4"."""
    if quantized:
        mode = quantized if isinstance(quantized, str) else "w8"
        return lambda features, name, use_bias=True: QuantDense(
            features, use_bias=use_bias, dtype=dtype,
            param_dtype=param_dtype, mode=mode, name=name)
    return lambda features, name, use_bias=True: nn.Dense(
        features, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype,
        name=name)


def pack_int4(q: np.ndarray) -> np.ndarray:
    """int8 codes in [-8, 7], (..., in, out) -> nibble-packed int8
    (..., in//2, out). Row 2i -> low nibble, row 2i+1 -> high nibble."""
    lo = q[..., 0::2, :].astype(np.uint8) & 0x0F
    hi = (q[..., 1::2, :].astype(np.uint8) & 0x0F) << 4
    return (lo | hi).view(np.int8)


def quantize_kernel_w4(kernel: np.ndarray, group: int = 128):
    """Symmetric int4 with per-(input-group, out-channel) scales.
    kernel (..., in, out) -> (pkernel int8 (..., in//2, out),
    scale f32 (..., in//g, out)). Codes clip to [-7, 7] (symmetric)."""
    k = np.asarray(kernel, np.float32)
    inn, out = k.shape[-2], k.shape[-1]
    if inn % 2:
        raise ValueError("w4 needs an even input dim")
    g = _w4_group(inn, group)
    kg = k.reshape(*k.shape[:-2], inn // g, g, out)
    amax = np.max(np.abs(kg), axis=-2, keepdims=True)     # (..., G, 1, out)
    scale = np.maximum(amax / 7.0, 1e-12)
    q = np.clip(np.round(kg / scale), -7, 7).astype(np.int8)
    q = q.reshape(*k.shape[:-2], inn, out)
    return pack_int4(q), np.squeeze(scale, axis=-2).astype(np.float32)


def quantize_kernel_w4_awq(kernel: np.ndarray, act_amax: np.ndarray,
                           group: int = 128, n_grid: int = 20,
                           cal_x: "np.ndarray | None" = None,
                           rng: "np.random.Generator | None" = None):
    """Activation-aware int4 quantization (AWQ, arXiv:2306.00978 §3).

    4-bit round-to-nearest hurts most on the weight rows multiplied by
    LARGE activations (the error there dominates the output error). AWQ
    scales input channel i by s_i = (act_amax_i / mean)^alpha before
    quantizing — salient rows get finer codes — and the inverse scale is
    applied to the activations at run time (QuantDense's w4 `pre_scale`).
    alpha is grid-searched against the true output error on calibration
    activations.

    kernel (in, out) [2D only — search per layer for stacked params];
    act_amax (in,) per-input-channel abs-max from calibration.
    Returns (pkernel, scale, pre_scale) where pre_scale = 1/s (f32 (in,)).
    """
    k = np.asarray(kernel, np.float32)
    if k.ndim != 2:
        raise ValueError("awq search is per-kernel; loop stacked layers")
    inn = k.shape[0]
    amax = np.maximum(np.asarray(act_amax, np.float64).reshape(inn), 1e-8)
    if cal_x is None:
        # laplace calibration activations with the observed per-channel
        # spread (matches tools/quant_quality.py's realistic-stats model)
        rng = rng or np.random.default_rng(0)
        cal_x = (rng.laplace(size=(256, inn)) * (amax / 4.0)).astype(
            np.float32)
    ref = cal_x.astype(np.float32) @ k

    best = (np.inf, None)
    ratio = amax / amax.mean()
    for alpha in np.linspace(0.0, 1.0, n_grid):
        s = np.clip(ratio ** alpha, 1e-4, 1e4).astype(np.float32)
        pk, sc = quantize_kernel_w4(k * s[:, None], group)
        deq = np.asarray(_dequant_w4(jnp.asarray(pk), jnp.asarray(sc),
                                     jnp.float32))
        out = (cal_x / s) @ deq
        err = float(np.mean((out - ref) ** 2))
        if err < best[0]:
            best = (err, (pk, sc, (1.0 / s).astype(np.float32)))
    return best[1]


def dequantize_tree(params) -> Dict:
    """Inverse plumbing of quantize_tree: rewrite qkernel/pkernel+scale
    leaves back to f32 'kernel' leaves (exact — the rounding loss happened
    at quantize time). Lets tests and converters run the fp model on the
    weights a quantized model actually uses."""
    if isinstance(params, dict):
        if "qkernel" in params and "scale" in params:
            q = np.asarray(params["qkernel"], np.float32)
            kernel = q * np.asarray(params["scale"], np.float32)[..., None, :]
            new = {"kernel": kernel}
        elif "pkernel" in params and "mscale" in params:
            w8 = np.asarray(_w4a8_weight_int8(
                jnp.asarray(params["pkernel"]),
                jnp.asarray(params["mscale"])), np.float32)
            kernel = w8 * np.asarray(params["scale"],
                                     np.float32)[..., None, :]
            new = {"kernel": kernel}
        elif "pkernel" in params and "scale" in params:
            kernel = np.asarray(_dequant_w4(
                jnp.asarray(params["pkernel"]),
                jnp.asarray(params["scale"]), jnp.float32))
            if "pre_scale" in params:
                # effective weight = diag(pre_scale) @ dequant(W*s)
                kernel = kernel * np.asarray(
                    params["pre_scale"], np.float32)[..., :, None]
            new = {"kernel": kernel}
        else:
            return {k: dequantize_tree(v) for k, v in params.items()}
        for extra, ev in params.items():
            if extra not in ("qkernel", "pkernel", "scale", "pre_scale",
                             "mscale"):
                new[extra] = ev
        return new
    return params


def quantize_kernel(kernel: np.ndarray):
    """Symmetric per-output-channel int8. kernel (..., in, out) ->
    (qkernel int8, scale f32 (..., out)). For stacked scan params (L, in,
    out), scales are per (layer, channel)."""
    k = np.asarray(kernel, np.float32)
    amax = np.max(np.abs(k), axis=-2, keepdims=True)          # (..., 1, out)
    scale = np.maximum(amax / 127.0, 1e-12)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale, axis=-2)


def quantize_tree(params, mode: str = "w8", group: int = 128) -> Dict:
    """Rewrite a flax params tree: every 2D/3D 'kernel' becomes
    qkernel+scale (int8 modes) or pkernel+scale (w4) in QuantDense layout.
    Conv kernels (4D+) and other leaves pass through."""
    if isinstance(params, dict):
        out = {}
        for name, val in params.items():
            if (isinstance(val, dict) and "kernel" in val
                    and not isinstance(val["kernel"], dict)
                    and getattr(val["kernel"], "ndim", 0) in (2, 3)):
                k = np.asarray(val["kernel"])
                if mode == "w4a8":
                    q, m, s = quantize_kernel_w4a8(k, group)
                    new = {"pkernel": q, "mscale": m, "scale": s}
                elif mode == "w4":
                    q, s = quantize_kernel_w4(k, group)
                    # (in,) for 2D kernels, (L, in) for scan-stacked
                    new = {"pkernel": q, "scale": s,
                           "pre_scale": np.ones(k.shape[:-1], np.float32)}
                else:
                    q, s = quantize_kernel(k)
                    new = {"qkernel": q, "scale": s.astype(np.float32)}
                for extra, ev in val.items():
                    if extra != "kernel":
                        new[extra] = ev
                out[name] = new
            else:
                out[name] = quantize_tree(val, mode, group)
        return out
    return params
