"""Pallas TPU flash-attention kernel.

This is the "native layer" of the rebuild: the reference leans on PyTorch
SDPA / flash-attention CUDA kernels for every attention site (SURVEY.md §2.6;
e.g. diffusers FluxAttnProcessor2_0 used at
/root/reference/lightcontrol/lightcontrol_flux.py:68,130). Here the hot
attention — FLUX joint attention over 4608 tokens, MLLM LM prefill, ViT
towers — runs through one Pallas kernel.

Design: grid over (batch, q-head, q-block). Each program holds one q tile in
VMEM plus the full K/V rows for its (b, kv-head): at the X2I operating points
(S ≤ 4608, D = 128) K+V+scores ≈ 4.6 MB, comfortably inside the ~16 MB VMEM
budget, so no online-softmax streaming pass is needed — one MXU matmul per
side with an exact softmax in f32. GQA is expressed in the BlockSpec index
map (q head h reads kv head h // group), so no repeated K/V ever touches HBM.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Full-KV-in-VMEM design limit (bytes for K+V+score rows, see module doc).
MAX_KV_SEQ = 8192


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                  causal: bool, block_q: int):
    """One (batch, q-head, q-block) program; full KV rows resident."""
    # Keep matmul inputs in their storage dtype (bf16 on the inference path)
    # so the MXU runs at full rate; accumulate in f32.
    q = q_ref[0, 0]                                      # (BQ, D)
    k = k_ref[0, 0]                                      # (Skv, D)
    v = v_ref[0, 0]                                      # (Skv, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (BQ, Skv) f32

    if mask_ref is not None:
        valid = mask_ref[:]                              # (1, Skv) bool
        s = jnp.where(valid, s, NEG_INF)
    if causal:
        qi = pl.program_id(2)
        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols <= rows, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v,
                preferred_element_type=jnp.float32) / l
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _flash_forward(q, k, v, kv_mask, *, causal: bool, scale: float,
                   block_q: int = 256):
    """q: (B, Hq, Sq, D); k, v: (B, Hk, Skv, D); kv_mask: (B, Skv) bool|None."""
    batch, hq, sq, d = q.shape
    hk, skv = k.shape[1], k.shape[2]
    group = hq // hk
    block_q = min(block_q, sq)
    grid = (batch, hq, pl.cdiv(sq, block_q))

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skv, d), lambda b, h, i: (b, h // group, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skv, d), lambda b, h, i: (b, h // group, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q.reshape(batch, hq, sq, d), k, v]
    if kv_mask is not None:
        in_specs.append(
            pl.BlockSpec((1, skv), lambda b, h, i: (b, 0),
                         memory_space=pltpu.VMEM))
        args.append(kv_mask)
        kernel = functools.partial(_flash_kernel, scale=scale, causal=causal,
                                   block_q=block_q)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, orf, **kw: _flash_kernel(
                qr, kr, vr, None, orf, **kw),
            scale=scale, causal=causal, block_q=block_q)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, hq, sq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * hq * sq * skv * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * hq * sq * skv,
        ),
    )(*args)
    return out


def _xla_attention(q, k, v, kv_mask, *, causal: bool, scale: float,
                   bias=None):
    """Reference/fallback path in plain XLA ops (also the VJP recompute).

    bias: optional additive logits bias broadcastable to (B, H, Sq, Skv)
    (T5 relative position bias)."""
    batch, hq, sq, d = q.shape
    hk, skv = k.shape[1], k.shape[2]
    group = hq // hk
    qf = q.astype(jnp.float32).reshape(batch, hk, group * sq, d)
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32)) * scale
    s = s.reshape(batch, hq, sq, skv)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    if causal:
        rows = jnp.arange(sq)[:, None]
        cols = jnp.arange(skv)[None, :]
        s = jnp.where(cols <= rows, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    p = p.reshape(batch, hk, group * sq, skv)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return o.reshape(batch, hq, sq, d).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, kv_mask, causal, scale):
    return _flash_forward(q, k, v, kv_mask, causal=causal, scale=scale)


def _flash_fwd(q, k, v, kv_mask, causal, scale):
    o = _flash_forward(q, k, v, kv_mask, causal=causal, scale=scale)
    return o, (q, k, v, kv_mask)


def _flash_bwd(causal, scale, res, do):
    # Exact recompute backward in XLA. The forward runs the Pallas kernel;
    # the backward re-materializes P blockwise via XLA fusion. A fused Pallas
    # backward kernel can replace this without touching callers.
    q, k, v, kv_mask = res
    batch, hq, sq, d = q.shape
    hk, skv = k.shape[1], k.shape[2]
    group = hq // hk
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    dof = do.astype(jnp.float32)

    s = jnp.einsum("bhqd,bhkd->bhqk",
                   qf.reshape(batch, hk, group * sq, d), kf) * scale
    s = s.reshape(batch, hq, sq, skv)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    if causal:
        rows = jnp.arange(sq)[:, None]
        cols = jnp.arange(skv)[None, :]
        s = jnp.where(cols <= rows, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)                       # (B,Hq,Sq,Skv)

    dp = jnp.einsum("bhqd,bhkd->bhqk",
                    dof.reshape(batch, hk, group * sq, d),
                    vf).reshape(batch, hq, sq, skv)
    o = jnp.einsum("bhqk,bhkd->bhqd",
                   p.reshape(batch, hk, group * sq, skv),
                   vf).reshape(batch, hq, sq, d)
    delta = jnp.sum(dof * o, axis=-1, keepdims=True)     # (B,Hq,Sq,1)
    ds = p * (dp - delta) * scale                        # (B,Hq,Sq,Skv)

    dq = jnp.einsum("bhqk,bhkd->bhqd",
                    ds.reshape(batch, hk, group * sq, skv),
                    kf).reshape(batch, hq, sq, d)
    ds_g = ds.reshape(batch, hk, group, sq, skv)
    q_g = qf.reshape(batch, hk, group, sq, d)
    dk = jnp.einsum("bhgqk,bhgqd->bhkd", ds_g, q_g)
    p_g = p.reshape(batch, hk, group, sq, skv)
    do_g = dof.reshape(batch, hk, group, sq, d)
    dv = jnp.einsum("bhgqk,bhgqd->bhkd", p_g, do_g)

    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    kv_mask: Optional[jnp.ndarray] = None,
                    causal: bool = False,
                    scale: Optional[float] = None) -> jnp.ndarray:
    """Flash attention over (B, H, S, D) tensors. Differentiable."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash(q, k, v, kv_mask, causal, scale)


def supported(q_shape, kv_seq: int) -> bool:
    """Whether the full-KV Pallas kernel applies to these shapes."""
    _, _, sq, d = q_shape
    return (kv_seq <= MAX_KV_SEQ and d in (64, 128, 256)
            and kv_seq % 128 == 0 and sq % 128 == 0)


def xla_attention(q, k, v, kv_mask=None, causal=False, scale=None,
                  bias=None):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _xla_attention(q, k, v, kv_mask, causal=causal, scale=scale,
                          bias=bias)
