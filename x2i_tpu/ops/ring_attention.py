"""Ring attention over an ICI mesh axis (SURVEY.md §5.7 stretch).

Resolutions beyond 1024² push the joint sequence past what one chip
comfortably holds for full-KV attention (2048² → 16 896 joint tokens).
The GSPMD `shard_sequence` path keeps the residual stream sharded but
XLA all-gathers K and V for every attention — peak O(S) per chip. Ring
attention never materializes the full K/V anywhere: each device holds a
1/n sequence shard of q/k/v, computes flash attention of its local q
against one rotating KV shard at a time, and merges the partial outputs
in log-space using the kernel's per-row logsumexp while `ppermute`
rotates the KV shards one hop around the ring — comm overlaps compute,
per-chip attention memory is O(S/n). Blockwise/ring formulation: Liu et
al. 2023 (PAPERS.md §ring).

Differentiable: the backward runs the ring in reverse — dq accumulates
on the q owner while (k, v, dk, dv) travel the full circle, each visit
adding the pair-wise flash-backward contribution computed against the
forward's global logsumexp (the same math as ops/flash_attention.py's
fused backward, which is reused per pair on TPU). n hops total, so
dk/dv arrive back at their owners.

The reference has no analogue (its joint attention is single-GPU SDPA,
capped at 1024²; SURVEY §5.7 "no ring attention, no context parallel")
— a beyond-parity capability for multi-chip high-resolution serving and
context-parallel training.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from x2i_tpu.ops import flash_attention as fa


def _attend_xla_lse(q, k, v, scale):
    """(B, H, Sq, D) x (B, H, Skv, D) → (o, lse2): exact softmax attention
    plus the base-2 per-row logsumexp, matching the Pallas kernel's lse
    convention (fa._flash_kernel: s in log2 units, lse2 = m + log2 l)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (scale * fa.LOG2_E)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p / l, v.astype(jnp.float32))
    return o.astype(q.dtype), (m + jnp.log2(l))[..., 0]


def _use_pallas(q_shape, skv, implementation):
    return (implementation != "xla"
            and jax.default_backend() not in ("cpu",)
            and fa.supported(q_shape, skv))


def _attend_lse(q, k, v, scale, implementation):
    """One ring block: flash kernel when the platform/shapes allow."""
    if _use_pallas(q.shape, k.shape[2], implementation):
        return fa._fwd_impl(q, k, v, None, None, False, scale,
                            return_lse=True)
    return _attend_xla_lse(q, k, v, scale)


def _pair_bwd(q, k, v, o, lse, do, scale, implementation):
    """(dq, dk, dv) contribution of one (q-shard, kv-shard) pair, given
    the GLOBAL per-row logsumexp from the forward ring — identical math
    to the fused flash backward, which is reused on TPU."""
    if _use_pallas(q.shape, k.shape[2], implementation):
        return fa._flash_backward(q, k, v, None, o, lse, do,
                                  causal=False, scale=scale)
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    dof, of = do.astype(jnp.float32), o.astype(jnp.float32)
    s2 = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * (scale * fa.LOG2_E)
    p = jnp.exp2(s2 - lse[..., None])                 # global-normalized
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
    dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vf)
    delta = jnp.sum(dof * of, axis=-1, keepdims=True)  # (B, H, Sq, 1)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _merge(o, lse, o2, lse2):
    """Online log-space merge of two normalized partials (o_i, lse_i):
    softmax(cat(s1, s2)) @ cat(v1, v2) == w1*o1 + w2*o2 with
    w_i = exp2(lse_i - lse_tot). The accumulator stays f32 across hops
    (one cast at the end of the ring, not one per hop)."""
    m = jnp.maximum(lse, lse2)
    w1 = jnp.exp2(lse - m)
    w2 = jnp.exp2(lse2 - m)
    denom = w1 + w2
    of = (o.astype(jnp.float32) * (w1 / denom)[..., None]
          + o2.astype(jnp.float32) * (w2 / denom)[..., None])
    return of, m + jnp.log2(denom)


def _ring_perm(axis_size):
    return [(i, (i + 1) % axis_size) for i in range(axis_size)]


def _ring_fwd_core(q, k, v, axis_name, axis_size, scale, implementation):
    o, lse = _attend_lse(q, k, v, scale, implementation)
    if axis_size == 1:
        return o, lse
    perm = _ring_perm(axis_size)
    kv = (k, v)
    o = o.astype(jnp.float32)
    for _ in range(axis_size - 1):
        kv = jax.lax.ppermute(kv, axis_name, perm)
        o2, lse2 = _attend_lse(q, kv[0], kv[1], scale, implementation)
        o, lse = _merge(o, lse, o2, lse2)
    return o.astype(q.dtype), lse


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ring(q, k, v, axis_name, axis_size, scale, implementation):
    return _ring_fwd_core(q, k, v, axis_name, axis_size, scale,
                          implementation)[0]


def _ring_fwd(q, k, v, axis_name, axis_size, scale, implementation):
    o, lse = _ring_fwd_core(q, k, v, axis_name, axis_size, scale,
                            implementation)
    return o, (q, k, v, o, lse)


def _ring_bwd(axis_name, axis_size, scale, implementation, res, do):
    q, k, v, o, lse = res
    perm = _ring_perm(axis_size)
    dq = jnp.zeros(q.shape, jnp.float32)
    # (k, v, dk, dv) make the FULL circle (n hops): at step t the device
    # holds the kv shard owned by (self - t) and adds its contribution;
    # after n hops dk/dv are home at their owners.
    state = (k, v, jnp.zeros(k.shape, jnp.float32),
             jnp.zeros(v.shape, jnp.float32))
    for _ in range(axis_size):
        kc, vc, dkc, dvc = state
        dq_c, dk_c, dv_c = _pair_bwd(q, kc, vc, o, lse, do, scale,
                                     implementation)
        dq = dq + dq_c.astype(jnp.float32)
        state = (kc, vc, dkc + dk_c.astype(jnp.float32),
                 dvc + dv_c.astype(jnp.float32))
        if axis_size > 1:
            state = jax.lax.ppermute(state, axis_name, perm)
    _, _, dk, dv = state
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_ring.defvjp(_ring_fwd, _ring_bwd)


def ring_attention_local(q, k, v, axis_name: str, axis_size: int,
                         scale: Optional[float] = None,
                         implementation: str = "auto"):
    """Per-device body — call INSIDE jax.shard_map.

    Args:
      q, k, v: local shards (B, H, S/n, D), sequence-sharded over
        `axis_name` (n = axis_size devices). RoPE must already be
        applied (each device ropes its own position slice).
      axis_name: mesh axis the sequence is sharded over.
      axis_size: static ring size n (mesh.shape[axis_name]).

    Returns:
      (B, H, S/n, D) local attention output — exact (not approximate):
      identical to full softmax attention over the global sequence.
      Differentiable (reverse-ring backward).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _ring(q, k, v, axis_name, axis_size, float(scale),
                 implementation)


def ring_attention(q, k, v, axis_name: str, axis_size: int,
                   scale: Optional[float] = None,
                   implementation: str = "auto",
                   batch_axes=None):
    """Global-array entry: (B, S, H, D) inputs under an ambient mesh
    (jax.set_mesh), sequence axis sharded over `axis_name`. Wraps
    ring_attention_local in jax.shard_map.

    batch_axes: mesh axis (or tuple) the batch dim is sharded over —
    pass the data-parallel axes so each data row only computes its own
    batch shard (None replicates the batch across non-ring axes).

    S must divide evenly by axis_size (FLUX joint lengths are multiples
    of 128; pad upstream via ops.attention's pad-and-mask if not).
    """
    from jax.sharding import PartitionSpec as P

    if q.shape[1] % axis_size:
        raise ValueError(
            f"ring_attention: seq {q.shape[1]} not divisible by ring size "
            f"{axis_size}")
    spec = P(batch_axes, axis_name, None, None)

    def body(ql, kl, vl):
        qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (ql, kl, vl))
        out = ring_attention_local(qt, kt, vt, axis_name, axis_size,
                                   scale=scale,
                                   implementation=implementation)
        return jnp.swapaxes(out, 1, 2)

    return jax.shard_map(body, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)
