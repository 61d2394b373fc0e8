"""Ring attention over an ICI mesh axis (SURVEY.md §5.7 stretch).

Resolutions beyond 1024² push the joint sequence past what one chip
comfortably holds for full-KV attention (2048² → 16 896 joint tokens).
The GSPMD `shard_sequence` path keeps the residual stream sharded but
XLA all-gathers K and V for every attention — peak O(S) per chip. Ring
attention never materializes the full K/V anywhere: each device holds a
1/n sequence shard of q/k/v, computes flash attention of its local q
against one KV shard at a time, and merges the partial outputs in
log-space using the kernel's per-row logsumexp while `ppermute` rotates
the KV shards one hop around the ring. Per-chip attention memory is
O(S/n) and the ICI transfer of the next shard overlaps the current
block's compute (XLA schedules the async collective-permute under the
kernel). Blockwise/ring formulation: Liu et al. 2023 (PAPERS.md §ring).

The reference has no analogue (its joint attention is single-GPU SDPA,
capped at 1024²; SURVEY §5.7 "no ring attention, no context parallel")
— this is a beyond-parity capability for multi-chip high-resolution
serving.

Forward-path op: the merge weights depend on the per-block lse, so a
fused backward needs the reverse ring (dq/dk/dv accumulation around the
ring); training at >1024² is outside the reference's operating envelope
(train_minicpm.py:553-555 trains at the 128² latent grid), so autodiff
through the Pallas path is intentionally not wired — use the GSPMD
`shard_sequence` path for sharded training.
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


def _attend_lse(q, k, v, scale, implementation):
    """One ring block: flash kernel when the platform/shapes allow."""
    sq, d = q.shape[2], q.shape[3]
    skv = k.shape[2]
    use_pallas = (implementation != "xla"
                  and jax.default_backend() not in ("cpu",)
                  and fa.supported(q.shape, skv))
    if use_pallas:
        return fa._fwd_impl(q, k, v, None, None, False, scale,
                            return_lse=True)
    return _attend_xla_lse(q, k, v, scale)


def _merge(o, lse, o2, lse2):
    """Online log-space merge of two normalized partials (o_i, lse_i):
    softmax(cat(s1, s2)) @ cat(v1, v2) == w1*o1 + w2*o2 with
    w_i = exp2(lse_i - lse_tot). f32 throughout; o returned in o.dtype."""
    m = jnp.maximum(lse, lse2)
    w1 = jnp.exp2(lse - m)
    w2 = jnp.exp2(lse2 - m)
    denom = w1 + w2
    of = (o.astype(jnp.float32) * (w1 / denom)[..., None]
          + o2.astype(jnp.float32) * (w2 / denom)[..., None])
    return of.astype(o.dtype), m + jnp.log2(denom)


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
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    o, lse = _attend_lse(q, k, v, scale, implementation)
    if axis_size == 1:
        return o
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    kv = (k, v)
    for _ in range(axis_size - 1):
        kv = jax.lax.ppermute(kv, axis_name, perm)
        o2, lse2 = _attend_lse(q, kv[0], kv[1], scale, implementation)
        o, lse = _merge(o, lse, o2, lse2)
    return o


def ring_attention(q, k, v, axis_name: str, axis_size: int,
                   scale: Optional[float] = None,
                   implementation: str = "auto"):
    """Global-array entry: (B, S, H, D) inputs under an ambient mesh
    (jax.set_mesh), sequence axis sharded over `axis_name`. Wraps
    ring_attention_local in jax.shard_map; batch/head/channel axes are
    replicated across the ring axis.

    S must divide evenly by axis_size (FLUX joint lengths are multiples
    of 128; pad upstream via ops.attention's pad-and-mask if not).
    """
    from jax.sharding import PartitionSpec as P

    if q.shape[1] % axis_size:
        raise ValueError(
            f"ring_attention: seq {q.shape[1]} not divisible by ring size "
            f"{axis_size}")
    spec = P(None, axis_name, None, None)

    def body(ql, kl, vl):
        qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (ql, kl, vl))
        out = ring_attention_local(qt, kt, vt, axis_name, axis_size,
                                   scale=scale,
                                   implementation=implementation)
        return jnp.swapaxes(out, 1, 2)

    return jax.shard_map(body, in_specs=(spec, spec, spec),
                         out_specs=spec)(q, k, v)
