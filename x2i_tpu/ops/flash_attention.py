"""Pallas TPU flash-attention kernels (forward + fused backward).

This is the "native layer" of the rebuild: the reference leans on PyTorch
SDPA / flash-attention CUDA kernels for every attention site (SURVEY.md
§2.6; e.g. diffusers FluxAttnProcessor2_0 used at
/root/reference/lightcontrol/lightcontrol_flux.py:68,130). Here the hot
attention — FLUX joint attention over 4608 tokens, MLLM LM prefill, ViT
towers — runs through these kernels.

Design: grid over (batch, head, block). Each program holds one q (or kv)
tile in VMEM plus the full opposing rows for its (b, kv-head): at the X2I
operating points (S ≤ 4608, D = 128) K+V+scores ≈ 4.6 MB, comfortably
inside the ~16 MB VMEM budget, so no online-softmax streaming pass is
needed — exact softmax in f32, matmul inputs kept in storage dtype for full
MXU rate. GQA is expressed in BlockSpec index maps (q head h reads kv head
h // group), so no repeated K/V ever touches HBM.

Backward: the forward also emits the per-row logsumexp; two kernels then
compute dq (grid over q-blocks) and dk/dv (grid over kv-blocks, summing the
GQA group in-kernel) without materializing the (Sq, Skv) probabilities in
HBM. The plain-XLA implementations remain as the CPU/odd-shape fallback.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Full-KV-in-VMEM design limit (bytes for K+V+score rows, see module doc).
MAX_KV_SEQ = 8192
# exp2 trick: the VPU computes exp(x) as exp2(x * log2 e); folding log2 e
# into the softmax scale removes a full (BQ, Skv) multiply per exponential.
# All in-kernel logsumexp values are therefore in BASE-2 units ("lse2").
LOG2_E = math.log2(math.e)


def _logits(q, k, scale):
    return jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale


def _apply_masks(s, mask, causal, row_offset, col_offset):
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    if causal:
        rows = row_offset + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = col_offset + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols <= rows, s, NEG_INF)
    return s


def _rope_signed_sin(sin: jnp.ndarray) -> jnp.ndarray:
    """Fold the rotate-half sign pattern into the sin table so the kernel's
    rotation is one lane-roll + two multiplies: with sin' = cat(-s, s),
    rope(x) = x * cos + roll(x, D/2) * sin'  (roll by half is self-inverse,
    so the roll direction does not matter)."""
    d2 = sin.shape[-1] // 2
    return jnp.concatenate([-sin[..., :d2], sin[..., d2:]], axis=-1)


def _rope_bhsd(x: jnp.ndarray, cos: jnp.ndarray,
               sin_signed: jnp.ndarray) -> jnp.ndarray:
    """Half-layout rope on (B, H, S, D) with (S, D) tables (sign folded).
    XLA-side mirror of the in-kernel rotation, used by the chunked/backward
    fallbacks. Its transpose (for cotangents) is x*cos + roll(x*sin')."""
    d2 = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    out = xf * cos + jnp.roll(xf, d2, axis=-1) * sin_signed
    return out.astype(x.dtype)


def _rope_bhsd_T(x: jnp.ndarray, cos: jnp.ndarray,
                 sin_signed: jnp.ndarray) -> jnp.ndarray:
    """Transpose (= inverse, the map is orthogonal) of _rope_bhsd."""
    d2 = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    out = xf * cos + jnp.roll(xf * sin_signed, d2, axis=-1)
    return out.astype(x.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, cos_ref, sin_ref, qw_ref, kw_ref,
                  mask_ref, o_ref, lse_ref, krot_ref, *,
                  scale: float, causal: bool, block_q: int,
                  qk_norm_eps: float = 1e-6, pipeline_kc: int = 0):
    """One (batch, q-head, q-block) program; full KV rows resident.

    When cos/sin refs are given (FLUX joint attention), the half-layout
    rotary embedding is applied in-kernel: K is rotated once per (b, h)
    into a VMEM scratch (the TPU grid is sequential, scratch persists
    across the q-block axis), the q tile per program. This keeps the
    pre-rope projections as the only HBM form of q/k — the XLA-side rope
    pass and its extra read+write of both tensors disappear. The softmax
    scale (and the exp2 log2 e factor) is folded into the q tile here,
    saving a full (BQ, Skv) f32 multiply per program."""
    i = pl.program_id(2)
    if cos_ref is not None:
        d2 = q_ref.shape[-1] // 2

        skv = k_ref.shape[2]

        @pl.when(i == 0)
        def _():
            # Rotate (and optionally qk-norm) K into scratch in row CHUNKS:
            # a whole-KV f32 expression chain (kf, roll, products, norm
            # squares) costs ~4x skv*d*4B of Mosaic stack — with the norm
            # it exceeded the 16 MB scoped-vmem limit at 4608 tokens.
            kc = skv
            for cand in (512, 256, 128):
                if skv % cand == 0:
                    kc = cand
                    break

            def body(j, carry):
                rows = pl.ds(j * kc, kc)
                kf = k_ref[0, 0, rows, :].astype(jnp.float32)
                if kw_ref is not None:
                    # fused per-head-dim RMSNorm (qk_norm): row
                    # rsqrt(mean sq) then the scale — VPU work on rows
                    # already in VMEM; removes the XLA-side norm pass
                    # over q/k entirely. Scale ref is (1, D) shared or
                    # (S_pad, D) per-row (joint streams with different
                    # norm weights per segment, e.g. FLUX double blocks).
                    kw = (kw_ref[0] if kw_ref.shape[0] == 1
                          else kw_ref[rows, :]).astype(jnp.float32)
                    var = jnp.mean(kf * kf, axis=-1, keepdims=True)
                    kf = kf * jax.lax.rsqrt(var + qk_norm_eps) * kw
                # tables are padded to a block_q multiple (>= skv) so the
                # q tile's dynamic slice below is never out of bounds
                krot_ref[rows, :] = (kf * cos_ref[rows, :] +
                                     pltpu.roll(kf, d2, 1) *
                                     sin_ref[rows, :]
                                     ).astype(krot_ref.dtype)
                return carry

            jax.lax.fori_loop(0, skv // kc, body, 0, unroll=False)

        qf = q_ref[0, 0].astype(jnp.float32)
        if qw_ref is not None:
            qw = (qw_ref[0] if qw_ref.shape[0] == 1
                  else qw_ref[pl.ds(i * block_q, block_q), :]
                  ).astype(jnp.float32)
            var = jnp.mean(qf * qf, axis=-1, keepdims=True)
            qf = qf * jax.lax.rsqrt(var + qk_norm_eps) * qw
        cq = cos_ref[pl.ds(i * block_q, block_q), :]
        sq = sin_ref[pl.ds(i * block_q, block_q), :]
        q = ((qf * cq + pltpu.roll(qf, d2, 1) * sq) * (scale * LOG2_E)
             ).astype(q_ref.dtype)
    else:
        q = q_ref[0, 0]                                  # (BQ, D)

    if pipeline_kc:
        # Software-pipelined softmax (inference forward: no lse, no mask,
        # non-causal). The monolithic body serializes MXU and VPU: the
        # full (BQ, Skv) score matmul, THEN the softmax VPU passes, THEN
        # PV — measured 2.03 ms/launch at the FLUX point vs a ~1.32 ms
        # MXU bound. Chunking the KV axis and issuing chunk c+1's score
        # matmul BEFORE chunk c's exp2 lets the VPU softmax run under the
        # MXU. Exactness: without the row-max subtraction softmax over
        # exp2 is mathematically identical as long as nothing overflows;
        # the +/-100 clamp (exp2 domain) guards that — qk-normed FLUX
        # scores are bounded |s| <~ 65, so the clamp never binds on real
        # rows (a row whose EVERY score is < -100 would flatten to
        # uniform; can't happen with zero-mean logits).
        nch = (k_ref.shape[2] if cos_ref is None else krot_ref.shape[0]) \
            // pipeline_kc
        post = 1.0 if cos_ref is not None else scale * LOG2_E

        def kchunk(c):
            rows = pl.ds(c * pipeline_kc, pipeline_kc)
            kc = (krot_ref[rows, :] if cos_ref is not None
                  else k_ref[0, 0, rows, :])
            s = jax.lax.dot_general(q, kc, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return s if post == 1.0 else s * post

        s_cur = kchunk(0)
        o_acc = jnp.zeros((q.shape[0], v_ref.shape[-1]), jnp.float32)
        l = jnp.zeros((q.shape[0], 1), jnp.float32)
        for c in range(nch):
            s_next = kchunk(c + 1) if c + 1 < nch else None
            p = jnp.exp2(jnp.clip(s_cur, -100.0, 100.0))
            l = l + jnp.sum(p, axis=-1, keepdims=True)
            vc = v_ref[0, 0, pl.ds(c * pipeline_kc, pipeline_kc), :]
            o_acc = o_acc + jnp.dot(p.astype(vc.dtype), vc,
                                    preferred_element_type=jnp.float32)
            s_cur = s_next
        o_ref[0, 0] = (o_acc / l).astype(o_ref.dtype)
        return

    v = v_ref[0, 0]                                      # (Skv, D)
    if cos_ref is not None:
        k = krot_ref[...]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    else:
        k = k_ref[0, 0]                                  # (Skv, D)
        s = _logits(q, k, scale * LOG2_E)                # (BQ, Skv) f32·lg e
    s = _apply_masks(s, None if mask_ref is None else mask_ref[0], causal,
                     i * block_q, 0)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    # NOTE (round 2): an MXU row-sum (p @ ones) for l was tried and is a
    # measured LOSS at D=128 — the PV matmul already fills all 128 MXU
    # lanes, so the ones-column costs a full extra pass (0.569 vs 0.602
    # img/s end-to-end). The VPU reduction stays.
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v,
                preferred_element_type=jnp.float32) / l
    o_ref[0, 0] = o.astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0, 0] = m + jnp.log2(l)                  # (BQ, 1), base-2


def _flash_forward(q, k, v, kv_mask, *, causal: bool, scale: float,
                   block_q: int = 256, return_lse: bool = False,
                   rope=None, qk_norm=None):
    """q: (B, Hq, Sq, D); k, v: (B, Hk, Skv, D); kv_mask: (B, Skv) bool|None.
    rope: optional (cos, sin_signed), each (Skv, D) f32 half-layout tables
    (sign already folded, see _rope_signed_sin); requires Sq == Skv.
    qk_norm: optional (q_scale (D,), k_scale (D,), eps) — per-head-dim
    RMSNorm folded into the kernel before the rotation (requires rope)."""
    batch, hq, sq, d = q.shape
    hk, skv = k.shape[1], k.shape[2]
    group = hq // hk
    block_q = min(block_q, sq)
    if rope is not None and return_lse and sq >= 4096:
        # residual (training) forward with in-kernel rope: the f32 tables
        # + rotated-K scratch + the lse output tile push the BQ=256 score
        # intermediates 516 KB past the 16 MB scoped-vmem limit at 4608
        # tokens (measured); halve the q block on this path only — the
        # inference forward (no lse) keeps BQ=256
        block_q = min(block_q, 128)
    grid = (batch, hq, pl.cdiv(sq, block_q))

    # software-pipelined softmax (see _flash_kernel): inference forward
    # only — the lse/masked/causal paths keep the monolithic exact body
    pipeline_kc = 0
    if (not return_lse and not causal and kv_mask is None
            and os.environ.get("X2I_FA_PIPELINE", "1") != "0"):
        kc_pref = int(os.environ.get("X2I_FA_PIPELINE_KC", "512"))
        for cand in (kc_pref, 512, 256, 128):
            if cand and skv % cand == 0 and skv // cand >= 2:
                pipeline_kc = cand
                break

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skv, d), lambda b, h, i: (b, h // group, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skv, d), lambda b, h, i: (b, h // group, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    has_rope = rope is not None
    if has_rope:
        assert sq == skv, "in-kernel rope assumes joint (Sq == Skv) attention"
        # pad the tables to a block_q multiple: the kernel's q-tile slice
        # pl.ds(i*block_q, block_q) must stay in bounds for a partial
        # final block (otherwise Mosaic clamps the start and the last
        # valid rows get rotated with tables from block_q-(sq%block_q)
        # rows earlier — silent corruption at e.g. padded-896² lengths)
        s_pad = pl.cdiv(sq, block_q) * block_q
        for tab in rope:
            tab = jnp.pad(tab, ((0, s_pad - skv), (0, 0)))
            in_specs.append(pl.BlockSpec((s_pad, d),
                                         lambda b, h, i: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(tab)
    has_qk_norm = qk_norm is not None
    if has_qk_norm:
        assert has_rope, "in-kernel qk_norm rides the rope path"
        qw, kw, qk_eps = qk_norm
        s_pad = pl.cdiv(sq, block_q) * block_q
        for w in (qw, kw):
            if w.ndim == 1:                  # shared (D,) scale
                w = w.astype(jnp.float32).reshape(1, d)
                in_specs.append(pl.BlockSpec((1, d),
                                             lambda b, h, i: (0, 0),
                                             memory_space=pltpu.VMEM))
            else:                            # per-row (S, D) scales
                # bf16 in VMEM: the norm-scale params are bf16 anyway
                # (values identical after the in-kernel f32 upcast), and
                # f32 row tables blew the 16 MB scoped-vmem limit at
                # batch 2
                w = jnp.pad(w.astype(jnp.bfloat16),
                            ((0, s_pad - w.shape[0]), (0, 0)))
                in_specs.append(pl.BlockSpec((s_pad, d),
                                             lambda b, h, i: (0, 0),
                                             memory_space=pltpu.VMEM))
            args.append(w)
    else:
        qk_eps = 1e-6
    has_mask = kv_mask is not None
    if has_mask:
        # rank-3 (B, 1, Skv) so both trailing block dims equal the array's
        # (Mosaic requires last-two block dims (8,128)-divisible or full).
        in_specs.append(pl.BlockSpec((1, 1, skv), lambda b, h, i: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(kv_mask[:, None, :])

    out_shape = [jax.ShapeDtypeStruct((batch, hq, sq, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d),
                              lambda b, h, i: (b, h, i, 0),
                              memory_space=pltpu.VMEM)]
    if return_lse:
        # trailing unit dim keeps the block's last-two dims (block_q, 1)
        # legal on Mosaic (block_q % 8 == 0; 1 == array dim)
        out_shape.append(jax.ShapeDtypeStruct((batch, hq, sq, 1),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, block_q, 1),
                                      lambda b, h, i: (b, h, i, 0),
                                      memory_space=pltpu.VMEM))

    def kernel(*refs):
        refs = list(refs)
        qr, kr, vr = refs[:3]
        n = 3
        cr = sr = None
        if has_rope:
            cr, sr = refs[n:n + 2]
            n += 2
        qwr = kwr = None
        if has_qk_norm:
            qwr, kwr = refs[n:n + 2]
            n += 2
        mr = None
        if has_mask:
            mr = refs[n]
            n += 1
        orf = refs[n]
        n += 1
        lr = refs[n] if return_lse else None
        krot = refs[-1] if has_rope else None
        _flash_kernel(qr, kr, vr, cr, sr, qwr, kwr, mr, orf, lr, krot,
                      scale=scale, causal=causal, block_q=block_q,
                      qk_norm_eps=qk_eps, pipeline_kc=pipeline_kc)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if return_lse else out_specs[0],
        out_shape=tuple(out_shape) if return_lse else out_shape[0],
        scratch_shapes=([pltpu.VMEM((skv, d), k.dtype)] if has_rope
                        else []),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * hq * sq * skv * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * hq * sq * skv,
        ),
    )(*args)
    if return_lse:
        return out[0], out[1][..., 0]
    return out


def _flash_chunked_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                          acc_ref, m_ref, l_ref, *, scale: float,
                          causal: bool, block_q: int, block_k: int):
    """Online-softmax variant: grid (B, H, Sq/BQ, Skv/BK), kv innermost.
    Lifts the full-KV VMEM limit for long sequences (>8k tokens)."""
    i = pl.program_id(2)
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def compute():
        q = q_ref[0, 0]                                  # (BQ, D)
        k = k_ref[0, 0]                                  # (BK, D)
        v = v_ref[0, 0]
        s = _logits(q, k, scale * LOG2_E)                # (BQ, BK) f32·lg e
        s = _apply_masks(s, None if mask_ref is None else mask_ref[0],
                         causal, i * block_q, j * block_k)

        m_prev = m_ref[:]                                # (BQ, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    if causal and os.environ.get("X2I_FA_NO_CAUSAL_SKIP",
                                 "").lower() in ("", "0", "false"):
        # skip kv blocks entirely above the causal diagonal: block j
        # touches cols [j*BK, (j+1)*BK); the q block's last row is
        # (i+1)*BQ - 1 — for 32k-token MLLM prefill this halves the MXU
        # work (the skipped contribution is exactly zero, so the online
        # stats are unchanged). X2I_FA_NO_CAUSAL_SKIP=1 disables the
        # skip (A/B knob for tools/tpu_prefill_bench.py).
        pl.when(j * block_k < (i + 1) * block_q)(compute)
    else:
        compute()

    @pl.when(j == nj - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, 0] = m_ref[:] + jnp.log2(l_ref[:])  # (BQ, 1), base-2


def _flash_forward_chunked(q, k, v, kv_mask, *, causal: bool, scale: float,
                           block_q: int = 256, block_k: int = 512,
                           return_lse: bool = False):
    batch, hq, sq, d = q.shape
    hk, skv = k.shape[1], k.shape[2]
    group = hq // hk
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    grid = (batch, hq, pl.cdiv(sq, block_q), pl.cdiv(skv, block_k))

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i, j: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda b, h, i, j: (b, h // group, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda b, h, i, j: (b, h // group, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    has_mask = kv_mask is not None
    if has_mask:
        in_specs.append(pl.BlockSpec((1, 1, block_k),
                                     lambda b, h, i, j: (b, 0, j),
                                     memory_space=pltpu.VMEM))
        args.append(kv_mask[:, None, :])

    out_shape = [jax.ShapeDtypeStruct((batch, hq, sq, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d),
                              lambda b, h, i, j: (b, h, i, 0),
                              memory_space=pltpu.VMEM)]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((batch, hq, sq, 1),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, block_q, 1),
                                      lambda b, h, i, j: (b, h, i, 0),
                                      memory_space=pltpu.VMEM))

    def kernel(*refs):
        n_in = 3 + int(has_mask)
        ins, outs = refs[:n_in], refs[n_in:]
        mr = ins[3] if has_mask else None
        if return_lse:
            orf, lr, acc, m, l = outs
        else:
            (orf, acc, m, l), lr = outs, None
        _flash_chunked_kernel(ins[0], ins[1], ins[2], mr, orf, lr, acc, m,
                              l, scale=scale, causal=causal,
                              block_q=block_q, block_k=block_k)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if return_lse else out_specs[0],
        out_shape=tuple(out_shape) if return_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),    # acc
            pltpu.VMEM((block_q, 1), jnp.float32),    # running max
            pltpu.VMEM((block_q, 1), jnp.float32),    # running sum
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * hq * sq * skv * d,
            bytes_accessed=(q.size + k.size * group + v.size * group)
            * q.dtype.itemsize,
            transcendentals=batch * hq * sq * skv,
        ),
    )(*args)
    if return_lse:
        return out[0], out[1][..., 0]
    return out


def _rotate_rows_to_scratch(dst_ref, cos_ref, sin_ref, d2: int,
                            rows_total: int, read, dst_row0: int = 0):
    """Rotate `rows_total` rows of a (S, D) source (accessed through
    `read(rows)`) into a VMEM scratch in chunks (a whole-S f32 expression
    chain costs ~4x S*D*4B of Mosaic stack — chunking keeps the
    scoped-vmem footprint flat; same pattern as the forward kernel's K
    rotation). `dst_row0` offsets the write window: scratches holding
    several (group) segments stay rank-2 — Mosaic rejects lane slices of
    rank-3 scratch views at D=64 (tile (1,128))."""
    kc = rows_total
    for cand in (512, 256, 128):
        if rows_total % cand == 0:
            kc = cand
            break

    def body(j, carry):
        rows = pl.ds(j * kc, kc)
        xf = read(rows).astype(jnp.float32)
        dst_ref[pl.ds(dst_row0 + j * kc, kc), :] = (
            xf * cos_ref[rows, :] +
            pltpu.roll(xf, d2, 1) * sin_ref[rows, :]).astype(dst_ref.dtype)
        return carry

    jax.lax.fori_loop(0, rows_total // kc, body, 0, unroll=False)


def _counter_rotate(g, cos_tile, sin_tile, d2: int):
    """Transpose of the in-kernel rotation (the map is orthogonal):
    rope(x) = x*cos + roll(x)*sin'  =>  ropeᵀ(g) = g*cos + roll(g*sin')."""
    gf = g.astype(jnp.float32)
    return gf * cos_tile + pltpu.roll(gf * sin_tile, d2, 1)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   mask_ref, cos_ref, sin_ref, dq_ref, krot_ref, *,
                   scale: float, causal: bool, block_q: int):
    i = pl.program_id(2)
    v = v_ref[0, 0]
    if cos_ref is not None:
        # In-kernel rope (training path): K is rotated once per (b, h)
        # into scratch — the grid's block axis is sequential, so the
        # scratch persists across q blocks; the q tile is rotated per
        # program and dq (the cotangent of ROTATED q) is counter-rotated
        # through the transpose map before writeback. The pre-rope
        # projections stay the only HBM form of q/k/dq, deleting the
        # XLA-side rotate transients (~60 MB f32 at the 12B training
        # point) that kept rope outside the kernel for training.
        d2 = q_ref.shape[-1] // 2
        skv = k_ref.shape[2]

        @pl.when(i == 0)
        def _():
            _rotate_rows_to_scratch(krot_ref, cos_ref, sin_ref, d2, skv,
                                    lambda rows: k_ref[0, 0, rows, :])

        k = krot_ref[...]
        cq = cos_ref[pl.ds(i * block_q, block_q), :]
        sq_t = sin_ref[pl.ds(i * block_q, block_q), :]
        qf = q_ref[0, 0].astype(jnp.float32)
        # mirror the forward's recipe exactly (rotate in f32, fold the
        # exp2 scale, cast to storage dtype) so p = exp2(s - lse) reuses
        # the forward lse without bias
        q = ((qf * cq + pltpu.roll(qf, d2, 1) * sq_t) * (scale * LOG2_E)
             ).astype(q_ref.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    else:
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = _logits(q, k, scale * LOG2_E)
    do = do_ref[0, 0]                                   # (BQ, D)
    lse = lse_ref[0, 0]                                 # (BQ, 1), base-2
    delta = delta_ref[0, 0]                             # (BQ, 1)

    s = _apply_masks(s, None if mask_ref is None else mask_ref[0], causal,
                     i * block_q, 0)
    p = jnp.exp2(s - lse)                               # (BQ, Skv)
    dp = jax.lax.dot_general(
        do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (BQ, Skv)
    ds = p * (dp - delta) * scale
    dq = jnp.dot(ds.astype(k.dtype), k,
                 preferred_element_type=jnp.float32)
    if cos_ref is not None:
        dq = _counter_rotate(dq, cq, sq_t, d2)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                    mask_ref, cos_ref, sin_ref, dk_ref, dv_ref, qrot_ref,
                    *, scale: float, causal: bool, block_k: int,
                    group: int):
    j = pl.program_id(2)
    col0 = j * block_k
    v = v_ref[0, 0]
    if cos_ref is not None:
        # mirror of the dq kernel: full Q rotated once per (b, kv-head)
        # into scratch; the k tile rotated per program; dk (cotangent of
        # ROTATED k) counter-rotated before writeback
        d2 = k_ref.shape[-1] // 2
        sq_len = q_ref.shape[3]

        @pl.when(j == 0)
        def _():
            for g in range(group):                      # static unroll
                _rotate_rows_to_scratch(
                    qrot_ref, cos_ref, sin_ref, d2, sq_len,
                    lambda rows, g=g: q_ref[0, 0, g, rows, :],
                    dst_row0=g * sq_len)

        cj = cos_ref[pl.ds(col0, block_k), :]
        sj = sin_ref[pl.ds(col0, block_k), :]
        kf = k_ref[0, 0].astype(jnp.float32)
        k = ((kf * cj + pltpu.roll(kf, d2, 1) * sj)
             ).astype(k_ref.dtype)                      # (BK, D) rotated
    else:
        k = k_ref[0, 0]                                 # (BK, D)
    dk = jnp.zeros(k.shape, jnp.float32)
    dv = jnp.zeros(v.shape, jnp.float32)
    for g in range(group):                              # static unroll
        # (BK, Sq) score orientation: kv rows, q lanes. Every contraction
        # is then direct (no transposes), lse/delta ride in as (1, Sq)
        # instead of lane-padded (Sq, 1) — at 4608 tokens that plus the
        # (Sq, BK)->(BK, Sq) intermediate flip is ~11 MB of scoped VMEM,
        # the difference between fitting and not once the rope tables
        # join the kernel. do stays in storage dtype (the old f32 upcast
        # also silently forced f32 MXU rate on the dv/dp matmuls).
        q = (qrot_ref[pl.ds(g * q_ref.shape[3], q_ref.shape[3]), :]
             if cos_ref is not None
             else q_ref[0, 0, g])                       # (Sq, D)
        do = do_ref[0, 0, g]                            # (Sq, D)
        lse = lse_ref[0, 0, g]                          # (1, Sq), base-2
        delta = delta_ref[0, 0, g]                      # (1, Sq)
        s = _logits(k, q, scale * LOG2_E)               # (BK, Sq)
        if mask_ref is not None:
            s = jnp.where(mask_ref[0], s, NEG_INF)      # (BK, 1) kv mask
        if causal:
            krow = col0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            qcol = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(krow <= qcol, s, NEG_INF)
        p = jnp.exp2(s - lse)                           # (BK, Sq)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (BK, D)
        dp = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (BK, Sq)
        ds = p * (dp - delta) * scale                   # (BK, Sq)
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (BK, D)
    if cos_ref is not None:
        dk = _counter_rotate(dk, cj, sj, d2)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, kv_mask, o, lse, do, *, causal: bool,
                    scale: float, block_q: int = 256, block_k: int = 256,
                    rope=None):
    batch, hq, sq, d = q.shape
    hk, skv = k.shape[1], k.shape[2]
    group = hq // hk
    block_q = min(block_q, sq)
    # dkv VMEM budget: the kernel holds 4 f32 (BK, group*Sq) score-sized
    # intermediates plus double-buffered full-Sq q/do rows; at Sq >= 4k a
    # 256-wide kv block overflows the ~16 MB scoped VMEM.
    if group * sq >= 4096:
        block_k = min(block_k,
                      int(os.environ.get("X2I_FA_BWD_BLOCK_K", "128")))
    block_k = min(block_k, skv)
    has_rope = rope is not None
    if has_rope and sq >= 4096:
        # the rope path adds 2 f32 (S, D) tables + a rotated-K scratch to
        # the dq kernel's residency; halve the q block so the 4 f32
        # (BQ, Skv) score intermediates shrink to fit scoped VMEM
        block_q = min(block_q, 128)
    if has_rope and group * sq >= 4096:
        # same budget math for the dkv kernel: tables (4.7 MB at 4608
        # tokens) + rotated-Q scratch + the f32 (BK, group*Sq) score
        # intermediates; BK=64 keeps the whole kernel ~13 MB at the 12B
        # training point (BK=128 measured 17.7 MB > the 16 MB limit)
        block_k = min(block_k, 64)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                            # (B, Hq, Sq)

    # ---- dq ----
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skv, d), lambda b, h, i: (b, h // group, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, skv, d), lambda b, h, i: (b, h // group, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, do, lse[..., None], delta[..., None]]
    has_mask = kv_mask is not None
    if has_mask:
        in_specs.append(pl.BlockSpec((1, 1, skv), lambda b, h, i: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(kv_mask[:, None, :])
    if has_rope:
        # pad tables to a block multiple so the per-tile dynamic slices
        # never clamp at a partial final block (same guard as the forward)
        s_pad_q = pl.cdiv(sq, block_q) * block_q
        for tab in rope:
            args.append(jnp.pad(tab, ((0, s_pad_q - skv), (0, 0))))
            in_specs.append(pl.BlockSpec((s_pad_q, d),
                                         lambda b, h, i: (0, 0),
                                         memory_space=pltpu.VMEM))

    def dq_kernel(*refs):
        refs = list(refs)
        qr, kr, vr, dor, lr, der = refs[:6]
        n = 6
        mr = None
        if has_mask:
            mr = refs[n]
            n += 1
        cr = sr = None
        if has_rope:
            cr, sr = refs[n:n + 2]
            n += 2
        dqr = refs[n]
        krot = refs[-1] if has_rope else None
        _bwd_dq_kernel(qr, kr, vr, dor, lr, der, mr, cr, sr, dqr, krot,
                       scale=scale, causal=causal, block_q=block_q)

    dq = pl.pallas_call(
        dq_kernel,
        grid=(batch, hq, pl.cdiv(sq, block_q)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, hq, sq, d), q.dtype),
        scratch_shapes=([pltpu.VMEM((skv, d), k.dtype)] if has_rope
                        else []),
    )(*args)

    # ---- dk / dv ---- (grid over kv blocks; group summed in-kernel)
    qg = q.reshape(batch, hk, group, sq, d)
    dog = do.reshape(batch, hk, group, sq, d)
    lseg = lse.reshape(batch, hk, group, 1, sq)
    deltag = delta.reshape(batch, hk, group, 1, sq)
    in_specs = [
        pl.BlockSpec((1, 1, group, sq, d), lambda b, h, j: (b, h, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, group, sq, d), lambda b, h, j: (b, h, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, group, 1, sq), lambda b, h, j: (b, h, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, group, 1, sq), lambda b, h, j: (b, h, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d), lambda b, h, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, d), lambda b, h, j: (b, h, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args2 = [qg, dog, lseg, deltag, k, v]
    if has_mask:
        # kv mask enters kv-major, (BK, 1): it masks score ROWS in the
        # (BK, Sq) orientation
        in_specs.append(pl.BlockSpec((1, block_k, 1),
                                     lambda b, h, j: (b, j, 0),
                                     memory_space=pltpu.VMEM))
        args2.append(kv_mask[:, :, None])
    if has_rope:
        s_pad_k = pl.cdiv(skv, block_k) * block_k
        for tab in rope:
            args2.append(jnp.pad(tab, ((0, s_pad_k - skv), (0, 0))))
            in_specs.append(pl.BlockSpec((s_pad_k, d),
                                         lambda b, h, j: (0, 0),
                                         memory_space=pltpu.VMEM))

    def dkv_kernel(*refs):
        refs = list(refs)
        qr, dor, lr, der, kr, vr = refs[:6]
        n = 6
        mr = None
        if has_mask:
            mr = refs[n]
            n += 1
        cr = sr = None
        if has_rope:
            cr, sr = refs[n:n + 2]
            n += 2
        dkr, dvr = refs[n:n + 2]
        qrot = refs[-1] if has_rope else None
        _bwd_dkv_kernel(qr, dor, lr, der, kr, vr, mr, cr, sr, dkr, dvr,
                        qrot, scale=scale, causal=causal,
                        block_k=block_k, group=group)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(batch, hk, pl.cdiv(skv, block_k)),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d), lambda b, h, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((batch, hk, skv, d), k.dtype),
                   jax.ShapeDtypeStruct((batch, hk, skv, d), v.dtype)),
        scratch_shapes=([pltpu.VMEM((group * sq, d), q.dtype)]
                        if has_rope else []),
    )(*args2)

    return dq, dk, dv


def _xla_attention(q, k, v, kv_mask, *, causal: bool, scale: float,
                   bias=None, causal_offset=0):
    """Reference/fallback path in plain XLA ops.

    bias: optional additive logits bias broadcastable to (B, H, Sq, Skv)
    (T5 relative position bias). causal_offset: absolute position of query
    row 0 (chunked prefill against a KV cache; may be traced)."""
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
        rows = causal_offset + jnp.arange(sq)[:, None]
        cols = jnp.arange(skv)[None, :]
        s = jnp.where(cols <= rows, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    p = p.reshape(batch, hk, group * sq, skv)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return o.reshape(batch, hq, sq, d).astype(q.dtype)


def _fwd_impl(q, k, v, kv_mask, rope, causal, scale, return_lse=False):
    import os

    def _env_true(name):
        return os.environ.get(name, "").lower() not in ("", "0", "false")

    bq = int(os.environ.get("X2I_FA_BLOCK_Q", "256"))
    # In-kernel rope adds 2 f32 tables + a k scratch to the full-KV
    # kernel's VMEM residency; beyond ~6k kv tokens pre-rotate in XLA
    # instead (validated on hardware at the 4608-token FLUX point; the
    # conservative cap is tunable until longer joints are measured).
    rope_max_kv = int(os.environ.get("X2I_FA_ROPE_MAX_KV", "6144"))
    if rope is not None and k.shape[2] > rope_max_kv:
        cos, sin_s = rope
        q = _rope_bhsd(q, cos, sin_s)
        k = _rope_bhsd(k, cos, sin_s)
        rope = None
    if k.shape[2] > MAX_KV_SEQ or _env_true("X2I_FA_FORCE_CHUNKED"):
        if rope is not None:               # chunked path: pre-rope in XLA
            cos, sin_s = rope
            q = _rope_bhsd(q, cos, sin_s)
            k = _rope_bhsd(k, cos, sin_s)
        return _flash_forward_chunked(q, k, v, kv_mask, causal=causal,
                                      scale=scale, block_q=bq,
                                      return_lse=return_lse)
    return _flash_forward(q, k, v, kv_mask, causal=causal, scale=scale,
                          block_q=bq, return_lse=return_lse, rope=rope)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash(q, k, v, kv_mask, rope, causal, scale):
    return _fwd_impl(q, k, v, kv_mask, rope, causal, scale)


def _flash_fwd(q, k, v, kv_mask, rope, causal, scale):
    o, lse = _fwd_impl(q, k, v, kv_mask, rope, causal, scale,
                       return_lse=True)
    return o, (q, k, v, kv_mask, rope, o, lse)


def _flash_bwd(causal, scale, res, do):
    q, k, v, kv_mask, rope, o, lse = res
    if rope is not None:
        rope_max_kv = int(os.environ.get("X2I_FA_ROPE_MAX_KV", "6144"))
        if k.shape[2] <= min(MAX_KV_SEQ, rope_max_kv):
            # in-kernel rope backward: the pre-rope projections stay the
            # only HBM form of q/k/dq/dk — no XLA rotate transients
            dq, dk, dv = _flash_backward(q, k, v, kv_mask, o, lse, do,
                                         causal=causal, scale=scale,
                                         rope=rope)
            return dq, dk, dv, None, jax.tree.map(jnp.zeros_like, rope)
        # long-joint fallback: the rotation is orthogonal and
        # position-wise — rope q/k once in XLA, push cotangents through
        # the transpose map. cos/sin receive zero cotangents (positions
        # are never differentiated).
        cos, sin_s = rope
        qr, kr = _rope_bhsd(q, cos, sin_s), _rope_bhsd(k, cos, sin_s)
        dq, dk, dv, _, _ = _flash_bwd(causal, scale,
                                      (qr, kr, v, kv_mask, None, o, lse),
                                      do)
        dq = _rope_bhsd_T(dq, cos, sin_s)
        dk = _rope_bhsd_T(dk, cos, sin_s)
        return dq, dk, dv, None, jax.tree.map(jnp.zeros_like, rope)
    if k.shape[2] > MAX_KV_SEQ:
        # long-sequence fallback: XLA recompute autodiff (the fused bwd
        # kernels hold full Q/do rows per kv-head in VMEM)
        def f(q, k, v):
            return _xla_attention(q, k, v, kv_mask, causal=causal,
                                  scale=scale)
        _, vjp = jax.vjp(f, q, k, v)
        dq, dk, dv = vjp(do)
        return dq, dk, dv, None, None
    dq, dk, dv = _flash_backward(q, k, v, kv_mask, o, lse, do,
                                 causal=causal, scale=scale)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    kv_mask: Optional[jnp.ndarray] = None,
                    causal: bool = False,
                    scale: Optional[float] = None,
                    rope=None, qk_norm=None) -> jnp.ndarray:
    """Flash attention over (B, H, S, D) tensors. Differentiable (fused
    Pallas backward) — except with qk_norm, which is forward-only.

    rope: optional (cos, sin) half-layout tables, each (S, D) f32 with
    cos = cat(c, c) / sin = cat(s, s) (flux_rope_freqs_half). The rotary
    embedding is applied to q/k inside the kernel (Sq == Skv only) — the
    projections' outputs go to the kernel un-roped, removing the XLA-side
    rope pass over both tensors.

    qk_norm: optional (q_scale (D,), k_scale (D,), eps): per-head-dim
    RMSNorm (diffusers qk_norm='rms_norm') folded into the kernel before
    the rotation, so the raw projections are the only HBM form of q/k.
    Requires rope; inference-only (no vjp)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if rope is not None:
        cos, sin = rope
        rope = (cos.astype(jnp.float32),
                _rope_signed_sin(sin.astype(jnp.float32)))
    if qk_norm is not None:
        import os
        assert rope is not None, "qk_norm rides the in-kernel rope path"
        rope_max_kv = int(os.environ.get("X2I_FA_ROPE_MAX_KV", "6144"))
        if (k.shape[2] > min(MAX_KV_SEQ, rope_max_kv)
                or os.environ.get("X2I_FA_FORCE_CHUNKED", "")
                .lower() not in ("", "0", "false")):
            # paths that pre-rotate in XLA: normalize in XLA too
            from x2i_tpu.ops.norms import rms_norm
            qw, kw, eps = qk_norm
            return _flash(rms_norm(q, qw, eps), rms_norm(k, kw, eps), v,
                          kv_mask, rope, causal, scale)
        bq = int(os.environ.get("X2I_FA_BLOCK_Q", "256"))
        return _flash_forward(q, k, v, kv_mask, causal=causal, scale=scale,
                              block_q=bq, rope=rope, qk_norm=qk_norm)
    return _flash(q, k, v, kv_mask, rope, causal, scale)


def supported(q_shape, kv_seq: int) -> bool:
    """Whether a Pallas kernel applies to these shapes (full-KV design up
    to MAX_KV_SEQ; chunked online-softmax beyond)."""
    _, _, sq, d = q_shape
    return (d in (64, 128, 256) and kv_seq % 128 == 0 and sq % 128 == 0)


def xla_attention(q, k, v, kv_mask=None, causal=False, scale=None,
                  bias=None, causal_offset=0):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _xla_attention(q, k, v, kv_mask, causal=causal, scale=scale,
                          bias=bias, causal_offset=causal_offset)
