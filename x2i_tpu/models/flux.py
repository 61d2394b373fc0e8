"""FLUX-class rectified-flow Diffusion Transformer, TPU-native.

Re-implements the architecture of the reference's vendored diffusers DiT
(/root/reference/lightcontrol/lightcontrol_flux.py:44-553): 19 double-stream
MMDiT blocks + 38 single-stream blocks, 24 heads x 128, AdaLN-Zero
modulation, 3-axis RoPE (16, 56, 56), with two deliberate design deltas
(SURVEY.md §7.1):

  * No forward hooks. The reference captures per-block attention outputs for
    distillation via PyTorch hooks (train/train_minicpm.py:211-219). Here the
    blocks run under `nn.scan`, and the per-block attention outputs are the
    scan's stacked ys — pure-functional, jit/remat-safe, and shaped exactly
    like the reference's KD stacks: (B, 19, S_img, 3072), (B, 19, S_txt,
    3072), (B, 38, S_img+S_txt, 3072) (train_minicpm.py:335-337).

  * Scan-over-layers with stacked parameters instead of 57 unrolled python
    modules — one compiled block body per stream, which XLA pipelines.

LightControl control injection (lightcontrol_flux.py:504-507) is an optional
per-double-block additive input `controls: (19, B, S_img, dim)`, precomputed
by vmapping the 19 ControlNeXt branches (models/controlnext.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from x2i_tpu.core.config import FluxConfig
from x2i_tpu.ops.attention import attention
from x2i_tpu.ops.norms import layer_norm, rms_norm
from x2i_tpu.ops.quant import make_dense
from x2i_tpu.ops.rope import (apply_rope_interleaved, flux_rope_freqs,
                              flux_rope_freqs_half)


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers convention with flip_sin_to_cos=True,
    downscale_freq_shift=0 (Timesteps(256, True, 0) in the reference's DiT)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class MLPEmbedder(nn.Module):
    """linear -> silu -> linear (diffusers TimestepEmbedding /
    PixArtAlphaTextProjection)."""
    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        dense = make_dense(self.quantized, self.dtype, self.param_dtype)
        x = dense(self.hidden_dim, "in_layer")(x)
        x = nn.silu(x)
        return dense(self.out_dim, "out_layer")(x)


class QKNorm(nn.Module):
    """Per-head RMSNorm on q/k (diffusers Attention qk_norm='rms_norm').

    scale_only=True returns the (head_dim,) scale param without applying
    the norm — the fused inference path folds the normalization into the
    flash kernel (ops/flash_attention qk_norm=) and only needs the weight.
    """
    head_dim: int
    eps: float = 1e-6
    param_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, scale_only: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.head_dim,),
                           self.param_dtype)
        if scale_only:
            return scale
        return rms_norm(x, scale, self.eps)


def _modulate(x: jnp.ndarray, shift: jnp.ndarray,
              scale: jnp.ndarray) -> jnp.ndarray:
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _use_fused_glue(cfg, kd_target):
    """Fused Pallas glue (ops/fused_glue) mode for the plain inference
    path: "quant" on w8a8 (LN/modulate/gelu + the dynamic activation
    quantization in one HBM pass each), "ln" on weight-only / bf16 modes
    (LN+modulate in one pass, bf16 out; the matmuls take bf16 directly),
    None when unavailable — the kernels are not differentiable (KD and
    student paths keep the XLA glue) and skip the TP/SP sharding
    constraints. Both modes also fold the qk RMSNorm into the flash
    attention kernel."""
    if not cfg.fused_glue or kd_target is not None:
        return None
    if cfg.shard_activations or cfg.shard_sequence or cfg.ring_sequence:
        return None
    return "quant" if cfg.quantized in ("w8a8", "w4a8") else "ln"


def _roped_attention(cfg, q, k, v, rope, impl: str,
                     qk_norm=None) -> jnp.ndarray:
    """RoPE + joint attention. q/k/v: (B, S, H, D); rope: (cos, sin) each
    (S, D) in cfg.rope_layout. qk_norm: optional (q_scale, k_scale, eps)
    when the caller skipped the QKNorm modules (fused inference path) —
    applied in-kernel on the rope_in_kernel route, in XLA otherwise.

    The half layout assumes q/k projection channels (and qk-norm scales)
    are stored permuted by ops/rope.py::half_layout_perm — converters do
    this; attention outputs are identical in either layout. The rotate-
    half form is contiguous in the lane dim, so on TPU it fuses into the
    surrounding elementwise work instead of forcing the f32 layout copies
    the interleaved pair-stack does, and the rotation is pushed into the
    Pallas flash kernel itself (ops/attention.py rope=), removing the
    XLA-side rope read+write of q/k entirely (measured:
    tools/profile_generate.py)."""
    cos, sin = rope
    if qk_norm is not None and not (cfg.rope_layout == "half"
                                    and cfg.rope_in_kernel
                                    and not cfg.ring_sequence):
        from x2i_tpu.ops.norms import rms_norm
        qw, kw, eps = qk_norm
        qw = qw if qw.ndim == 1 else qw[:, None, :]
        kw = kw if kw.ndim == 1 else kw[:, None, :]
        q, k, qk_norm = rms_norm(q, qw, eps), rms_norm(k, kw, eps), None
    if cfg.rope_layout == "half":
        if cfg.ring_sequence:
            from x2i_tpu.ops.rope import apply_rope_half
            return _ring(cfg, apply_rope_half(q, cos, sin),
                         apply_rope_half(k, cos, sin), v, impl)
        if cfg.rope_in_kernel:
            return attention(q, k, v, implementation=impl, rope=(cos, sin),
                             qk_norm=qk_norm)
        from x2i_tpu.ops.rope import apply_rope_half
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        return attention(q, k, v, implementation=impl)
    q = apply_rope_interleaved(q, cos[:, None, :], sin[:, None, :])
    k = apply_rope_interleaved(k, cos[:, None, :], sin[:, None, :])
    if cfg.ring_sequence:
        return _ring(cfg, q, k, v, impl)
    return attention(q, k, v, implementation=impl)


def _ring(cfg, q, k, v, impl: str) -> jnp.ndarray:
    """Sequence-sharded ring attention over the mesh 'tensor' axis; the
    ring size comes from the ambient mesh (jax.set_mesh context)."""
    from jax.sharding import get_abstract_mesh

    from x2i_tpu.ops.ring_attention import ring_attention
    mesh_shape = get_abstract_mesh().shape
    n = mesh_shape.get("tensor", 1)
    if n <= 1:
        return attention(q, k, v, implementation=impl)
    # keep the batch sharded over the data axes inside the shard_map
    # (replicating it would make every data row redo the whole batch)
    batch_axes = tuple(ax for ax in ("data", "fsdp") if ax in mesh_shape)
    return ring_attention(q, k, v, "tensor", n, implementation=impl,
                          batch_axes=batch_axes or None)


def _shard(x: jnp.ndarray, cfg: FluxConfig, *spec) -> jnp.ndarray:
    """Tensor-parallel activation constraint (mesh 'tensor' axis). XLA
    derives the matching weight shardings and inserts ICI collectives."""
    if not cfg.shard_activations:
        return x
    from jax.sharding import PartitionSpec as P
    return jax.lax.with_sharding_constraint(x, P(*spec))


def _shard_seq(x: jnp.ndarray, cfg: FluxConfig) -> jnp.ndarray:
    """Sequence-parallel constraint on a (B, S, D) residual stream: tokens
    sharded over the 'tensor' axis between blocks; XLA all-gathers K/V for
    the joint attention and reduce-scatters afterwards (shard_sequence),
    or the KV shards stay put and rotate around the ring (ring_sequence —
    no full-sequence K/V ever materializes)."""
    if not (cfg.shard_sequence or cfg.ring_sequence):
        return x
    from jax.sharding import PartitionSpec as P
    return jax.lax.with_sharding_constraint(
        x, P(("data", "fsdp"), "tensor", None))


class FluxDoubleBlock(nn.Module):
    """Dual-stream MMDiT block (lightcontrol_flux.py:108-204).

    __call__ takes/returns a (hidden, encoder_hidden) carry so it can run
    under nn.scan; per-block attention outputs are returned as ys — or,
    when a per-layer kd_target is supplied, the per-block KD terms are
    computed inline and only scalars leave the scan (SURVEY §7.3.3: the
    full student stacks are ~GBs at the 4096-token operating point).
    """
    cfg: FluxConfig
    kd_quantize: bool = False      # emit ys as int8 (values, scales) pairs
    mods_only: bool = False        # only run the adaLN mod denses (see
    #                                FluxTransformer2D precompute-mods mode)

    @nn.compact
    def __call__(self, carry, temb, rope=None, control=None, kd_target=None,
                 kd_tau=3.0, mods=None):
        cfg = self.cfg
        dim = cfg.inner_dim
        dense = make_dense(cfg.quantized, cfg.dtype, cfg.param_dtype)
        if self.mods_only:
            # precompute-mods pass: temb carries ALL denoise steps' rows,
            # so each layer's mod weights are read once per image instead
            # of once per step (the M=1 int8 matvecs are bandwidth-bound
            # on those reads — ~21.5 ms/image at 1024² 4-step, measured)
            return carry, (dense(6 * dim, "img_mod")(nn.silu(temb)),
                           dense(6 * dim, "txt_mod")(nn.silu(temb)))
        kd_quantize = self.kd_quantize
        hidden, encoder = carry
        heads, head_dim = cfg.num_attention_heads, cfg.attention_head_dim

        # AdaLN-Zero modulation for both streams.
        if mods is not None:
            mod, cmod = mods
        else:
            mod = dense(6 * dim, "img_mod")(nn.silu(temb))
            cmod = dense(6 * dim, "txt_mod")(nn.silu(temb))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
        (c_shift_msa, c_scale_msa, c_gate_msa,
         c_shift_mlp, c_scale_mlp, c_gate_mlp) = jnp.split(cmod, 6, axis=-1)

        fused = _use_fused_glue(cfg, kd_target)
        if fused == "quant":
            from x2i_tpu.ops.fused_glue import (gelu_quant, ln_mod_quant,
                                                quant_rows)
            img_in = ln_mod_quant(hidden, shift_msa, scale_msa)
            txt_in = ln_mod_quant(encoder, c_shift_msa, c_scale_msa)
        elif fused == "ln":
            from x2i_tpu.ops.fused_glue import ln_mod
            img_in = ln_mod(hidden, shift_msa, scale_msa)
            txt_in = ln_mod(encoder, c_shift_msa, c_scale_msa)
        else:
            img_in = _modulate(layer_norm(hidden), shift_msa, scale_msa)
            txt_in = _modulate(layer_norm(encoder), c_shift_msa,
                               c_scale_msa)

        batch, s_img = hidden.shape[0], hidden.shape[1]
        s_txt = encoder.shape[1]

        def heads_of(x):
            return x.reshape(batch, -1, heads, head_dim)

        q = heads_of(dense(dim, "img_q")(img_in))
        k = heads_of(dense(dim, "img_k")(img_in))
        v = heads_of(dense(dim, "img_v")(img_in))
        cq = heads_of(dense(dim, "txt_q")(txt_in))
        ck = heads_of(dense(dim, "txt_k")(txt_in))
        cv = heads_of(dense(dim, "txt_v")(txt_in))
        iqn = QKNorm(head_dim, cfg.qk_norm_eps, cfg.param_dtype,
                     name="img_q_norm")
        ikn = QKNorm(head_dim, cfg.qk_norm_eps, cfg.param_dtype,
                     name="img_k_norm")
        tqn = QKNorm(head_dim, cfg.qk_norm_eps, cfg.param_dtype,
                     name="txt_q_norm")
        tkn = QKNorm(head_dim, cfg.qk_norm_eps, cfg.param_dtype,
                     name="txt_k_norm")
        qk_norm = None
        if fused is not None:   # qk-norm fold applies to ALL fused modes
            # per-row (S, D) scale tables: txt rows carry the txt norm
            # weight, img rows the img one — the norm itself (rsqrt of
            # the row mean square) runs inside the flash kernel
            def rows(tw, iw):
                return jnp.concatenate([
                    jnp.broadcast_to(tw.astype(jnp.float32),
                                     (s_txt, head_dim)),
                    jnp.broadcast_to(iw.astype(jnp.float32),
                                     (s_img, head_dim))], axis=0)
            qk_norm = (rows(tqn(cq, scale_only=True),
                            iqn(q, scale_only=True)),
                       rows(tkn(ck, scale_only=True),
                            ikn(k, scale_only=True)),
                       cfg.qk_norm_eps)
        else:
            q, k = iqn(q), ikn(k)
            cq, ck = tqn(cq), tkn(ck)

        # Joint attention: text tokens first, then image tokens, matching
        # FluxAttnProcessor2_0 and the RoPE id order cat(txt_ids, img_ids).
        q = jnp.concatenate([cq, q], axis=1)
        k = jnp.concatenate([ck, k], axis=1)
        v = jnp.concatenate([cv, v], axis=1)
        # TP: shard heads over the 'tensor' axis
        q = _shard(q, cfg, ("data", "fsdp"), None, "tensor", None)
        k = _shard(k, cfg, ("data", "fsdp"), None, "tensor", None)
        v = _shard(v, cfg, ("data", "fsdp"), None, "tensor", None)

        impl = "auto" if cfg.use_pallas_attention else "xla"
        attn = _roped_attention(cfg, q, k, v, rope, impl, qk_norm)
        attn = attn.reshape(batch, s_txt + s_img, dim)
        txt_attn, img_attn = attn[:, :s_txt], attn[:, s_txt:]

        if fused == "quant":
            img_attn = dense(dim, "img_attn_out")(quant_rows(img_attn))
            txt_attn = dense(dim, "txt_attn_out")(quant_rows(txt_attn))
        else:
            img_attn = dense(dim, "img_attn_out")(img_attn)
            txt_attn = dense(dim, "txt_attn_out")(txt_attn)

        hidden = hidden + gate_msa[:, None, :] * img_attn
        if fused == "quant":
            ff_in = ln_mod_quant(hidden, shift_mlp, scale_mlp)
        elif fused == "ln":
            ff_in = ln_mod(hidden, shift_mlp, scale_mlp)
        else:
            ff_in = _modulate(layer_norm(hidden), shift_mlp, scale_mlp)
        mid = dense(int(dim * cfg.mlp_ratio), "img_mlp_in")(ff_in)
        if fused == "quant":
            ff = dense(dim, "img_mlp_out")(gelu_quant(mid))
        else:
            ff_mid = _shard(nn.gelu(mid), cfg, ("data", "fsdp"), None,
                            "tensor")
            ff = dense(dim, "img_mlp_out")(ff_mid)
        hidden = hidden + gate_mlp[:, None, :] * ff

        encoder = encoder + c_gate_msa[:, None, :] * txt_attn
        if fused == "quant":
            cff_in = ln_mod_quant(encoder, c_shift_mlp, c_scale_mlp)
        elif fused == "ln":
            cff_in = ln_mod(encoder, c_shift_mlp, c_scale_mlp)
        else:
            cff_in = _modulate(layer_norm(encoder), c_shift_mlp,
                               c_scale_mlp)
        cmid = dense(int(dim * cfg.mlp_ratio), "txt_mlp_in")(cff_in)
        if fused == "quant":
            cff = dense(dim, "txt_mlp_out")(gelu_quant(cmid))
        else:
            cff_mid = _shard(nn.gelu(cmid), cfg, ("data", "fsdp"), None,
                             "tensor")
            cff = dense(dim, "txt_mlp_out")(cff_mid)
        encoder = encoder + c_gate_mlp[:, None, :] * cff

        if control is not None:
            # LightControl residual injection (lightcontrol_flux.py:504-507).
            hidden = hidden + control.astype(hidden.dtype)

        hidden = _shard_seq(hidden, cfg)
        encoder = _shard_seq(encoder, cfg)
        if kd_target is not None:
            from x2i_tpu.ops.kd import kl_term
            t_img, t_txt = kd_target
            return (hidden, encoder), (kl_term(t_img, img_attn, kd_tau),
                                       kl_term(t_txt, txt_attn, kd_tau))
        if kd_quantize:
            from x2i_tpu.ops.kd import quantize_kd_tensor
            return (hidden, encoder), (quantize_kd_tensor(img_attn),
                                       quantize_kd_tensor(txt_attn))
        return (hidden, encoder), (img_attn, txt_attn)


class FluxSingleBlock(nn.Module):
    """Single-stream block (lightcontrol_flux.py:44-104): parallel attention
    + MLP with a fused output projection; attention has no out-proj
    (pre_only) — its raw head-concat output is the distillation target."""
    cfg: FluxConfig
    kd_quantize: bool = False      # emit ys as int8 (values, scales) pairs
    mods_only: bool = False        # only run the adaLN mod dense

    @nn.compact
    def __call__(self, hidden, temb, rope=None, kd_target=None, kd_tau=3.0,
                 mods=None):
        cfg = self.cfg
        dim = cfg.inner_dim
        dense = make_dense(cfg.quantized, cfg.dtype, cfg.param_dtype)
        if self.mods_only:
            return hidden, dense(3 * dim, "mod")(nn.silu(temb))
        kd_quantize = self.kd_quantize
        heads, head_dim = cfg.num_attention_heads, cfg.attention_head_dim
        mlp_dim = int(dim * cfg.mlp_ratio)

        mod = (mods if mods is not None
               else dense(3 * dim, "mod")(nn.silu(temb)))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        # fused_glue: one-HBM-pass Pallas kernels produce pre-quantized
        # (int8, row-scale) inputs for the w8a8 matmuls (ops/fused_glue);
        # inference-only (not differentiable), so KD paths keep XLA glue.
        fused = _use_fused_glue(cfg, kd_target)
        if fused == "quant":
            from x2i_tpu.ops.fused_glue import (gelu_quant, ln_mod_quant,
                                                quant_rows)
            x = ln_mod_quant(hidden, shift, scale)
        elif fused == "ln":
            from x2i_tpu.ops.fused_glue import ln_mod
            x = ln_mod(hidden, shift, scale)
        else:
            x = _modulate(layer_norm(hidden), shift, scale)

        batch, seq = hidden.shape[0], hidden.shape[1]
        q = dense(dim, "q")(x).reshape(batch, seq, heads, head_dim)
        k = dense(dim, "k")(x).reshape(batch, seq, heads, head_dim)
        qn = QKNorm(head_dim, cfg.qk_norm_eps, cfg.param_dtype,
                    name="q_norm")
        kn = QKNorm(head_dim, cfg.qk_norm_eps, cfg.param_dtype,
                    name="k_norm")
        qk_norm = None
        if fused is not None:   # qk-norm fold applies to ALL fused modes
            # norm folded into the flash kernel (raw projections are the
            # only HBM form of q/k); params unchanged
            qk_norm = (qn(q, scale_only=True), kn(k, scale_only=True),
                       cfg.qk_norm_eps)
        else:
            q, k = qn(q), kn(k)
        v = dense(dim, "v")(x).reshape(batch, seq, heads, head_dim)

        q = _shard(q, cfg, ("data", "fsdp"), None, "tensor", None)
        k = _shard(k, cfg, ("data", "fsdp"), None, "tensor", None)
        v = _shard(v, cfg, ("data", "fsdp"), None, "tensor", None)

        impl = "auto" if cfg.use_pallas_attention else "xla"
        attn = _roped_attention(cfg, q, k, v, rope, impl, qk_norm)
        attn = attn.reshape(batch, seq, dim)

        if fused == "quant":
            # chunked pre-quantized input: the [attn | mlp] concat never
            # materializes (QuantDense sums per-chunk int8 matmuls)
            mlp_t = gelu_quant(dense(mlp_dim, "mlp_in")(x))
            out = dense(dim, "out")([quant_rows(attn), mlp_t])
        else:
            mlp = nn.gelu(dense(mlp_dim, "mlp_in")(x))
            mlp = _shard(mlp, cfg, ("data", "fsdp"), None, "tensor")
            out = dense(dim, "out")(jnp.concatenate([attn, mlp], axis=-1))
        hidden = hidden + gate[:, None, :] * out
        hidden = _shard_seq(hidden, cfg)
        if kd_target is not None:
            from x2i_tpu.ops.kd import kl_term
            return hidden, kl_term(kd_target, attn, kd_tau)
        if kd_quantize:
            from x2i_tpu.ops.kd import quantize_kd_tensor
            return hidden, quantize_kd_tensor(attn)
        return hidden, attn


class FluxTransformer2D(nn.Module):
    """Top-level DiT (lightcontrol_flux.py:208-553)."""
    cfg: FluxConfig

    def _precompute_mods_scans(self, temb, nT: int):
        """mods_only tail: run ONLY the per-block adaLN denses over the
        (T*B, dim) all-steps temb, through the same named scans (so the
        same stacked params are read), and return per-step scan-xs mods.
        Why: at batch 1 each mod dense is an M=1 int8 matvec that XLA
        lowers as a bandwidth-bound dequant-reduce; recomputing it per
        denoise step re-reads every mod weight T times (~21.5 ms of the
        1254 ms 1024² 4-step image, measured via profile_generate
        --family elementwise). One M=T*B pass reads each weight once."""
        cfg = self.cfg
        carry = jnp.zeros((), cfg.dtype)
        _, (dmod, dcmod) = nn.scan(
            FluxDoubleBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            length=cfg.num_layers,
        )(cfg, False, True, name="double_blocks")(carry, temb)
        chunks = cfg.single_scan_chunks
        if chunks > 1:
            per = cfg.num_single_layers // chunks
            smod = jnp.concatenate([
                nn.scan(
                    FluxSingleBlock,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    in_axes=(nn.broadcast,),
                    length=per,
                )(cfg, False, True, name=f"single_blocks_{i}")(carry,
                                                               temb)[1]
                for i in range(chunks)], axis=0)
        else:
            _, smod = nn.scan(
                FluxSingleBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,),
                length=cfg.num_single_layers,
            )(cfg, False, True, name="single_blocks")(carry, temb)

        def tlb(y):                       # (L, T*B, D) -> (T, L, B, D)
            lyr, tb, d = y.shape
            return jnp.swapaxes(y.reshape(lyr, nT, tb // nT, d), 0, 1)

        return {"double_img": tlb(dmod), "double_txt": tlb(dcmod),
                "single": tlb(smod)}

    @nn.compact
    def __call__(self,
                 hidden_states: jnp.ndarray,        # (B, S_img, in_channels)
                 encoder_hidden_states: jnp.ndarray,  # (B, S_txt, joint_dim)
                 pooled_projections: jnp.ndarray,   # (B, pooled_dim)
                 timestep: jnp.ndarray,             # (B,) in [0, 1]
                 img_ids: jnp.ndarray,              # (S_img, 3)
                 txt_ids: jnp.ndarray,              # (S_txt, 3)
                 guidance: Optional[jnp.ndarray] = None,   # (B,) in [0, 1]
                 controls: Optional[jnp.ndarray] = None,   # (19, B, S_img, d)
                 return_attn_outputs: bool = False,
                 quantize_attn_outputs: bool = False,      # aux as int8
                 kd_targets: Optional[dict] = None,        # teacher aux
                 kd_temperature: float = 3.0,
                 aux_layout: str = "reference",
                 precomputed_mods: Optional[dict] = None,  # per-step adaLN
                 mods_only: bool = False):
        # aux_layout: "reference" = (B, L, S, D) KD stacks matching
        # train_minicpm.py:335-337; "scan" = the scan-native (L, B, S, D)
        # layout, which skips the transpose copies on both the teacher
        # emit and the student consume (use for the internal
        # teacher->student path; ~0.8 GB of int8 copies at full size).
        cfg = self.cfg
        dim = cfg.inner_dim
        dense = make_dense(cfg.quantized, cfg.dtype, cfg.param_dtype)

        if mods_only:
            # precompute-mods mode: `timestep` is the (T,) per-step sigma
            # vector; every block's adaLN dense runs ONCE over all T*B
            # temb rows (see _precompute_mods_scans). hidden/encoder
            # inputs are ignored.
            batch = pooled_projections.shape[0]
            nT = timestep.shape[0]
            t_flat = jnp.repeat(timestep, batch)              # (T*B,)
            pooled_rep = jnp.tile(pooled_projections, (nT, 1))
            guidance_rep = (None if guidance is None
                            else jnp.tile(guidance, nT))
        else:
            hidden = dense(dim, "x_embedder")(
                hidden_states.astype(cfg.dtype))
            encoder = dense(dim, "context_embedder")(
                encoder_hidden_states.astype(cfg.dtype))
            t_flat, pooled_rep, guidance_rep = (timestep,
                                                pooled_projections,
                                                guidance)

        temb = MLPEmbedder(dim, dim, cfg.dtype, cfg.param_dtype,
                           cfg.quantized, name="time_embedder")(
            timestep_embedding(t_flat * 1000.0, cfg.time_embed_dim)
            .astype(cfg.dtype))
        temb = temb + MLPEmbedder(dim, dim, cfg.dtype, cfg.param_dtype,
                                  cfg.quantized, name="pooled_embedder")(
            pooled_rep.astype(cfg.dtype))
        if cfg.guidance_embeds:
            if guidance is None:
                raise ValueError("guidance_embeds=True requires guidance")
            temb = temb + MLPEmbedder(dim, dim, cfg.dtype, cfg.param_dtype,
                                      cfg.quantized, name="guidance_embedder")(
                timestep_embedding(guidance_rep * 1000.0, cfg.time_embed_dim)
                .astype(cfg.dtype))

        if mods_only:
            return self._precompute_mods_scans(temb, timestep.shape[0])

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        if cfg.rope_layout == "half":
            cos, sin = flux_rope_freqs_half(ids, cfg.axes_dims_rope)
        else:
            cos, sin = flux_rope_freqs(ids, cfg.axes_dims_rope)
        rope = (cos, sin)

        DoubleBlock = FluxDoubleBlock
        SingleBlock = FluxSingleBlock
        if cfg.remat:
            DoubleBlock = nn.remat(DoubleBlock, prevent_cse=False,
                                   static_argnums=())
            SingleBlock = nn.remat(SingleBlock, prevent_cse=False,
                                   static_argnums=())
        # remat="stack": additionally remat around each whole scan so the
        # per-step carries (~28 MB x 57 blocks = 1.6 GB at the 4096-token
        # training point) become ephemeral temps of the chunk's backward
        # instead of staying live across the entire DiT backward. Costs one
        # extra forward recompute per stack; enables full-size phase-1
        # training on a single 16 GB chip.
        stack_remat = ((lambda m: nn.remat(m, prevent_cse=False))
                       if cfg.remat == "stack" else (lambda m: m))

        # Controls (LightControl) and inline-KD teacher targets are
        # consumed one-per-layer as scan xs; absent args broadcast as None.
        # kd_targets arrive in the reference (B, L, S, D) layout.
        control_axis = nn.broadcast if controls is None else 0
        if kd_targets is not None:
            # values may be dense (B, L, S, D) arrays or int8-quantized
            # (values, scales) tuples (ops/kd.quantize_kd_stacks); the
            # "single" entry may additionally be a LIST of per-chunk stacks
            # (produced by a single_scan_chunks>1 teacher) — kept separate
            # so the chunked student consumes each directly as scan xs
            # without slicing copies.
            if aux_layout == "scan":
                def swap(t):
                    return t
            else:
                def swap(t):
                    return jax.tree_util.tree_map(
                        lambda x: jnp.swapaxes(x, 0, 1), t)
            kd_double = (swap(kd_targets["double_img"]),
                         swap(kd_targets["double_txt"]))
            kd_single = kd_targets["single"]
            kd_single = ([swap(t) for t in kd_single]
                         if isinstance(kd_single, list) else
                         swap(kd_single))
            kd_axis = 0
        else:
            kd_double = kd_single = None
            kd_axis = nn.broadcast
        kd_quant = quantize_attn_outputs and kd_targets is None
        dmods_axis = nn.broadcast if precomputed_mods is None else 0
        dmods = (None if precomputed_mods is None else
                 (precomputed_mods["double_img"],
                  precomputed_mods["double_txt"]))
        (hidden, encoder), (img_attns, txt_attns) = stack_remat(nn.scan(
            DoubleBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast, nn.broadcast, control_axis, kd_axis,
                     nn.broadcast, dmods_axis),
            length=cfg.num_layers,
        ))(cfg, kd_quant, name="double_blocks")(
            (hidden, encoder), temb, rope, controls, kd_double,
            kd_temperature, dmods)

        joint = jnp.concatenate([encoder, hidden], axis=1)
        chunks = cfg.single_scan_chunks
        if chunks > 1:
            # sqrt-checkpointing: a python-unrolled loop over `chunks`
            # remat'd scans of num_single_layers/chunks blocks each. The
            # backward holds one chunk's carries (~chunks-fold less HBM
            # than a flat scan). Separately-named per-chunk param stacks
            # (single_blocks_0..) keep each remat unit's params program
            # ARGUMENTS — a scanned/sliced param stack would be a computed
            # value the remat must copy-save (+GBs at full size). Use
            # chunk_single_scan_params to convert flat checkpoints.
            assert cfg.num_single_layers % chunks == 0, (
                cfg.num_single_layers, chunks)
            per = cfg.num_single_layers // chunks

            def chunk_xs(t, i):
                if t is None:
                    return None
                if isinstance(t, list):          # per-chunk stacks: no copy
                    return t[i]
                return jax.tree_util.tree_map(
                    lambda x: x[i * per:(i + 1) * per], t)

            smods = (None if precomputed_mods is None
                     else precomputed_mods["single"])
            smods_axis = nn.broadcast if smods is None else 0
            ys = []
            for i in range(chunks):
                joint, y = stack_remat(nn.scan(
                    SingleBlock,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    in_axes=(nn.broadcast, nn.broadcast, kd_axis,
                             nn.broadcast, smods_axis),
                    length=per,
                ))(cfg, kd_quant, name=f"single_blocks_{i}")(
                    joint, temb, rope, chunk_xs(kd_single, i),
                    kd_temperature,
                    None if smods is None else smods[i * per:(i + 1) * per])
                ys.append(y)
            single_attns = ys                    # list of per-chunk ys
        else:
            smods = (None if precomputed_mods is None
                     else precomputed_mods["single"])
            smods_axis = nn.broadcast if smods is None else 0
            joint, single_attns = stack_remat(nn.scan(
                SingleBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, kd_axis, nn.broadcast,
                         smods_axis),
                length=cfg.num_single_layers,
            ))(cfg, kd_quant, name="single_blocks")(joint, temb, rope,
                                                    kd_single,
                                                    kd_temperature, smods)

        hidden = joint[:, encoder.shape[1]:, :]

        # AdaLayerNormContinuous: note scale-first chunk order in diffusers.
        norm_mod = dense(2 * dim, "norm_out")(nn.silu(temb))
        scale, shift = jnp.split(norm_mod, 2, axis=-1)
        head_fused = _use_fused_glue(cfg,
                                     None if kd_targets is None else
                                     kd_targets)
        if head_fused == "quant":
            from x2i_tpu.ops.fused_glue import ln_mod_quant
            head_in = ln_mod_quant(hidden, shift, scale)
        elif head_fused == "ln":
            from x2i_tpu.ops.fused_glue import ln_mod
            head_in = ln_mod(hidden, shift, scale)
        else:
            head_in = _modulate(layer_norm(hidden), shift, scale)
        output = dense(cfg.patch_size ** 2 * cfg.in_channels,
                       "proj_out")(head_in)

        if kd_targets is not None:
            # inline KD: ys were per-layer scalars (per-chunk list when
            # single_scan_chunks > 1)
            singles = (single_attns if isinstance(single_attns, list)
                       else [single_attns])
            kl_total = jnp.sum(img_attns) + jnp.sum(txt_attns)
            for y in singles:
                kl_total = kl_total + jnp.sum(y)
            return output, kl_total
        if return_attn_outputs:
            # Match the reference KD stacks' (B, L, S, D) layout
            # (train_minicpm.py:335-337). Quantized ys are (int8, scale)
            # pairs — swap both leaves. A chunked singles scan yields a
            # LIST of per-chunk stacks, kept unconcatenated so a chunked
            # student consumes them copy-free (see kd_targets above).
            if aux_layout == "scan":
                def swap(t):
                    return t
            else:
                def swap(t):
                    return jax.tree_util.tree_map(
                        lambda x: jnp.swapaxes(x, 0, 1), t)
            aux = {
                "double_img": swap(img_attns),
                "double_txt": swap(txt_attns),
                "single": ([swap(y) for y in single_attns]
                           if isinstance(single_attns, list)
                           else swap(single_attns)),
            }
            return output, aux
        return output


_QK_DENSE = ("q", "k", "img_q", "img_k", "txt_q", "txt_k")
_QK_NORM = ("q_norm", "k_norm", "img_q_norm", "img_k_norm",
            "txt_q_norm", "txt_k_norm")


def permute_params_to_half_rope(params: dict, cfg: FluxConfig) -> dict:
    """Interleaved-rope param tree -> half-rope layout (rope_layout="half").

    Permutes the per-head output channels of every q/k projection (Dense
    kernel/bias or QuantDense qkernel/scale/bias) and the per-channel
    qk-norm scales by ops/rope.py::half_layout_perm. Attention outputs
    are bit-identical in exact arithmetic — q.k scores are invariant to
    the shared permutation and v/out are untouched.
    """
    import numpy as np

    from x2i_tpu.ops.rope import half_layout_perm

    d = cfg.attention_head_dim
    perm = half_layout_perm(d)
    full = np.concatenate([h * d + perm
                           for h in range(cfg.num_attention_heads)])

    def walk(tree):
        out = {}
        for key, sub in tree.items():
            if key in _QK_DENSE:
                out[key] = {n: leaf[..., full] for n, leaf in sub.items()}
            elif key in _QK_NORM:
                out[key] = {n: leaf[..., perm] for n, leaf in sub.items()}
            elif isinstance(sub, dict):
                out[key] = walk(sub)
            else:
                out[key] = sub
        return out

    return walk(params)


def chunk_single_scan_params(params: dict, chunks: int) -> dict:
    """Split the flat (38, ...) single_blocks param stack into the
    per-chunk single_blocks_{i} stacks used when cfg.single_scan_chunks > 1
    (checkpoints are stored flat). Returns a new tree; chunks=1 no-ops."""
    if chunks <= 1:
        return params
    out = dict(params)
    out["params"] = dict(params["params"])
    sub = out["params"].pop("single_blocks")
    length = jax.tree_util.tree_leaves(sub)[0].shape[0]
    per = length // chunks
    for i in range(chunks):
        out["params"][f"single_blocks_{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i * per:(i + 1) * per], sub)
    return out


def _pad_layer_stack(tree, n_stages: int):
    """Pad a stacked (L, ...) layer tree to ceil(L/S)*S layers (zeros) and
    return (padded_tree_with_valid_flag, per_stage). Padded layers are
    masked to identity inside the pipeline stage scan."""
    length = jax.tree_util.tree_leaves(tree)[0].shape[0]
    per = -(-length // n_stages)
    pad = per * n_stages - length
    padded = jax.tree_util.tree_map(
        lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)), tree)
    valid = jnp.arange(per * n_stages) < length
    return {"p": padded, "valid": valid}, per


def flux_pipeline_forward(model: "FluxTransformer2D", params,
                          hidden_states, encoder_hidden_states,
                          pooled_projections, timestep, img_ids, txt_ids,
                          *, n_stages: int, axis_name: str = "stage",
                          guidance=None):
    """Pipeline-parallel FLUX forward (GPipe schedule) over the mesh
    `axis_name` axis — beyond-reference parallelism (SURVEY §2.6: the
    reference has DP + ZeRO only).

    The scan-stacked double/single block parameters shard on their layer
    axis across stages (parallel/pipeline.py); the batch splits into
    single-sample microbatches that stream through the ring. Embedders
    and the output head run replicated (they are <0.1% of FLOPs). Layer
    counts that do not divide n_stages (19 doubles) are zero-padded and
    masked to identity. Inference path (controls/KD aux unsupported);
    output equals model.apply to numerical precision — pinned by
    tests/test_flux.py::test_pipeline_parallel_matches_unsharded.
    """
    from x2i_tpu.parallel.pipeline import pipeline_apply

    cfg = model.cfg
    if cfg.single_scan_chunks > 1:
        raise ValueError("pipeline forward expects the flat single_blocks "
                         "stack (single_scan_chunks == 1)")
    p = params["params"] if "params" in params else params
    dim = cfg.inner_dim
    dense = make_dense(cfg.quantized, cfg.dtype, cfg.param_dtype)

    def app(name, mod, *x):
        return mod.apply({"params": p[name]}, *x)

    # --- embed (replicated; mirrors FluxTransformer2D.__call__ — the
    # equality test catches drift) ---
    hidden = app("x_embedder", dense(dim, "x"),
                 hidden_states.astype(cfg.dtype))
    encoder = app("context_embedder", dense(dim, "c"),
                  encoder_hidden_states.astype(cfg.dtype))
    emb = MLPEmbedder(dim, dim, cfg.dtype, cfg.param_dtype, cfg.quantized)
    temb = app("time_embedder", emb,
               timestep_embedding(timestep * 1000.0, cfg.time_embed_dim)
               .astype(cfg.dtype))
    temb = temb + app("pooled_embedder", emb,
                      pooled_projections.astype(cfg.dtype))
    if cfg.guidance_embeds:
        if guidance is None:
            raise ValueError("guidance_embeds=True requires guidance")
        temb = temb + app("guidance_embedder", emb,
                          timestep_embedding(guidance * 1000.0,
                                             cfg.time_embed_dim)
                          .astype(cfg.dtype))

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    if cfg.rope_layout == "half":
        rope = flux_rope_freqs_half(ids, cfg.axes_dims_rope)
    else:
        rope = flux_rope_freqs(ids, cfg.axes_dims_rope)

    # --- microbatch split: one sample per microbatch ---
    batch = hidden.shape[0]
    mb = lambda a: a.reshape((batch, 1) + a.shape[1:])

    dblock = FluxDoubleBlock(cfg, False)
    sblock = FluxSingleBlock(cfg, False)

    def masked_scan(block_apply, carry, chunk):
        def body(c, xs):
            lp, ok = xs
            new = block_apply(lp, c)
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, c), None
        return jax.lax.scan(body, carry, (chunk["p"], chunk["valid"]))[0]

    def d_stage(chunk, act):
        h, e, tb = act

        def apply_one(lp, c):
            (h2, e2), _ = dblock.apply({"params": lp}, (c[0], c[1]), tb,
                                       rope, None, None, 3.0)
            return (h2, e2)

        h, e = masked_scan(apply_one, (h, e), chunk)
        return (h, e, tb)

    def s_stage(chunk, act):
        x, tb = act

        def apply_one(lp, c):
            x2, _ = sblock.apply({"params": lp}, c, tb, rope, None, 3.0)
            return x2

        return masked_scan(lambda lp, c: apply_one(lp, c), x, chunk), tb

    d_params, _ = _pad_layer_stack(p["double_blocks"], n_stages)
    s_params, _ = _pad_layer_stack(p["single_blocks"], n_stages)

    h_mb, e_mb, t_mb = pipeline_apply(
        d_stage, d_params, (mb(hidden), mb(encoder), mb(temb)),
        axis_name=axis_name, n_stages=n_stages)
    joint = jnp.concatenate([e_mb, h_mb], axis=2)        # (M, 1, S, dim)
    joint, t_mb = pipeline_apply(
        s_stage, s_params, (joint, t_mb),
        axis_name=axis_name, n_stages=n_stages)

    s_txt = encoder.shape[1]
    hidden = joint.reshape((batch,) + joint.shape[2:])[:, s_txt:, :]
    temb = t_mb.reshape((batch,) + t_mb.shape[2:])

    # --- head (replicated) ---
    norm_mod = app("norm_out", dense(2 * dim, "n"), nn.silu(temb))
    scale, shift = jnp.split(norm_mod, 2, axis=-1)
    hidden = _modulate(layer_norm(hidden), shift, scale)
    return app("proj_out",
               dense(cfg.patch_size ** 2 * cfg.in_channels, "o"), hidden)
