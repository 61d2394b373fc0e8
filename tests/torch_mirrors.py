"""Diffusers-free torch transcriptions of the reference image-path modules.

The reference's FLUX DiT is a vendored diffusers-0.31 model
(/root/reference/lightcontrol/lightcontrol_flux.py:44-553) and its VAE is
diffusers AutoencoderKL (used at /root/reference/infer/inference_minicpm.py:
208-215 for decode and /root/reference/lightcontrol/train_lightcontrol.py:
676-680 for encode). diffusers is not installed in this environment, so the
reference modules cannot be imported directly; these mirrors transcribe the
exact forward semantics of the diffusers building blocks the reference
instantiates (AdaLayerNormZero/Single/Continuous, Attention +
FluxAttnProcessor2_0, FeedForward gelu-approximate, FluxPosEmbed,
Timesteps/TimestepEmbedding/PixArtAlphaTextProjection, ResnetBlock2D,
Downsample2D/Upsample2D) in plain torch.

Parameter names follow the diffusers state_dict conventions, so
``state_dict()`` of these mirrors feeds the repo's converters
(convert/torch_models.py::flux_params_from_diffusers,
convert/load.py::vae_params_from_diffusers / controlnext converters)
unchanged — the same path a real released checkpoint takes. The golden
tests (tests/test_flux_reference_golden.py, test_vae_reference_golden.py,
test_controlnext_reference_golden.py) pin the JAX models to these numerics.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# diffusers building blocks (transcribed semantics)
# ---------------------------------------------------------------------------


def get_timestep_embedding(timesteps: torch.Tensor, embedding_dim: int,
                           flip_sin_to_cos: bool = True,
                           downscale_freq_shift: float = 0.0,
                           max_period: int = 10000) -> torch.Tensor:
    """diffusers.models.embeddings.get_timestep_embedding (Timesteps)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        half_dim, dtype=torch.float32, device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 (diffusers TimestepEmbedding)."""

    def __init__(self, in_channels: int, time_embed_dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        return self.linear_2(F.silu(self.linear_1(sample)))


class PixArtAlphaTextProjection(nn.Module):
    def __init__(self, in_features: int, hidden_size: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_features, hidden_size)
        self.linear_2 = nn.Linear(hidden_size, hidden_size)

    def forward(self, caption):
        return self.linear_2(F.silu(self.linear_1(caption)))


class CombinedTimestepTextProjEmbeddings(nn.Module):
    """Timesteps(num_channels, True, 0) + TimestepEmbedding + text proj."""

    def __init__(self, embedding_dim: int, pooled_projection_dim: int,
                 num_channels: int = 256, guidance: bool = False):
        super().__init__()
        self.num_channels = num_channels
        self.timestep_embedder = TimestepEmbedding(num_channels,
                                                   embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(
            pooled_projection_dim, embedding_dim)
        if guidance:
            self.guidance_embedder = TimestepEmbedding(num_channels,
                                                       embedding_dim)

    def forward(self, timestep, pooled_projection, guidance=None):
        tproj = get_timestep_embedding(timestep, self.num_channels)
        emb = self.timestep_embedder(tproj.to(pooled_projection.dtype))
        if guidance is not None:
            gproj = get_timestep_embedding(guidance, self.num_channels)
            emb = emb + self.guidance_embedder(
                gproj.to(pooled_projection.dtype))
        return emb + self.text_embedder(pooled_projection)


class RMSNorm(nn.Module):
    """diffusers.models.normalization.RMSNorm (f32 stats)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        dtype = x.dtype
        var = x.float().pow(2).mean(-1, keepdim=True)
        x = x.float() * torch.rsqrt(var + self.eps)
        return (x * self.weight.float()).to(dtype)


class AdaLayerNormZero(nn.Module):
    """silu -> linear(6*dim); chunk (shift,scale,gate)x2; LN(affine-less)."""

    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        emb = self.linear(F.silu(emb))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = emb.chunk(6, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.linear = nn.Linear(dim, 3 * dim)
        self.norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, emb):
        emb = self.linear(F.silu(emb))
        shift_msa, scale_msa, gate_msa = emb.chunk(3, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa


class AdaLayerNormContinuous(nn.Module):
    """NOTE the (scale, shift) chunk order — scale FIRST (diffusers)."""

    def __init__(self, embedding_dim: int, conditioning_dim: int):
        super().__init__()
        self.linear = nn.Linear(conditioning_dim, 2 * embedding_dim)
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False,
                                 eps=1e-6)

    def forward(self, x, conditioning):
        emb = self.linear(F.silu(conditioning))
        scale, shift = torch.chunk(emb, 2, dim=1)
        return self.norm(x) * (1 + scale)[:, None, :] + shift[:, None, :]


class FeedForward(nn.Module):
    """gelu-approximate FeedForward: net.0.proj -> tanh-gelu -> net.2."""

    def __init__(self, dim: int, dim_out: int, mult: float = 4.0):
        super().__init__()
        inner = int(dim * mult)

        class GELUProj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, inner)

            def forward(self, x):
                return F.gelu(self.proj(x), approximate="tanh")

        self.net = nn.ModuleList(
            [GELUProj(), nn.Identity(), nn.Linear(inner, dim_out)])

    def forward(self, x):
        for mod in self.net:
            x = mod(x)
        return x


def rope_freqs(ids: torch.Tensor, axes_dim: Sequence[int],
               theta: float = 10000.0) -> Tuple[torch.Tensor, torch.Tensor]:
    """FluxPosEmbed: per-axis 1d rope tables (f64 freqs, diffusers default),
    repeat_interleave(2) to full dim, concatenated over axes."""
    pos = ids.float()
    coses, sins = [], []
    for i, dim in enumerate(axes_dim):
        freqs = 1.0 / (theta ** (
            torch.arange(0, dim, 2, dtype=torch.float64)[: dim // 2] / dim))
        ang = torch.outer(pos[:, i].double(), freqs)
        coses.append(ang.cos().repeat_interleave(2, dim=1).float())
        sins.append(ang.sin().repeat_interleave(2, dim=1).float())
    return torch.cat(coses, dim=-1), torch.cat(sins, dim=-1)


def apply_rotary_emb(x: torch.Tensor,
                     freqs: Tuple[torch.Tensor, torch.Tensor]):
    """diffusers apply_rotary_emb(use_real=True, use_real_unbind_dim=-1):
    interleaved pair rotation on (B, H, S, D)."""
    cos, sin = freqs
    cos, sin = cos[None, None], sin[None, None]
    x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
    return (x.float() * cos + x_rot.float() * sin).to(x.dtype)


class FluxAttention(nn.Module):
    """diffusers Attention(qk_norm='rms_norm') + FluxAttnProcessor2_0.

    pre_only=True is the single-block variant (no out projection);
    added_kv=True is the double-block joint attention (text stream comes
    in via add_{q,k,v}_proj and leaves via to_add_out). Text tokens are
    concatenated FIRST, matching the rope id order cat(txt_ids, img_ids).
    """

    def __init__(self, dim: int, heads: int, head_dim: int,
                 pre_only: bool = False, added_kv: bool = False,
                 eps: float = 1e-6):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, inner)
        self.to_k = nn.Linear(dim, inner)
        self.to_v = nn.Linear(dim, inner)
        self.norm_q = RMSNorm(head_dim, eps)
        self.norm_k = RMSNorm(head_dim, eps)
        if added_kv:
            self.add_q_proj = nn.Linear(dim, inner)
            self.add_k_proj = nn.Linear(dim, inner)
            self.add_v_proj = nn.Linear(dim, inner)
            self.norm_added_q = RMSNorm(head_dim, eps)
            self.norm_added_k = RMSNorm(head_dim, eps)
            self.to_add_out = nn.Linear(inner, dim)
        if not pre_only:
            self.to_out = nn.ModuleList([nn.Linear(inner, dim)])
        self.pre_only = pre_only

    def forward(self, hidden_states, encoder_hidden_states=None,
                image_rotary_emb=None):
        b = hidden_states.shape[0]

        def split(x):
            return x.view(b, -1, self.heads, self.head_dim).transpose(1, 2)

        q = self.norm_q(split(self.to_q(hidden_states)))
        k = self.norm_k(split(self.to_k(hidden_states)))
        v = split(self.to_v(hidden_states))
        if encoder_hidden_states is not None:
            eq = self.norm_added_q(split(
                self.add_q_proj(encoder_hidden_states)))
            ek = self.norm_added_k(split(
                self.add_k_proj(encoder_hidden_states)))
            ev = split(self.add_v_proj(encoder_hidden_states))
            q = torch.cat([eq, q], dim=2)
            k = torch.cat([ek, k], dim=2)
            v = torch.cat([ev, v], dim=2)
        if image_rotary_emb is not None:
            q = apply_rotary_emb(q, image_rotary_emb)
            k = apply_rotary_emb(k, image_rotary_emb)
        out = F.scaled_dot_product_attention(q, k, v, dropout_p=0.0,
                                             is_causal=False)
        out = out.transpose(1, 2).reshape(
            b, -1, self.heads * self.head_dim).to(q.dtype)
        if encoder_hidden_states is not None:
            s_txt = encoder_hidden_states.shape[1]
            ctx, out = out[:, :s_txt], out[:, s_txt:]
            return self.to_out[0](out), self.to_add_out(ctx)
        return out


# ---------------------------------------------------------------------------
# FLUX DiT mirror (lightcontrol_flux.py:44-553)
# ---------------------------------------------------------------------------


class MirrorFluxSingleBlock(nn.Module):
    """lightcontrol_flux.py:44-104."""

    def __init__(self, dim, heads, head_dim, mlp_ratio=4.0):
        super().__init__()
        self.mlp_hidden_dim = int(dim * mlp_ratio)
        self.norm = AdaLayerNormZeroSingle(dim)
        self.proj_mlp = nn.Linear(dim, self.mlp_hidden_dim)
        self.proj_out = nn.Linear(dim + self.mlp_hidden_dim, dim)
        self.attn = FluxAttention(dim, heads, head_dim, pre_only=True)

    def forward(self, hidden_states, temb, image_rotary_emb):
        residual = hidden_states
        norm_hidden, gate = self.norm(hidden_states, emb=temb)
        mlp = F.gelu(self.proj_mlp(norm_hidden), approximate="tanh")
        attn_output = self.attn(norm_hidden,
                                image_rotary_emb=image_rotary_emb)
        hidden_states = torch.cat([attn_output, mlp], dim=2)
        hidden_states = gate.unsqueeze(1) * self.proj_out(hidden_states)
        return residual + hidden_states, attn_output


class MirrorFluxDoubleBlock(nn.Module):
    """lightcontrol_flux.py:108-204."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = AdaLayerNormZero(dim)
        self.attn = FluxAttention(dim, heads, head_dim, added_kv=True)
        self.norm2 = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        self.ff = FeedForward(dim, dim)
        self.norm2_context = nn.LayerNorm(dim, elementwise_affine=False,
                                          eps=1e-6)
        self.ff_context = FeedForward(dim, dim)

    def forward(self, hidden_states, encoder_hidden_states, temb,
                image_rotary_emb):
        norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(
            hidden_states, emb=temb)
        norm_e, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = (
            self.norm1_context(encoder_hidden_states, emb=temb))
        attn_output, context_attn_output = self.attn(
            norm_h, encoder_hidden_states=norm_e,
            image_rotary_emb=image_rotary_emb)

        hidden_states = hidden_states + gate_msa.unsqueeze(1) * attn_output
        norm_h = self.norm2(hidden_states)
        norm_h = norm_h * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        hidden_states = hidden_states + gate_mlp.unsqueeze(1) * self.ff(
            norm_h)

        encoder_hidden_states = (encoder_hidden_states
                                 + c_gate_msa.unsqueeze(1)
                                 * context_attn_output)
        norm_e = self.norm2_context(encoder_hidden_states)
        norm_e = norm_e * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        encoder_hidden_states = (encoder_hidden_states
                                 + c_gate_mlp.unsqueeze(1)
                                 * self.ff_context(norm_e))
        return encoder_hidden_states, hidden_states, attn_output, \
            context_attn_output


class MirrorFluxTransformer2D(nn.Module):
    """lightcontrol_flux.py:208-553 incl. LightControl injection (:504-507).

    state_dict() keys match diffusers FluxTransformer2DModel, so
    flux_params_from_diffusers consumes it unchanged.
    """

    def __init__(self, patch_size=1, in_channels=64, num_layers=19,
                 num_single_layers=38, attention_head_dim=128,
                 num_attention_heads=24, joint_attention_dim=4096,
                 pooled_projection_dim=768, guidance_embeds=False,
                 axes_dims_rope=(16, 56, 56), time_embed_channels=256):
        super().__init__()
        self.axes_dims_rope = tuple(axes_dims_rope)
        self.guidance_embeds = guidance_embeds
        inner = num_attention_heads * attention_head_dim
        self.inner_dim = inner
        self.time_text_embed = CombinedTimestepTextProjEmbeddings(
            inner, pooled_projection_dim, num_channels=time_embed_channels,
            guidance=guidance_embeds)
        self.context_embedder = nn.Linear(joint_attention_dim, inner)
        self.x_embedder = nn.Linear(in_channels, inner)
        self.transformer_blocks = nn.ModuleList([
            MirrorFluxDoubleBlock(inner, num_attention_heads,
                                  attention_head_dim)
            for _ in range(num_layers)])
        self.single_transformer_blocks = nn.ModuleList([
            MirrorFluxSingleBlock(inner, num_attention_heads,
                                  attention_head_dim)
            for _ in range(num_single_layers)])
        self.norm_out = AdaLayerNormContinuous(inner, inner)
        self.proj_out = nn.Linear(inner,
                                  patch_size * patch_size * in_channels)

    def forward(self, hidden_states, encoder_hidden_states,
                pooled_projections, timestep, img_ids, txt_ids,
                guidance=None, guided_hint=None,
                control_nets: Optional[List[nn.Module]] = None,
                collect_attn: bool = False):
        """timestep/guidance on the [0, 1] scale (the reference multiplies
        by 1000 internally, lightcontrol_flux.py:447-449)."""
        hidden_states = self.x_embedder(hidden_states)
        timestep = timestep.to(hidden_states.dtype) * 1000
        if guidance is not None:
            guidance = guidance.to(hidden_states.dtype) * 1000
        temb = self.time_text_embed(timestep, pooled_projections, guidance)
        encoder_hidden_states = self.context_embedder(encoder_hidden_states)

        ids = torch.cat((txt_ids, img_ids), dim=0)
        image_rotary_emb = rope_freqs(ids, self.axes_dims_rope)

        aux = {"double_img": [], "double_txt": [], "single": []}
        control_nets = control_nets or []
        for index_block, block in enumerate(self.transformer_blocks):
            encoder_hidden_states, hidden_states, a_img, a_txt = block(
                hidden_states, encoder_hidden_states, temb,
                image_rotary_emb)
            if collect_attn:
                aux["double_img"].append(a_img)
                aux["double_txt"].append(a_txt)
            if index_block < len(control_nets):
                control = control_nets[index_block](guided_hint, timestep)
                out = control["out"].flatten(2).transpose(1, 2).to(
                    hidden_states.dtype)
                hidden_states = hidden_states + out * control["scale"]

        hidden_states = torch.cat([encoder_hidden_states, hidden_states],
                                  dim=1)
        for block in self.single_transformer_blocks:
            hidden_states, a = block(hidden_states, temb, image_rotary_emb)
            if collect_attn:
                aux["single"].append(a)

        hidden_states = hidden_states[:, encoder_hidden_states.shape[1]:]
        hidden_states = self.norm_out(hidden_states, temb)
        output = self.proj_out(hidden_states)
        if collect_attn:
            return output, {k: torch.stack(v, dim=1)
                            for k, v in aux.items()}
        return output


# ---------------------------------------------------------------------------
# ControlNeXt mirror (lightcontrol_flux.py:575-749)
# ---------------------------------------------------------------------------


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D, default config (swish, time add after
    conv1, eps 1e-6, output_scale_factor 1)."""

    def __init__(self, in_channels, out_channels, temb_channels=None,
                 groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_channels, eps=1e-6)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, 1, 1)
        if temb_channels is not None:
            self.time_emb_proj = nn.Linear(temb_channels, out_channels)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(groups, out_channels, eps=1e-6)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, 1, 1)
        if in_channels != out_channels:
            self.conv_shortcut = nn.Conv2d(in_channels, out_channels, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and self.time_emb_proj is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Downsample2D(nn.Module):
    """diffusers Downsample2D(use_conv=True): stride-2 3x3 conv; with
    padding=0 an asymmetric (0,1,0,1) pad is applied first (VAE)."""

    def __init__(self, channels, out_channels=None, padding=1):
        super().__init__()
        self.padding = padding
        self.conv = nn.Conv2d(channels, out_channels or channels, 3,
                              stride=2, padding=padding)

    def forward(self, x, *args):
        if self.padding == 0:
            x = F.pad(x, (0, 1, 0, 1), mode="constant", value=0)
        return self.conv(x)


class MirrorControlNeXt(nn.Module):
    """lightcontrol_flux.py:575-749. state_dict() keys match the reference
    ControlNeXtModel (what train_lightcontrol.py:785-791 checkpoints)."""

    def __init__(self, in_channels=(128, 128), out_channels=(128, 256),
                 groups=(4, 8), time_embed_dim=256,
                 final_out_channels=3072):
        super().__init__()
        self.time_embedding = TimestepEmbedding(128, time_embed_dim)
        self.embedding = nn.Sequential(
            nn.Conv2d(3, 64, kernel_size=3, stride=2, padding=1),
            nn.GroupNorm(2, 64), nn.ReLU(),
            nn.Conv2d(64, 64, kernel_size=3, padding=1),
            nn.GroupNorm(2, 64), nn.ReLU(),
            nn.Conv2d(64, 128, kernel_size=3, padding=1),
            nn.GroupNorm(2, 128), nn.ReLU())
        self.down_res = nn.ModuleList()
        self.down_sample = nn.ModuleList()
        for i in range(len(in_channels)):
            self.down_res.append(ResnetBlock2D(
                in_channels[i], out_channels[i],
                temb_channels=time_embed_dim, groups=groups[i]))
            self.down_sample.append(Downsample2D(
                out_channels[i], out_channels[i], padding=1))
        self.mid_convs = nn.ModuleList()
        self.mid_convs.append(nn.Sequential(
            nn.Conv2d(out_channels[-1], out_channels[-1], 3, 1, 1),
            nn.ReLU(),
            nn.GroupNorm(8, out_channels[-1]),
            nn.Conv2d(out_channels[-1], out_channels[-1], 3, 1, 1),
            nn.GroupNorm(8, out_channels[-1])))
        self.mid_convs.append(nn.Conv2d(out_channels[-1],
                                        final_out_channels, 2, 2))
        self.scale = 1.0

    def forward(self, sample, timestep):
        """timestep on the 0..1000 scale (the DiT forward multiplies t by
        1000 before calling the control branch, lightcontrol_flux.py:447,
        505)."""
        timesteps = timestep.expand(sample.shape[0])
        t_emb = get_timestep_embedding(timesteps, 128).to(sample.dtype)
        emb = self.time_embedding(t_emb)
        sample = self.embedding(sample)
        for res, downsample in zip(self.down_res, self.down_sample):
            sample = res(sample, emb)
            sample = downsample(sample, emb)
        sample = self.mid_convs[0](sample) + sample
        sample = self.mid_convs[1](sample)
        return {"out": sample, "scale": self.scale}


# ---------------------------------------------------------------------------
# AutoencoderKL mirror (diffusers; decode at inference_minicpm.py:208-215,
# encode at train_lightcontrol.py:676-680)
# ---------------------------------------------------------------------------


class _VAEAttention(nn.Module):
    """Single-head spatial self-attention of the VAE mid block (diffusers
    Attention with residual_connection=True, heads=1, dim_head=C)."""

    def __init__(self, channels, norm_num_groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(norm_num_groups, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])

    def forward(self, x):
        residual = x
        b, c, h, w = x.shape
        y = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q = self.to_q(y)[:, None]          # (B, 1 head, HW, C)
        k = self.to_k(y)[:, None]
        v = self.to_v(y)[:, None]
        o = F.scaled_dot_product_attention(q, k, v)[:, 0]
        o = self.to_out[0](o)
        return residual + o.transpose(1, 2).view(b, c, h, w)


class _MidBlock(nn.Module):
    def __init__(self, channels, norm_num_groups, use_attention=True):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(channels, channels, groups=norm_num_groups),
            ResnetBlock2D(channels, channels, groups=norm_num_groups)])
        self.attentions = nn.ModuleList(
            [_VAEAttention(channels, norm_num_groups)]
            if use_attention else [])

    def forward(self, x):
        x = self.resnets[0](x)
        if self.attentions:
            x = self.attentions[0](x)
        return self.resnets[1](x)


class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch,
                          groups=groups) for j in range(layers)])
        self.downsamplers = nn.ModuleList(
            [Downsample2D(out_ch, out_ch, padding=0)]
            if add_downsample else [])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        for d in self.downsamplers:
            x = d(x)
        return x


class _Upsample2D(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class _UpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_ch if j == 0 else out_ch, out_ch,
                          groups=groups) for j in range(layers)])
        self.upsamplers = nn.ModuleList(
            [_Upsample2D(out_ch)] if add_upsample else [])

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        for u in self.upsamplers:
            x = u(x)
        return x


class MirrorEncoder(nn.Module):
    def __init__(self, in_channels, block_out_channels, layers_per_block,
                 norm_num_groups, latent_channels, use_mid_attention):
        super().__init__()
        ch = block_out_channels
        self.conv_in = nn.Conv2d(in_channels, ch[0], 3, padding=1)
        self.down_blocks = nn.ModuleList([
            _DownBlock(ch[max(i - 1, 0)], ch[i], layers_per_block,
                       norm_num_groups, add_downsample=i < len(ch) - 1)
            for i in range(len(ch))])
        self.mid_block = _MidBlock(ch[-1], norm_num_groups,
                                   use_mid_attention)
        self.conv_norm_out = nn.GroupNorm(norm_num_groups, ch[-1],
                                          eps=1e-6)
        self.conv_out = nn.Conv2d(ch[-1], 2 * latent_channels, 3,
                                  padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class MirrorDecoder(nn.Module):
    def __init__(self, out_channels, block_out_channels, layers_per_block,
                 norm_num_groups, latent_channels, use_mid_attention):
        super().__init__()
        rev = list(reversed(block_out_channels))
        self.conv_in = nn.Conv2d(latent_channels, rev[0], 3, padding=1)
        self.mid_block = _MidBlock(rev[0], norm_num_groups,
                                   use_mid_attention)
        self.up_blocks = nn.ModuleList([
            _UpBlock(rev[max(i - 1, 0)], rev[i], layers_per_block + 1,
                     norm_num_groups, add_upsample=i < len(rev) - 1)
            for i in range(len(rev))])
        self.conv_norm_out = nn.GroupNorm(norm_num_groups, rev[-1],
                                          eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], out_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class MirrorAutoencoderKL(nn.Module):
    """FLUX AutoencoderKL (no quant convs). state_dict() keys match
    diffusers, so vae_params_from_diffusers consumes it unchanged."""

    def __init__(self, in_channels=3, out_channels=3,
                 block_out_channels=(128, 256, 512, 512),
                 layers_per_block=2, latent_channels=16,
                 norm_num_groups=32, scaling_factor=0.3611,
                 shift_factor=0.1159, use_mid_attention=True):
        super().__init__()
        self.scaling_factor = scaling_factor
        self.shift_factor = shift_factor
        self.encoder = MirrorEncoder(in_channels, block_out_channels,
                                     layers_per_block, norm_num_groups,
                                     latent_channels, use_mid_attention)
        self.decoder = MirrorDecoder(out_channels, block_out_channels,
                                     layers_per_block, norm_num_groups,
                                     latent_channels, use_mid_attention)

    def encode_mode(self, pixels):
        """Deterministic (mode) encode + FLUX scale/shift
        (train_lightcontrol.py:676-680)."""
        moments = self.encoder(pixels)
        mean = moments.chunk(2, dim=1)[0]
        return (mean - self.shift_factor) * self.scaling_factor

    def decode(self, z):
        """inference_minicpm.py:208-212 unscale + decode."""
        return self.decoder(z / self.scaling_factor + self.shift_factor)
