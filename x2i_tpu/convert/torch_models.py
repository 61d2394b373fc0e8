"""Torch/HF checkpoint -> x2i_tpu parameter-tree converters.

The reference loads everything from HF checkpoints (safetensors / .bin);
here each converter maps a torch state_dict to the corresponding flax param
tree, stacking per-layer weights along axis 0 for the nn.scan'd blocks and
transposing torch Linear (out, in) to flax (in, out). Tensors are accepted
as numpy arrays or torch tensors.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from x2i_tpu.core.config import FluxConfig, ProjConfig, Qwen2Config


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        if t.dtype is not None and str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def _lin(sd: Mapping, name: str) -> np.ndarray:
    return _np(sd[name]).T                       # (out,in) -> (in,out)


def _stack(sd: Mapping, fmt: str, n: int, transpose=True) -> np.ndarray:
    mats = [_np(sd[fmt.format(i=i)]) for i in range(n)]
    if transpose:
        mats = [m.T for m in mats]
    return np.stack(mats, axis=0)


def qwen2_params_from_hf(sd: Mapping, cfg: Qwen2Config) -> Dict:
    """HF Qwen2ForCausalLM state_dict -> Qwen2LM params."""
    L = cfg.num_hidden_layers
    p = "model.layers.{i}."
    block = {
        "input_norm": {"scale": _stack(sd, p + "input_layernorm.weight", L,
                                       transpose=False)},
        "post_attn_norm": {"scale": _stack(
            sd, p + "post_attention_layernorm.weight", L, transpose=False)},
        "q_proj": {"kernel": _stack(sd, p + "self_attn.q_proj.weight", L),
                   "bias": _stack(sd, p + "self_attn.q_proj.bias", L,
                                  transpose=False)},
        "k_proj": {"kernel": _stack(sd, p + "self_attn.k_proj.weight", L),
                   "bias": _stack(sd, p + "self_attn.k_proj.bias", L,
                                  transpose=False)},
        "v_proj": {"kernel": _stack(sd, p + "self_attn.v_proj.weight", L),
                   "bias": _stack(sd, p + "self_attn.v_proj.bias", L,
                                  transpose=False)},
        "o_proj": {"kernel": _stack(sd, p + "self_attn.o_proj.weight", L)},
        "gate_proj": {"kernel": _stack(sd, p + "mlp.gate_proj.weight", L)},
        "up_proj": {"kernel": _stack(sd, p + "mlp.up_proj.weight", L)},
        "down_proj": {"kernel": _stack(sd, p + "mlp.down_proj.weight", L)},
    }
    params = {
        "embed_tokens": {"embedding": _np(sd["model.embed_tokens.weight"])},
        "layers": {"block": block},
        "final_norm": {"scale": _np(sd["model.norm.weight"])},
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": _lin(sd, "lm_head.weight")}
    return params


def proj_params_from_reference(sd: Mapping, cfg: ProjConfig) -> Dict:
    """Reference proj checkpoint (utils/proj.py state_dict, DDP 'module.'
    prefix already stripped) -> Proj params."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    p: Dict = {}
    if cfg.use_scale:
        p["cha_scale"] = _np(sd["cha_scale"])
    elif cfg.use_cnn:
        p["conv"] = {"kernel": _np(sd["conv.weight"]).transpose(2, 3, 1, 0),
                     "bias": _np(sd["conv.bias"])}
    p["ln_scale"] = _np(sd["mlp.layernorm.weight"])
    p["ln_bias"] = _np(sd["mlp.layernorm.bias"])
    p["proj_in"] = {"kernel": _np(sd["mlp.projector.0.weight"]).T}
    p["proj_out"] = {"kernel": _np(sd["mlp.projector.2.weight"]).T}
    p["pooled_out"] = {"kernel": _np(sd["mlp.fc.1.weight"]).T,
                       "bias": _np(sd["mlp.fc.1.bias"])}
    return p


def internlm2_params_from_hf(sd: Mapping, cfg: Qwen2Config) -> Dict:
    """InternLM2 state dict -> Qwen2LM params (InternVL2.5-2B/8B-class
    checkpoints; reference model_internvl/internvl/modeling_internlm2.py).

    InternLM2 packs qkv as wqkv with rows grouped (h_kv, g+2, d): per
    kv-head, g query heads then k then v (modeling_internlm2.py:359-372) —
    deinterleaved here; q-head order (kv_head*g + j) matches our GQA
    mapping h -> h // g. Use cfg.attention_bias=False / tie=False.
    """
    L = cfg.num_hidden_layers
    h, hk, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                cfg.head_dim)
    g = h // hk
    hidden = cfg.hidden_size

    def split_wqkv(i):
        w = _np(sd[f"model.layers.{i}.attention.wqkv.weight"])  # (out, in)
        w = w.reshape(hk, g + 2, d, hidden)
        q = w[:, :g].reshape(h * d, hidden)
        k = w[:, -2].reshape(hk * d, hidden)
        v = w[:, -1].reshape(hk * d, hidden)
        return q.T, k.T, v.T

    qs, ks, vs = zip(*(split_wqkv(i) for i in range(L)))
    p = "model.layers.{i}."
    block = {
        "input_norm": {"scale": _stack(sd, p + "attention_norm.weight", L,
                                       transpose=False)},
        "post_attn_norm": {"scale": _stack(sd, p + "ffn_norm.weight", L,
                                           transpose=False)},
        "q_proj": {"kernel": np.stack(qs)},
        "k_proj": {"kernel": np.stack(ks)},
        "v_proj": {"kernel": np.stack(vs)},
        "o_proj": {"kernel": _stack(sd, p + "attention.wo.weight", L)},
        "gate_proj": {"kernel": _stack(sd, p + "feed_forward.w1.weight",
                                       L)},
        "up_proj": {"kernel": _stack(sd, p + "feed_forward.w3.weight", L)},
        "down_proj": {"kernel": _stack(sd, p + "feed_forward.w2.weight",
                                       L)},
    }
    params = {
        "embed_tokens": {"embedding": _np(sd["model.tok_embeddings"
                                             ".weight"])},
        "layers": {"block": block},
        "final_norm": {"scale": _np(sd["model.norm.weight"])},
    }
    if "output.weight" in sd:
        params["lm_head"] = {"kernel": _lin(sd, "output.weight")}
    return params


def siglip_params_from_hf(sd: Mapping, num_layers: int,
                          prefix: str = "vision_model.") -> Dict:
    """HF/NaViT SigLIP vision state dict -> SiglipVisionTransformer params.
    num_layers = layers actually used (MiniCPM drops the last one). The
    patch conv (d, 3, ps, ps) flattens to a Dense kernel with (c, py, px)
    pixel order, matching data/minicpm_vision.patchify_siglip."""
    p = prefix + "encoder.layers.{i}."

    def lin_stack(fmt):
        return {"kernel": _stack(sd, fmt + ".weight", num_layers),
                "bias": _stack(sd, fmt + ".bias", num_layers,
                               transpose=False)}

    def ln_stack(fmt):
        return {"scale": _stack(sd, fmt + ".weight", num_layers,
                                transpose=False),
                "bias": _stack(sd, fmt + ".bias", num_layers,
                               transpose=False)}

    block = {
        "ln1": ln_stack(p + "layer_norm1"),
        "ln2": ln_stack(p + "layer_norm2"),
        "q": lin_stack(p + "self_attn.q_proj"),
        "k": lin_stack(p + "self_attn.k_proj"),
        "v": lin_stack(p + "self_attn.v_proj"),
        "o": lin_stack(p + "self_attn.out_proj"),
        "fc1": lin_stack(p + "mlp.fc1"),
        "fc2": lin_stack(p + "mlp.fc2"),
    }
    pw = _np(sd[prefix + "embeddings.patch_embedding.weight"])
    d = pw.shape[0]
    return {
        "patch_embedding": {"kernel": pw.reshape(d, -1).T,
                            "bias": _np(sd[prefix + "embeddings."
                                           "patch_embedding.bias"])},
        "position_embedding": {"embedding": _np(
            sd[prefix + "embeddings.position_embedding.weight"])},
        "block": block,
        "post_layernorm": {
            "scale": _np(sd[prefix + "post_layernorm.weight"]),
            "bias": _np(sd[prefix + "post_layernorm.bias"])},
    }


def whisper_params_from_hf(sd: Mapping, num_layers: int,
                           prefix: str = "") -> Dict:
    """HF WhisperEncoder state dict -> WhisperEncoder params. Conv1d
    (out, in, k) -> flax Conv (k, in, out)."""
    p = prefix + "layers.{i}."

    def lin_stack(fmt, bias=True):
        out = {"kernel": _stack(sd, fmt + ".weight", num_layers)}
        if bias:
            out["bias"] = _stack(sd, fmt + ".bias", num_layers,
                                 transpose=False)
        return out

    def ln_stack(fmt):
        return {"scale": _stack(sd, fmt + ".weight", num_layers,
                                transpose=False),
                "bias": _stack(sd, fmt + ".bias", num_layers,
                               transpose=False)}

    block = {
        "attn_ln": ln_stack(p + "self_attn_layer_norm"),
        "ffn_ln": ln_stack(p + "final_layer_norm"),
        "q": lin_stack(p + "self_attn.q_proj"),
        "k": lin_stack(p + "self_attn.k_proj", bias=False),
        "v": lin_stack(p + "self_attn.v_proj"),
        "o": lin_stack(p + "self_attn.out_proj"),
        "fc1": lin_stack(p + "fc1"),
        "fc2": lin_stack(p + "fc2"),
    }
    return {
        "conv1": {"kernel": _np(sd[prefix + "conv1.weight"])
                  .transpose(2, 1, 0),
                  "bias": _np(sd[prefix + "conv1.bias"])},
        "conv2": {"kernel": _np(sd[prefix + "conv2.weight"])
                  .transpose(2, 1, 0),
                  "bias": _np(sd[prefix + "conv2.bias"])},
        "block": block,
        "final_ln": {"scale": _np(sd[prefix + "layer_norm.weight"]),
                     "bias": _np(sd[prefix + "layer_norm.bias"])},
    }


def resampler_params_from_reference(sd: Mapping, embed_dim: int,
                                    prefix: str = "") -> Dict:
    """Reference Resampler state dict (torch MultiheadAttention packed
    in-proj) -> models.resampler.Resampler params."""
    d = embed_dim
    in_w = _np(sd[prefix + "attn.in_proj_weight"])       # (3d, d)
    in_b = _np(sd[prefix + "attn.in_proj_bias"])         # (3d,)
    out = {
        "query": _np(sd[prefix + "query"]),
        "ln_q": {"scale": _np(sd[prefix + "ln_q.weight"]),
                 "bias": _np(sd[prefix + "ln_q.bias"])},
        "ln_kv": {"scale": _np(sd[prefix + "ln_kv.weight"]),
                  "bias": _np(sd[prefix + "ln_kv.bias"])},
        "ln_post": {"scale": _np(sd[prefix + "ln_post.weight"]),
                    "bias": _np(sd[prefix + "ln_post.bias"])},
        "proj": _np(sd[prefix + "proj"]),
        "in_proj_q": {"kernel": in_w[:d].T, "bias": in_b[:d]},
        "in_proj_k": {"kernel": in_w[d:2 * d].T, "bias": in_b[d:2 * d]},
        "in_proj_v": {"kernel": in_w[2 * d:].T, "bias": in_b[2 * d:]},
        "out_proj": {"kernel": _np(sd[prefix + "attn.out_proj.weight"]).T,
                     "bias": _np(sd[prefix + "attn.out_proj.bias"])},
    }
    if prefix + "kv_proj.weight" in sd:
        out["kv_proj"] = {"kernel": _np(sd[prefix + "kv_proj.weight"]).T}
    return out


def qwen2_5_vl_vision_params_from_hf(sd: Mapping, depth: int,
                                     prefix: str = "visual.") -> Dict:
    """HF Qwen2.5-VL vision tower state dict -> QwenVisionTransformer
    params. The Conv3d patch embed becomes a Dense over the flattened
    patch (weight (E, C, tps, ps, ps) -> kernel (C*tps*ps^2, E))."""
    p = prefix + "blocks.{i}."

    def lin_stack(fmt, bias=True):
        out = {"kernel": _stack(sd, fmt + ".weight", depth)}
        if bias:
            out["bias"] = _stack(sd, fmt + ".bias", depth, transpose=False)
        return out

    block = {
        "norm1": {"scale": _stack(sd, p + "norm1.weight", depth,
                                  transpose=False)},
        "norm2": {"scale": _stack(sd, p + "norm2.weight", depth,
                                  transpose=False)},
        "qkv": lin_stack(p + "attn.qkv"),
        "proj": lin_stack(p + "attn.proj"),
        "gate_proj": lin_stack(p + "mlp.gate_proj"),
        "up_proj": lin_stack(p + "mlp.up_proj"),
        "down_proj": lin_stack(p + "mlp.down_proj"),
    }
    pe = _np(sd[prefix + "patch_embed.proj.weight"])
    return {
        "patch_embed": {"kernel": pe.reshape(pe.shape[0], -1).T},
        "block": block,
        "ln_q": {"scale": _np(sd[prefix + "merger.ln_q.weight"])},
        "merger_fc1": {"kernel": _np(sd[prefix + "merger.mlp.0.weight"]).T,
                       "bias": _np(sd[prefix + "merger.mlp.0.bias"])},
        "merger_fc2": {"kernel": _np(sd[prefix + "merger.mlp.2.weight"]).T,
                       "bias": _np(sd[prefix + "merger.mlp.2.bias"])},
    }


def t5_params_from_hf(sd: Mapping, num_layers: int) -> Dict:
    """HF T5EncoderModel state_dict -> T5Encoder params."""
    p = "encoder.block.{i}.layer."
    block = {
        "attn_norm": {"scale": _stack(sd, p + "0.layer_norm.weight",
                                      num_layers, transpose=False)},
        "q": {"kernel": _stack(sd, p + "0.SelfAttention.q.weight",
                               num_layers)},
        "k": {"kernel": _stack(sd, p + "0.SelfAttention.k.weight",
                               num_layers)},
        "v": {"kernel": _stack(sd, p + "0.SelfAttention.v.weight",
                               num_layers)},
        "o": {"kernel": _stack(sd, p + "0.SelfAttention.o.weight",
                               num_layers)},
        "ff_norm": {"scale": _stack(sd, p + "1.layer_norm.weight",
                                    num_layers, transpose=False)},
        "wi_0": {"kernel": _stack(sd, p + "1.DenseReluDense.wi_0.weight",
                                  num_layers)},
        "wi_1": {"kernel": _stack(sd, p + "1.DenseReluDense.wi_1.weight",
                                  num_layers)},
        "wo": {"kernel": _stack(sd, p + "1.DenseReluDense.wo.weight",
                                num_layers)},
    }
    return {
        "shared": {"embedding": _np(sd["shared.weight"])},
        "encoder": {
            "block": block,
            "rel_bias": _np(sd[
                "encoder.block.0.layer.0.SelfAttention."
                "relative_attention_bias.weight"]),
            "final_norm": {"scale": _np(sd["encoder.final_layer_norm"
                                           ".weight"])},
        },
    }


def clip_vision_params_from_hf(sd: Mapping, num_layers: int,
                               prefix: str = "vision_model.") -> Dict:
    """HF CLIPVisionModel state dict -> CLIPVisionEncoder params."""
    p = prefix + "encoder.layers.{i}."

    def lin_stack(fmt):
        return {"kernel": _stack(sd, fmt + ".weight", num_layers),
                "bias": _stack(sd, fmt + ".bias", num_layers,
                               transpose=False)}

    def ln_stack(fmt):
        return {"scale": _stack(sd, fmt + ".weight", num_layers,
                                transpose=False),
                "bias": _stack(sd, fmt + ".bias", num_layers,
                               transpose=False)}

    block = {
        "ln1": ln_stack(p + "layer_norm1"),
        "ln2": ln_stack(p + "layer_norm2"),
        "q": lin_stack(p + "self_attn.q_proj"),
        "k": lin_stack(p + "self_attn.k_proj"),
        "v": lin_stack(p + "self_attn.v_proj"),
        "o": lin_stack(p + "self_attn.out_proj"),
        "fc1": lin_stack(p + "mlp.fc1"),
        "fc2": lin_stack(p + "mlp.fc2"),
    }
    return {
        "patch_embedding": {"kernel": _np(
            sd[prefix + "embeddings.patch_embedding.weight"])
            .transpose(2, 3, 1, 0)},
        "class_embedding": _np(sd[prefix + "embeddings.class_embedding"]),
        "position_embedding": _np(
            sd[prefix + "embeddings.position_embedding.weight"]),
        "pre_layernorm": {
            "scale": _np(sd[prefix + "pre_layrnorm.weight"]),
            "bias": _np(sd[prefix + "pre_layrnorm.bias"])},
        "block": block,
        "post_layernorm": {
            "scale": _np(sd[prefix + "post_layernorm.weight"]),
            "bias": _np(sd[prefix + "post_layernorm.bias"])},
    }


def clip_params_from_hf(sd: Mapping, num_layers: int) -> Dict:
    """HF CLIPTextModel state_dict -> CLIPTextEncoder params."""
    p = "text_model.encoder.layers.{i}."

    def lin_stack(fmt):
        return {"kernel": _stack(sd, fmt + ".weight", num_layers),
                "bias": _stack(sd, fmt + ".bias", num_layers,
                               transpose=False)}

    def ln_stack(fmt):
        return {"scale": _stack(sd, fmt + ".weight", num_layers,
                                transpose=False),
                "bias": _stack(sd, fmt + ".bias", num_layers,
                               transpose=False)}

    block = {
        "ln1": ln_stack(p + "layer_norm1"),
        "ln2": ln_stack(p + "layer_norm2"),
        "q": lin_stack(p + "self_attn.q_proj"),
        "k": lin_stack(p + "self_attn.k_proj"),
        "v": lin_stack(p + "self_attn.v_proj"),
        "o": lin_stack(p + "self_attn.out_proj"),
        "fc1": lin_stack(p + "mlp.fc1"),
        "fc2": lin_stack(p + "mlp.fc2"),
    }
    return {
        "token_embedding": {"embedding": _np(
            sd["text_model.embeddings.token_embedding.weight"])},
        "position_embedding": _np(
            sd["text_model.embeddings.position_embedding.weight"]),
        "block": block,
        "final_ln": {
            "scale": _np(sd["text_model.final_layer_norm.weight"]),
            "bias": _np(sd["text_model.final_layer_norm.bias"])},
    }


def flux_params_from_diffusers(sd: Mapping, cfg: FluxConfig) -> Dict:
    """diffusers FluxTransformer2DModel state_dict -> FluxTransformer2D
    params (per-block tensors stacked for nn.scan).

    Name map (diffusers -> ours), double blocks `transformer_blocks.{i}.`:
      norm1.linear -> img_mod;          norm1_context.linear -> txt_mod
      attn.to_q/k/v -> img_q/k/v;       attn.add_{q,k,v}_proj -> txt_q/k/v
      attn.norm_q/k.weight -> img_{q,k}_norm.scale;
      attn.norm_added_q/k.weight -> txt_{q,k}_norm.scale
      attn.to_out.0 -> img_attn_out;    attn.to_add_out -> txt_attn_out
      ff.net.0.proj -> img_mlp_in;      ff.net.2 -> img_mlp_out
      ff_context.net.0.proj -> txt_mlp_in; ff_context.net.2 -> txt_mlp_out
    single blocks `single_transformer_blocks.{i}.`:
      norm.linear -> mod; attn.to_q/k/v -> q/k/v;
      attn.norm_q/k.weight -> {q,k}_norm.scale;
      proj_mlp -> mlp_in; proj_out -> out
    top level:
      x_embedder, context_embedder, proj_out keep names;
      time_text_embed.timestep_embedder.linear_{1,2} -> time_embedder.
        {in,out}_layer
      time_text_embed.text_embedder.linear_{1,2} -> pooled_embedder.*
      time_text_embed.guidance_embedder.linear_{1,2} -> guidance_embedder.*
      norm_out.linear -> norm_out  (NOTE: diffusers chunk order is
        (scale, shift) — handled in the model, no weight permute needed)
    """
    L, LS = cfg.num_layers, cfg.num_single_layers
    d = "transformer_blocks.{i}."
    s = "single_transformer_blocks.{i}."

    def lin_stack(fmt, n=L):
        return {"kernel": _stack(sd, fmt + ".weight", n),
                "bias": _stack(sd, fmt + ".bias", n, transpose=False)}

    def norm_stack(fmt, n=L):
        return {"scale": _stack(sd, fmt + ".weight", n, transpose=False)}

    double = {
        "img_mod": lin_stack(d + "norm1.linear"),
        "txt_mod": lin_stack(d + "norm1_context.linear"),
        "img_q": lin_stack(d + "attn.to_q"),
        "img_k": lin_stack(d + "attn.to_k"),
        "img_v": lin_stack(d + "attn.to_v"),
        "txt_q": lin_stack(d + "attn.add_q_proj"),
        "txt_k": lin_stack(d + "attn.add_k_proj"),
        "txt_v": lin_stack(d + "attn.add_v_proj"),
        "img_q_norm": norm_stack(d + "attn.norm_q"),
        "img_k_norm": norm_stack(d + "attn.norm_k"),
        "txt_q_norm": norm_stack(d + "attn.norm_added_q"),
        "txt_k_norm": norm_stack(d + "attn.norm_added_k"),
        "img_attn_out": lin_stack(d + "attn.to_out.0"),
        "txt_attn_out": lin_stack(d + "attn.to_add_out"),
        "img_mlp_in": lin_stack(d + "ff.net.0.proj"),
        "img_mlp_out": lin_stack(d + "ff.net.2"),
        "txt_mlp_in": lin_stack(d + "ff_context.net.0.proj"),
        "txt_mlp_out": lin_stack(d + "ff_context.net.2"),
    }
    single = {
        "mod": lin_stack(s + "norm.linear", LS),
        "q": lin_stack(s + "attn.to_q", LS),
        "k": lin_stack(s + "attn.to_k", LS),
        "v": lin_stack(s + "attn.to_v", LS),
        "q_norm": norm_stack(s + "attn.norm_q", LS),
        "k_norm": norm_stack(s + "attn.norm_k", LS),
        "mlp_in": lin_stack(s + "proj_mlp", LS),
        "out": lin_stack(s + "proj_out", LS),
    }

    def lin(name):
        return {"kernel": _lin(sd, name + ".weight"),
                "bias": _np(sd[name + ".bias"])}

    params = {
        "double_blocks": double,
        "single_blocks": single,
        "x_embedder": lin("x_embedder"),
        "context_embedder": lin("context_embedder"),
        "proj_out": lin("proj_out"),
        "norm_out": lin("norm_out.linear"),
        "time_embedder": {
            "in_layer": lin("time_text_embed.timestep_embedder.linear_1"),
            "out_layer": lin("time_text_embed.timestep_embedder.linear_2")},
        "pooled_embedder": {
            "in_layer": lin("time_text_embed.text_embedder.linear_1"),
            "out_layer": lin("time_text_embed.text_embedder.linear_2")},
    }
    if cfg.guidance_embeds:
        params["guidance_embedder"] = {
            "in_layer": lin("time_text_embed.guidance_embedder.linear_1"),
            "out_layer": lin("time_text_embed.guidance_embedder.linear_2")}
    if cfg.rope_layout == "half":
        from x2i_tpu.models.flux import permute_params_to_half_rope
        params = permute_params_to_half_rope(params, cfg)
    return params


def _conv1d(sd: Mapping, name: str) -> np.ndarray:
    """torch Conv1d weight (out, in/groups, k) -> flax (k, in/groups, out)."""
    return _np(sd[name]).transpose(2, 1, 0)


def _convnext_block(sd: Mapping, prefix: str) -> Dict:
    """Reference ConvNeXtBlock (modeling_minicpmo.py:2208-2259)."""
    return {
        "dwconv": {"kernel": _conv1d(sd, prefix + "dwconv.weight"),
                   "bias": _np(sd[prefix + "dwconv.bias"])},
        "norm": {"scale": _np(sd[prefix + "norm.weight"]),
                 "bias": _np(sd[prefix + "norm.bias"])},
        "pwconv1": {"kernel": _lin(sd, prefix + "pwconv1.weight"),
                    "bias": _np(sd[prefix + "pwconv1.bias"])},
        "pwconv2": {"kernel": _lin(sd, prefix + "pwconv2.weight"),
                    "bias": _np(sd[prefix + "pwconv2.bias"])},
        "coef": _np(sd[prefix + "coef"]),
    }


def _dvae_decoder(sd: Mapping, prefix: str, n_layer: int = 12) -> Dict:
    out = {
        "conv_in0": {"kernel": _conv1d(sd, prefix + "conv_in.0.weight"),
                     "bias": _np(sd[prefix + "conv_in.0.bias"])},
        "conv_in1": {"kernel": _conv1d(sd, prefix + "conv_in.2.weight"),
                     "bias": _np(sd[prefix + "conv_in.2.bias"])},
        "conv_out": {"kernel": _conv1d(sd, prefix + "conv_out.weight")},
    }
    for i in range(n_layer):
        out[f"block_{i}"] = _convnext_block(
            sd, prefix + f"decoder_block.{i}.")
    return out


def dvae_params_from_reference(sd: Mapping, prefix: str = "dvae.") -> Dict:
    """Reference DVAE state dict (modeling_minicpmo.py:2349-2427) ->
    x2i_tpu.models.chattts.DVAE params. GFSQ projections come from
    vector_quantize_pytorch GroupedResidualFSQ (rvqs.{g}.project_in/out)."""
    p = {
        "coef": _np(sd[prefix + "coef"]).reshape(-1),
        "down0": {"kernel": _conv1d(sd, prefix + "downsample_conv.0.weight"),
                  "bias": _np(sd[prefix + "downsample_conv.0.bias"])},
        "down1": {"kernel": _conv1d(sd, prefix + "downsample_conv.2.weight"),
                  "bias": _np(sd[prefix + "downsample_conv.2.bias"])},
        "encoder": _dvae_decoder(sd, prefix + "encoder."),
        "decoder": _dvae_decoder(sd, prefix + "decoder."),
        "out_conv": {"kernel": _conv1d(sd, prefix + "out_conv.weight")},
        "vq": {},
    }
    for g in (0, 1):
        base = prefix + f"vq_layer.quantizer.rvqs.{g}."
        if base + "project_in.weight" not in sd:
            # checkpoints with vq_layer stripped (decode-from-features
            # use, e.g. goldens without vector_quantize_pytorch)
            continue
        p["vq"][f"project_in_{g}"] = {
            "kernel": _lin(sd, base + "project_in.weight"),
            "bias": _np(sd[base + "project_in.bias"])}
        p["vq"][f"project_out_{g}"] = {
            "kernel": _lin(sd, base + "project_out.weight"),
            "bias": _np(sd[base + "project_out.bias"])}
    return p


def _weight_norm(sd: Mapping, prefix: str):
    """torch weight_norm Linear -> (v (in,out), g (out,)). Handles both the
    parametrizations.* (torch>=2.1) and weight_g/weight_v layouts."""
    if prefix + "parametrizations.weight.original0" in sd:
        g = _np(sd[prefix + "parametrizations.weight.original0"])
        v = _np(sd[prefix + "parametrizations.weight.original1"])
    else:
        g = _np(sd[prefix + "weight_g"])
        v = _np(sd[prefix + "weight_v"])
    return v.T, g.reshape(-1)


def chattts_params_from_reference(sd: Mapping, cfg,
                                  prefix: str = "tts.") -> Dict:
    """Reference ConditionalChatTTS state dict
    (modeling_minicpmo.py:2590-2747) -> ConditionalChatTTS params. The
    nested DVAE converts separately via
    dvae_params_from_reference(sd, prefix="tts.dvae.").
    cfg: x2i_tpu.models.chattts.ChatTTSConfig."""
    L = cfg.num_hidden_layers
    lp = prefix + "model.layers.{i}."
    block = {
        "input_norm": {"scale": _stack(
            sd, lp + "input_layernorm.weight", L, transpose=False)},
        "post_attn_norm": {"scale": _stack(
            sd, lp + "post_attention_layernorm.weight", L,
            transpose=False)},
        "q_proj": {"kernel": _stack(sd, lp + "self_attn.q_proj.weight", L)},
        "k_proj": {"kernel": _stack(sd, lp + "self_attn.k_proj.weight", L)},
        "v_proj": {"kernel": _stack(sd, lp + "self_attn.v_proj.weight", L)},
        "o_proj": {"kernel": _stack(sd, lp + "self_attn.o_proj.weight", L)},
        "gate_proj": {"kernel": _stack(sd, lp + "mlp.gate_proj.weight", L)},
        "up_proj": {"kernel": _stack(sd, lp + "mlp.up_proj.weight", L)},
        "down_proj": {"kernel": _stack(sd, lp + "mlp.down_proj.weight", L)},
    }
    params: Dict = {
        "emb_text": {"embedding": _np(sd[prefix + "emb_text.weight"])},
        "blocks": {"block": block},
        "norm": {"scale": _np(sd[prefix + "model.norm.weight"])},
    }
    for i in range(cfg.num_vq):
        params[f"emb_code_{i}"] = {
            "embedding": _np(sd[prefix + f"emb_code.{i}.weight"])}
        v, g = _weight_norm(sd, prefix + f"head_code.{i}.")
        params[f"head_v_{i}"] = v
        params[f"head_g_{i}"] = g
    if cfg.use_mlp:
        params["projector"] = {
            "linear1": {"kernel": _lin(sd, prefix + "projector.linear1.weight"),
                        "bias": _np(sd[prefix + "projector.linear1.bias"])},
            "linear2": {"kernel": _lin(sd, prefix + "projector.linear2.weight"),
                        "bias": _np(sd[prefix + "projector.linear2.bias"])}}
    else:
        params["projector"] = {
            "kernel": _lin(sd, prefix + "projector.weight")}
    return params
