"""Checkpoint loading: safetensors/torch files -> assembled X2IPipeline.

Loads the same artifacts the reference consumes:
  * FLUX: diffusers-layout directory (transformer/*.safetensors +
    vae/*.safetensors) as used by FluxPipeline.from_pretrained
    (/root/reference/infer/inference_minicpm.py:72-75),
  * MLLM: HF InternVL2.5 directory (vision + mlp1 + Qwen2 LM),
  * proj: the reference's `diffusion_pytorch_model.bin` torch state dict
    with optional DDP 'module.' prefixes (inference_minicpm.py:77-91).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import (FluxConfig, GenerationConfig,
                                 InternVLConfig, MODEL_REGISTRY, ProjConfig,
                                 Qwen2Config, SchedulerConfig, VAEConfig)
from x2i_tpu.convert.torch_models import (_np, _stack, flux_params_from_diffusers,
                                          proj_params_from_reference,
                                          qwen2_params_from_hf)


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors under path into one array state dict.

    Torch-free: safetensors' flax loader reads bf16 directly (serving
    doesn't need a torch import); the converters' _np handles either."""
    from safetensors.flax import load_file
    sd: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors in {path}")
    for f in files:
        for k, v in load_file(f).items():
            sd[k] = np.asarray(v)
    return sd


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}


def vae_params_from_diffusers(sd: Mapping, cfg: VAEConfig) -> Dict:
    """diffusers AutoencoderKL state dict -> models.vae.AutoencoderKL."""

    def conv(name):
        return {"kernel": _np(sd[name + ".weight"]).transpose(2, 3, 1, 0),
                "bias": _np(sd[name + ".bias"])}

    def gn(name):
        return {"scale": _np(sd[name + ".weight"]),
                "bias": _np(sd[name + ".bias"])}

    def lin(name):
        return {"kernel": _np(sd[name + ".weight"]).T,
                "bias": _np(sd[name + ".bias"])}

    def resnet(dst, src):
        out = {"norm1": gn(src + ".norm1"), "conv1": conv(src + ".conv1"),
               "norm2": gn(src + ".norm2"), "conv2": conv(src + ".conv2")}
        if src + ".conv_shortcut.weight" in sd:
            out["conv_shortcut"] = conv(src + ".conv_shortcut")
        return out

    def attn(src):
        return {"group_norm": gn(src + ".group_norm"),
                "to_q": lin(src + ".to_q"), "to_k": lin(src + ".to_k"),
                "to_v": lin(src + ".to_v"),
                "to_out": lin(src + ".to_out.0")}

    n = len(cfg.block_out_channels)
    enc: Dict[str, Any] = {"conv_in": conv("encoder.conv_in"),
                           "conv_out": conv("encoder.conv_out"),
                           "conv_norm_out": gn("encoder.conv_norm_out")}
    for i in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_block_{j}"] = resnet(
                None, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv")
    enc["mid_block_1"] = resnet(None, "encoder.mid_block.resnets.0")
    enc["mid_block_2"] = resnet(None, "encoder.mid_block.resnets.1")
    if cfg.use_mid_attention:
        enc["mid_attn"] = attn("encoder.mid_block.attentions.0")

    dec: Dict[str, Any] = {"conv_in": conv("decoder.conv_in"),
                           "conv_out": conv("decoder.conv_out"),
                           "conv_norm_out": gn("decoder.conv_norm_out")}
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_block_{j}"] = resnet(
                None, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = conv(
                f"decoder.up_blocks.{i}.upsamplers.0.conv")
    dec["mid_block_1"] = resnet(None, "decoder.mid_block.resnets.0")
    dec["mid_block_2"] = resnet(None, "decoder.mid_block.resnets.1")
    if cfg.use_mid_attention:
        dec["mid_attn"] = attn("decoder.mid_block.attentions.0")

    return {"encoder": enc, "decoder": dec}


def controlnext_params_from_reference(sd: Mapping, prefix: str = "") -> Dict:
    """Reference ControlNeXtModel state dict -> models.controlnext.ControlNeXt
    params (one branch).

    Name map (reference lightcontrol/lightcontrol_flux.py:575-749 -> ours):
      time_embedding.linear_{1,2}  -> time_linear{1,2}
      embedding.{0,3,6} convs      -> stem{0,1,2}
      embedding.{1,4,7} groupnorms -> stem_norm{0,1,2}
      down_res.{i}.*               -> res_{i}.{norm1,conv1,time_emb_proj,
                                              norm2,conv2[,conv_shortcut]}
      down_sample.{i}.conv         -> down_{i}
      mid_convs.0.{0,2,3,4}        -> mid0, mid_norm0, mid1, mid_norm1
      mid_convs.1                  -> out_conv
    """

    def conv(name):
        return {"kernel": _np(sd[prefix + name + ".weight"])
                .transpose(2, 3, 1, 0),
                "bias": _np(sd[prefix + name + ".bias"])}

    def gn(name):
        return {"scale": _np(sd[prefix + name + ".weight"]),
                "bias": _np(sd[prefix + name + ".bias"])}

    def lin(name):
        return {"kernel": _np(sd[prefix + name + ".weight"]).T,
                "bias": _np(sd[prefix + name + ".bias"])}

    params: Dict[str, Any] = {
        "time_linear1": lin("time_embedding.linear_1"),
        "time_linear2": lin("time_embedding.linear_2"),
        "stem0": conv("embedding.0"), "stem_norm0": gn("embedding.1"),
        "stem1": conv("embedding.3"), "stem_norm1": gn("embedding.4"),
        "stem2": conv("embedding.6"), "stem_norm2": gn("embedding.7"),
        "mid0": conv("mid_convs.0.0"), "mid_norm0": gn("mid_convs.0.2"),
        "mid1": conv("mid_convs.0.3"), "mid_norm1": gn("mid_convs.0.4"),
        "out_conv": conv("mid_convs.1"),
    }
    i = 0
    while prefix + f"down_res.{i}.norm1.weight" in sd:
        res = {"norm1": gn(f"down_res.{i}.norm1"),
               "conv1": conv(f"down_res.{i}.conv1"),
               "time_emb_proj": lin(f"down_res.{i}.time_emb_proj"),
               "norm2": gn(f"down_res.{i}.norm2"),
               "conv2": conv(f"down_res.{i}.conv2")}
        if prefix + f"down_res.{i}.conv_shortcut.weight" in sd:
            res["conv_shortcut"] = conv(f"down_res.{i}.conv_shortcut")
        params[f"res_{i}"] = res
        params[f"down_{i}"] = conv(f"down_sample.{i}.conv")
        i += 1
    return {"params": params}


def controlnext_bank_params_from_reference(sd: Mapping, n: int) -> Dict:
    """Reference nn.ModuleList([ControlNeXtModel]*n) state dict (what
    train_lightcontrol.py:785-791 saves) -> stacked (n, ...) params for
    models.controlnext.apply_control_bank."""
    import jax

    per = [controlnext_params_from_reference(sd, prefix=f"{i}.")
           for i in range(n)]
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per)


def internvl_params_from_hf(sd: Mapping, cfg: InternVLConfig) -> Dict:
    """HF InternVLChatModel state dict -> models.internvl.InternVLEncoder."""
    L = cfg.vision.num_hidden_layers
    p = "vision_model.encoder.layers.{i}."

    def lin_stack(fmt, bias=True):
        out = {"kernel": _stack(sd, fmt + ".weight", L)}
        if bias:
            out["bias"] = _stack(sd, fmt + ".bias", L, transpose=False)
        return out

    def ln_stack(fmt):
        return {"scale": _stack(sd, fmt + ".weight", L, transpose=False),
                "bias": _stack(sd, fmt + ".bias", L, transpose=False)}

    block = {
        "norm1": ln_stack(p + "norm1"),
        "norm2": ln_stack(p + "norm2"),
        "qkv": lin_stack(p + "attn.qkv"),
        "proj": lin_stack(p + "attn.proj"),
        "fc1": lin_stack(p + "mlp.fc1"),
        "fc2": lin_stack(p + "mlp.fc2"),
        "ls1": _stack(sd, p + "ls1", L, transpose=False),
        "ls2": _stack(sd, p + "ls2", L, transpose=False),
    }
    if cfg.vision.qk_normalization:
        block["q_norm_scale"] = _stack(sd, p + "attn.q_norm.weight", L,
                                       transpose=False)
        block["k_norm_scale"] = _stack(sd, p + "attn.k_norm.weight", L,
                                       transpose=False)

    vision = {
        "class_embedding": _np(
            sd["vision_model.embeddings.class_embedding"]),
        "position_embedding": _np(
            sd["vision_model.embeddings.position_embedding"]),
        "patch_embedding": {
            "kernel": _np(sd["vision_model.embeddings.patch_embedding"
                             ".weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["vision_model.embeddings.patch_embedding"
                           ".bias"])},
        "block": block,
    }

    lm_sd = {k.removeprefix("language_model."): v for k, v in sd.items()
             if k.startswith("language_model.")}
    llm = qwen2_params_from_hf(lm_sd, cfg.llm)

    return {
        "vision_model": vision,
        "language_model": llm,
        "mlp1_norm": {"scale": _np(sd["mlp1.0.weight"]),
                      "bias": _np(sd["mlp1.0.bias"])},
        "mlp1_fc1": {"kernel": _np(sd["mlp1.1.weight"]).T,
                     "bias": _np(sd["mlp1.1.bias"])},
        "mlp1_fc2": {"kernel": _np(sd["mlp1.3.weight"]).T,
                     "bias": _np(sd["mlp1.3.bias"])},
    }


def qwen2_5_vl_params_from_hf(sd: Mapping, llm_cfg,
                              vision_depth: int = 32) -> Dict:
    """HF Qwen2_5_VLForConditionalGeneration state dict ->
    Qwen2_5_VLEncoder params (handles both the old `visual./model.` and new
    `model.visual./model.language_model.` key layouts)."""
    from x2i_tpu.convert.torch_models import (
        qwen2_5_vl_vision_params_from_hf)
    if any(k.startswith("model.visual.") for k in sd):
        vis_prefix, lm_prefix = "model.visual.", "model.language_model."
    else:
        vis_prefix, lm_prefix = "visual.", "model."
    lm_sd = {("model." + k.removeprefix(lm_prefix)): v
             for k, v in sd.items() if k.startswith(lm_prefix)
             and not k.startswith(vis_prefix)}
    if "lm_head.weight" in sd:
        lm_sd["lm_head.weight"] = sd["lm_head.weight"]
    return {
        "visual": qwen2_5_vl_vision_params_from_hf(sd, vision_depth,
                                                   prefix=vis_prefix),
        "language_model": qwen2_params_from_hf(lm_sd, llm_cfg),
    }


def minicpmo_params_from_hf(sd: Mapping, cfg) -> Dict:
    """HF MiniCPM-o-2.6 state dict -> MiniCPMOEncoder params. The TTS
    modules (tts./dvae./ vocos) are ignored (off the image path)."""
    from x2i_tpu.convert.torch_models import (
        resampler_params_from_reference, siglip_params_from_hf,
        whisper_params_from_hf)
    llm_sd = {k.removeprefix("llm."): v for k, v in sd.items()
              if k.startswith("llm.")}
    params = {
        "vpm": siglip_params_from_hf(sd, cfg.vision.effective_layers,
                                     prefix="vpm."),
        "resampler": resampler_params_from_reference(
            sd, cfg.llm.hidden_size, prefix="resampler."),
        "apm": whisper_params_from_hf(sd, cfg.audio.encoder_layers,
                                      prefix="apm."),
        "audio_projector": {
            "linear1": {"kernel": _np(sd["audio_projection_layer."
                                         "linear1.weight"]).T,
                        "bias": _np(sd["audio_projection_layer."
                                       "linear1.bias"])},
            "linear2": {"kernel": _np(sd["audio_projection_layer."
                                         "linear2.weight"]).T,
                        "bias": _np(sd["audio_projection_layer."
                                       "linear2.bias"])}},
        "llm": qwen2_params_from_hf(llm_sd, cfg.llm),
    }
    return params


def _internvl_encoder_fn(mllm_sd, mllm_cfg, mllm_path):
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from x2i_tpu.data.vision import load_image_tiles
    from x2i_tpu.models.internvl import InternVLEncoder
    from x2i_tpu.models.templates import (expand_image_tokens,
                                          internvl2_5_prompt,
                                          task_instruction)
    from dataclasses import replace as _replace

    from x2i_tpu.convert.hf_config import internvl_config_from_dir
    mllm_cfg = internvl_config_from_dir(mllm_path, mllm_cfg) or mllm_cfg
    tokenizer = AutoTokenizer.from_pretrained(mllm_path,
                                              trust_remote_code=True,
                                              use_fast=False)
    # the reference resolves <IMG_CONTEXT> from the tokenizer, not the
    # config (inference_internvl.py:117-119)
    ctx_id = tokenizer.convert_tokens_to_ids("<IMG_CONTEXT>")
    if ctx_id is not None and ctx_id >= 0:
        mllm_cfg = _replace(mllm_cfg, img_context_token_id=ctx_id)
    enc_params = internvl_params_from_hf(mllm_sd, mllm_cfg)
    encoder = InternVLEncoder(mllm_cfg)

    def encoder_fn(inputs):
        if inputs.get("use_answer"):
            raise ValueError("--use_answer is a Qwen2.5-VL feature "
                             "(inference_qwenvl.py:121-132); the internvl "
                             "family has no answer-conditioned mode")
        task = inputs.get("task", "text2image")
        images = inputs.get("images") or []
        question = task_instruction(task, inputs.get("prompt"),
                                    num_images=len(images))
        if images:
            question = "<image>\n" + question
        query = internvl2_5_prompt(question)
        tiles = None
        if images:
            tiles = np.concatenate(
                [load_image_tiles(im,
                                  input_size=mllm_cfg.vision.image_size)
                 for im in images], axis=0)
            query = expand_image_tokens(
                query, [tiles.shape[0]], mllm_cfg.num_image_token)
        enc = tokenizer(query, padding="max_length", max_length=512,
                        truncation=True)
        ids = jnp.asarray([enc["input_ids"]], jnp.int32)
        mask = jnp.asarray([enc["attention_mask"]], bool)
        px = None if tiles is None else jnp.asarray(tiles)
        return encoder.apply({"params": enc_params}, ids, mask, px)

    def encoder_batch_fn(inputs_list):
        """One padded 512-token prefill for the whole request list,
        images included: every request's tiles concatenate (in request
        order) into ONE ViT call — InternViT attends per tile and the
        IMG_CONTEXT scatter is a flat cumsum over the whole batch
        (models/internvl.py:215-220), so features land on each row's own
        span as long as no row's image tokens were truncated (checked
        below; a truncated row would shift every later row, so such
        batches fall back to serial, matching that path's per-request
        behavior). use_answer raises in encoder_fn (not an internvl
        feature)."""
        if any(i.get("use_answer") for i in inputs_list):
            return jnp.concatenate(
                [encoder_fn(i) for i in inputs_list], axis=0)
        queries, tiles_per_req = [], []
        for i in inputs_list:
            images = i.get("images") or []
            question = task_instruction(
                i.get("task", "text2image"), i.get("prompt"),
                num_images=len(images))
            if images:
                question = "<image>\n" + question
            query = internvl2_5_prompt(question)
            tiles = None
            if images:
                tiles = np.concatenate(
                    [load_image_tiles(
                        im, input_size=mllm_cfg.vision.image_size)
                     for im in images], axis=0)
                query = expand_image_tokens(
                    query, [tiles.shape[0]], mllm_cfg.num_image_token)
            queries.append(query)
            tiles_per_req.append(tiles)
        enc = tokenizer(queries, padding="max_length", max_length=512,
                        truncation=True)
        ids = np.asarray(enc["input_ids"], np.int32)
        ctx = mllm_cfg.img_context_token_id
        for row, tiles in zip(ids, tiles_per_req):
            want = 0 if tiles is None else \
                tiles.shape[0] * mllm_cfg.num_image_token
            if int((row == ctx).sum()) != want:
                return jnp.concatenate(
                    [encoder_fn(i) for i in inputs_list], axis=0)
        have = [t for t in tiles_per_req if t is not None]
        px = jnp.asarray(np.concatenate(have, axis=0)) if have else None
        return encoder.apply(
            {"params": enc_params}, jnp.asarray(ids),
            jnp.asarray(enc["attention_mask"], bool), px)

    encoder_fn.batch = encoder_batch_fn
    return encoder_fn


def _qwenvl_encoder_fn(mllm_sd, llm_cfg, mllm_path):
    """Qwen2.5-VL family (images max 128^2 px, video 128^2 fps 1,
    inference_qwenvl.py:136-180)."""
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from x2i_tpu.data.qwen_vision import (concat_vision_inputs,
                                          get_rope_index,
                                          prepare_vision_inputs)
    from x2i_tpu.models.qwen2_5_vl import (Qwen2_5_VLConfig,
                                           Qwen2_5_VLEncoder,
                                           QwenVisionConfig)
    from x2i_tpu.models.templates import qwen_chat_messages

    from x2i_tpu.convert.hf_config import qwenvl_config_from_dir
    full_cfg = qwenvl_config_from_dir(mllm_path, llm_cfg) \
        or Qwen2_5_VLConfig(
            vision=QwenVisionConfig(out_hidden_size=llm_cfg.hidden_size),
            llm=llm_cfg, mrope_section=(16, 24, 24))
    llm_cfg = full_cfg.llm
    enc_params = qwen2_5_vl_params_from_hf(
        mllm_sd, llm_cfg, vision_depth=full_cfg.vision.depth)
    tokenizer = AutoTokenizer.from_pretrained(mllm_path,
                                              trust_remote_code=True)
    encoder = Qwen2_5_VLEncoder(full_cfg)
    merge_tokens = full_cfg.vision.spatial_merge_size ** 2

    def _prep(inputs):
        """-> (ids (1,512), mask (1,512), pos3d (3,1,512), vdict|None,
        vin|None — the raw host dict, for batched merging)"""
        images = inputs.get("images") or []
        video = inputs.get("video")
        messages = qwen_chat_messages(inputs.get("task", "text2image"),
                                      inputs.get("prompt"),
                                      num_images=len(images),
                                      has_video=video is not None)
        text = tokenizer.apply_chat_template(messages, tokenize=False,
                                             add_generation_prompt=True)
        vin = prepare_vision_inputs(
            images or None, [video] if video is not None else None,
            patch_size=full_cfg.vision.patch_size,
            merge_size=full_cfg.vision.spatial_merge_size,
            temporal_patch_size=full_cfg.vision.temporal_patch_size,
            window_size=full_cfg.vision.window_size)
        if vin is not None:
            # expand each image/video pad token to its merged-token count
            # expand per media type, restoring the matching pad token
            # (HF Qwen2_5_VLProcessor semantics: video spans keep
            # <|video_pad|>, which get_rope_index/embed_multimodal need
            # to tell video grids from image grids)
            for grid in np.asarray(vin["image_grid_thw"]).reshape(-1, 3):
                n = int(np.prod(grid)) // merge_tokens
                text = text.replace("<|image_pad|>",
                                    "<|placeholder|>" * n, 1)
            text = text.replace("<|placeholder|>", "<|image_pad|>")
            for grid in np.asarray(vin["video_grid_thw"]).reshape(-1, 3):
                n = int(np.prod(grid)) // merge_tokens
                text = text.replace("<|video_pad|>",
                                    "<|placeholder|>" * n, 1)
            text = text.replace("<|placeholder|>", "<|video_pad|>")
        enc = tokenizer(text, padding="max_length", max_length=512,
                        truncation=True)
        ids = np.asarray([enc["input_ids"]], np.int32)
        mask = np.asarray([enc["attention_mask"]], np.int64)
        pos3d, _ = get_rope_index(
            ids,
            image_grid_thw=(vin or {}).get("image_grid_thw"),
            video_grid_thw=(vin or {}).get("video_grid_thw"),
            attention_mask=mask,
            spatial_merge_size=full_cfg.vision.spatial_merge_size,
            image_token_id=full_cfg.image_token_id,
            video_token_id=full_cfg.video_token_id,
            vision_start_token_id=full_cfg.vision_start_token_id)
        vdict = None
        if vin is not None:
            vdict = {k: jnp.asarray(vin[k]) for k in
                     ("patches", "pos_hw", "window_seg", "image_seg",
                      "reverse_index")}
        return ids, mask, pos3d, vdict, vin

    def encoder_fn(inputs):
        ids, mask, pos3d, vdict, _ = _prep(inputs)
        if inputs.get("use_answer"):
            # reasoning2image (inference_qwenvl.py:121-132): decode up to
            # 128 answer tokens and condition on cat(prefill, answer)
            from x2i_tpu.models.qwen2_5_vl import encode_with_answer
            stack, _, _ = encode_with_answer(
                encoder, {"params": enc_params}, jnp.asarray(ids),
                jnp.asarray(mask, bool), jnp.asarray(pos3d), vdict,
                max_new_tokens=128,
                eos_token_id=tokenizer.eos_token_id or 151645)
            return stack
        return encoder.apply({"params": enc_params}, jnp.asarray(ids),
                             jnp.asarray(mask, bool), jnp.asarray(pos3d),
                             vdict)

    def encoder_batch_fn(inputs_list):
        """One padded 512-token prefill for the whole request list,
        images AND videos included: every request's media concatenate (in
        request order — data/qwen_vision.py::concat_vision_inputs, since
        a single global prepare call would emit images before videos)
        into ONE vision-tower call, and embed_multimodal's flat cumsum
        scatter routes each row's features to its own pad span — features
        stay in request order and text-only rows contribute no vision
        tokens, so mixed text/image/video batches stay aligned. Guard: a
        row whose pad tokens were truncated by the 512 budget (long
        videos) would shift EVERY later row's mapping, so any
        pad-count/feature-count mismatch falls the whole batch back to
        serial. Audio / use_answer requests stay serial (answer decode
        changes the conditioning length). The reference encodes every
        request alone (one CLI run each, inference_qwenvl.py:136-180)."""
        if any(i.get("audio") is not None or i.get("use_answer")
               for i in inputs_list):
            return jnp.concatenate(
                [encoder_fn(i) for i in inputs_list], axis=0)
        preps = [_prep(i) for i in inputs_list]
        for (ids_i, _, _, _, vin_i) in preps:
            want = 0 if vin_i is None else len(vin_i["reverse_index"])
            got = int(((ids_i == full_cfg.image_token_id)
                       | (ids_i == full_cfg.video_token_id)).sum())
            if got != want:                      # truncated pad span
                return jnp.concatenate(
                    [encoder_fn(i) for i in inputs_list], axis=0)
        ids = np.concatenate([p[0] for p in preps], axis=0)
        mask = np.concatenate([p[1] for p in preps], axis=0)
        pos3d = np.concatenate([p[2] for p in preps], axis=1)
        vin = concat_vision_inputs([p[4] for p in preps])
        vdict = None
        if vin is not None:
            vdict = {k: jnp.asarray(vin[k]) for k in
                     ("patches", "pos_hw", "window_seg", "image_seg",
                      "reverse_index")}
        return encoder.apply({"params": enc_params}, jnp.asarray(ids),
                             jnp.asarray(mask, bool), jnp.asarray(pos3d),
                             vdict)

    encoder_fn.batch = encoder_batch_fn
    # handles for callers that drive the LM directly (multiturn REPL)
    from x2i_tpu.models.qwen2 import Qwen2LM
    encoder_fn.ctx = {
        "lm": Qwen2LM(full_cfg.llm),
        "lm_params": {"params": enc_params["language_model"]},
        "tokenizer": tokenizer,
        "eos_token_id": tokenizer.eos_token_id or 151645}
    return encoder_fn


def _minicpm_encoder_fn(mllm_sd, llm_cfg, mllm_path):
    """MiniCPM-o family: omni placeholders + bound scatter maps
    (inference_minicpm.py:137-178)."""
    import jax.numpy as jnp
    from transformers import AutoTokenizer
    from x2i_tpu.data.minicpm_vision import (audio_placeholder_spans,
                                             bounds_to_map,
                                             chunk_audio_mels,
                                             prepare_minicpm_vision)
    from x2i_tpu.models.whisper_enc import chunk_bias
    from x2i_tpu.models.minicpmo import MiniCPMOConfig, MiniCPMOEncoder
    from x2i_tpu.models.templates import minicpm_omni_content

    from x2i_tpu.convert.hf_config import minicpmo_config_from_dir
    cfg = minicpmo_config_from_dir(mllm_path, llm_cfg) \
        or MiniCPMOConfig(llm=llm_cfg)
    enc_params = minicpmo_params_from_hf(mllm_sd, cfg)
    tokenizer = AutoTokenizer.from_pretrained(mllm_path,
                                              trust_remote_code=True)
    encoder = MiniCPMOEncoder(cfg)
    # slice scale comes from the processor file in the released layout
    # (minicpm/preprocessor_config.json slice_config.scale_resolution)
    scale_resolution = 448
    _pp = os.path.join(mllm_path, "preprocessor_config.json")
    if os.path.isfile(_pp):
        with open(_pp) as f:
            _ppd = json.load(f)
        scale_resolution = (_ppd.get("slice_config") or _ppd).get(
            "scale_resolution", 448)

    unk_id = tokenizer.convert_tokens_to_ids("<unk>")

    def _prep(inputs):
        """Host-side request prep: -> dict with ids (1,512), mask, the
        request's PIL images (slicing is deferred so a BATCH of requests
        shares one prepare_minicpm_vision call and therefore one padded
        slice tensor), per-media <unk> spans, and raw mel chunks."""
        if inputs.get("use_answer"):
            raise ValueError("--use_answer is a Qwen2.5-VL feature "
                             "(inference_qwenvl.py:121-132); the minicpm "
                             "family has no answer-conditioned mode")
        images = list(inputs.get("images") or [])
        video = inputs.get("video")
        if video is not None:
            images.extend(video)           # <=64 uniform frames, host-side
        audio = inputs.get("audio")
        content = minicpm_omni_content(
            inputs.get("prompt"), num_images=len(images),
            num_audios=1 if audio is not None else 0)
        # chunk_input=True placeholder spans (inference_minicpm.py:166):
        # one <audio>...</audio> pair per 1s chunk of LLM tokens
        aud_spans = (audio_placeholder_spans(len(audio))
                     if audio is not None else [])
        # expand placeholders with <unk> runs and record bounds
        text = tokenizer.apply_chat_template(
            [{"role": "user", "content": content}], tokenize=False,
            add_generation_prompt=True)
        text = text.replace(
            "(<image>./</image>)",
            "<image>" + "<unk>" * cfg.query_num + "</image>")
        text = text.replace(
            "(<audio>./</audio>)",
            "".join("<audio>" + "<unk>" * n + "</audio>"
                    for n in aud_spans))
        enc = tokenizer(text, padding="max_length", max_length=512,
                        truncation=True)
        ids = np.asarray([enc["input_ids"]], np.int32)
        mask = np.asarray([enc["attention_mask"]], bool)
        # bounds: runs of <unk> in order — images first, then audio
        spans = []
        in_run = False
        for i, t in enumerate(ids[0].tolist()):
            if t == unk_id and not in_run:
                start, in_run = i, True
            elif t != unk_id and in_run:
                spans.append((start, i))
                in_run = False
        mels = lens = None
        if audio is not None:
            # >30s audio becomes several 30s mel chunks
            # (processing_minicpmo.py:183-191)
            mels, lens = chunk_audio_mels(np.asarray(audio))
        # max_slice_nums=1 -> one slice per image; spans[:n_images] are
        # the image spans, the rest audio
        return {"ids": ids, "mask": mask, "images": images,
                "n_img_spans": len(images), "spans": spans,
                "mels": mels, "mel_lens": lens,
                "has_audio": audio is not None}

    def _assemble(preps):
        """B prepped requests -> ONE encoder.apply: all requests' image
        slices ride one vision-tower call (flat rows in request order)
        and all requests' mel chunks one whisper call (each request's
        rows offset by its global chunk base). bounds_to_map already
        walks spans per batch row, so the (B, 512) scatter maps come out
        aligned. Single-request encodes are the B=1 case of this same
        path (batched == serial pinned in tests/test_serve.py)."""
        ids = np.concatenate([p["ids"] for p in preps], axis=0)
        mask = np.concatenate([p["mask"] for p in preps], axis=0)
        S = ids.shape[1]
        all_images = [im for p in preps for im in p["images"]]
        vision = prepare_minicpm_vision(
            all_images, cfg.llm.hidden_size, max_slice_nums=1,
            patch_size=cfg.vision.patch_size,
            num_patches_per_side=cfg.vision.num_patches_per_side,
            max_size=cfg.vision.num_patches_per_side,
            scale_resolution=scale_resolution)
        img_map = bounds_to_map(
            [p["spans"][:p["n_img_spans"]] for p in preps], S)
        vdict = adict = audio_map = None
        if vision:
            vdict = {k: jnp.asarray(vision[k]) for k in
                     ("patches", "position_ids", "patch_mask",
                      "pos_embed")}
        if any(p["has_audio"] for p in preps):
            # all requests' 30s mel chunks pad to one (A_total, mels, T)
            # whisper batch; per-chunk embeddings concatenate skipping
            # pad rows and fill each request's placeholder spans in order
            # (get_omni_embedding chunk_input branch,
            # modeling_minicpmo.py:585-599). Padding T across requests is
            # inert: padded mel frames are masked keys, and row indices
            # below re-derive from the common conv length.
            mel_list = [p["mels"] for p in preps if p["has_audio"]]
            len_list = [p["mel_lens"] for p in preps if p["has_audio"]]
            t_max = max(m.shape[2] for m in mel_list)
            mels = np.zeros((sum(m.shape[0] for m in mel_list),
                             mel_list[0].shape[1], t_max), np.float32)
            row0 = 0
            for m in mel_list:
                mels[row0:row0 + m.shape[0], :, :m.shape[2]] = m
                row0 += m.shape[0]
            lens = np.concatenate(len_list)
            conv_lens = (lens - 1) // 2 + 1
            t_conv = (t_max - 1) // 2 + 1
            # bug-compatible parity: the reference's whisper padding mask
            # compares CONV-frame indices against MEL-frame lengths
            # (modeling_minicpmo.py:497-505), so pad conv frames below the
            # mel length stay attendable; the model was trained with
            # this, so we replicate it exactly
            # (pinned in tests/test_minicpm_audio_chunks.py)
            frame_mask = np.arange(t_conv)[None] < lens[:, None]
            pooled_pad = t_conv // 2
            # generate runs whisper with 1s-chunked attention
            # (modeling_minicpmo.py:808-811, audio_chunk_length=1.0)
            bias = chunk_bias(t_conv, chunk_frames=50)
            adict = {"mel": jnp.asarray(mels),
                     "frame_mask": jnp.asarray(frame_mask),
                     "attn_bias": jnp.asarray(bias)}
            rows_parts = []
            chunk_base = 0
            for p in preps:
                if not p["has_audio"]:
                    continue
                n_chunks = p["mels"].shape[0]
                cl = conv_lens[chunk_base:chunk_base + n_chunks]
                rows = np.concatenate([
                    (chunk_base + k) * pooled_pad
                    + np.arange((c - 2) // 2 + 1)
                    for k, c in enumerate(cl)])
                span_total = sum(e - s for s, e in
                                 p["spans"][p["n_img_spans"]:])
                rows_parts.append(rows[:span_total])
                chunk_base += n_chunks
            audio_map = bounds_to_map(
                [p["spans"][p["n_img_spans"]:] for p in preps], S,
                rows=np.concatenate(rows_parts))
        return encoder.apply({"params": enc_params}, jnp.asarray(ids),
                             jnp.asarray(mask), vdict, adict,
                             jnp.asarray(img_map) if vision else None,
                             jnp.asarray(audio_map)
                             if audio_map is not None else None)

    def encoder_fn(inputs):
        return _assemble([_prep(inputs)])

    def encoder_batch_fn(inputs_list):
        """ONE padded 512-token prefill + one vision-tower call + one
        whisper call for the whole request list — text, image, video, and
        audio requests mixed. Audio is bucketable because chunking is
        static per chunk count (processing_minicpmo.py:183-191). Guard:
        if the 512 budget truncated any request's placeholder spans, the
        batch falls back to serial (span/feature alignment would need
        per-request repair). The reference encodes every request alone
        (one CLI run each)."""
        preps = [_prep(i) for i in inputs_list]
        # truncation guard: every request must carry its full media
        # complement of <unk> positions (n_images * query_num image
        # tokens + every audio chunk span at full length); a shortened
        # image span would shift the global slice-row mapping
        for p, inp in zip(preps, inputs_list):
            aud = inp.get("audio")
            expected = p["n_img_spans"] * cfg.query_num + (
                sum(audio_placeholder_spans(len(aud)))
                if aud is not None else 0)
            got = sum(e - s for s, e in p["spans"])
            if got != expected:
                return jnp.concatenate(
                    [encoder_fn(i) for i in inputs_list], axis=0)
        return _assemble(preps)

    encoder_fn.batch = encoder_batch_fn
    return encoder_fn


def build_pipeline_from_checkpoints(model: str, flux_path: str,
                                    mllm_path: str, proj_path: str,
                                    num_steps: int = 4, height: int = 1024,
                                    width: int = 1024, seed: int = 0,
                                    quantized=True):
    """Assemble a full X2IPipeline from on-disk checkpoints for any of the
    three encoder families (internvl / qwenvl / minicpm registry names)."""
    from x2i_tpu.diffusion.scheduler import FlowMatchEulerScheduler
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.proj import Proj
    from x2i_tpu.models.vae import AutoencoderKL
    from x2i_tpu.ops.quant import quantize_tree
    from x2i_tpu.pipeline import X2IPipeline

    from x2i_tpu.convert.hf_config import (flux_config_from_dir,
                                           proj_config_from_sd,
                                           scheduler_config_from_dir,
                                           vae_config_from_dir)

    entry = MODEL_REGISTRY[model]
    # architecture follows the checkpoint's own config files where present
    # (the reference reads them via from_pretrained,
    # inference_minicpm.py:51-77); registry entries are the fallback
    flux_cfg: FluxConfig = flux_config_from_dir(
        flux_path, base=entry["flux"]) or entry["flux"]
    if quantized:
        flux_cfg = FluxConfig(**{**flux_cfg.__dict__, "quantized": quantized})
    mllm_cfg = entry["mllm"]
    sched_cfg: SchedulerConfig = scheduler_config_from_dir(flux_path) \
        or entry["scheduler"]
    vae_cfg = vae_config_from_dir(flux_path) or VAEConfig()
    proj_sd = load_torch_bin(proj_path)
    proj_cfg: ProjConfig = proj_config_from_sd(proj_sd,
                                               base=entry["proj"])

    flux_sd = load_safetensors_dir(os.path.join(flux_path, "transformer"))
    flux_params = flux_params_from_diffusers(flux_sd, flux_cfg)
    del flux_sd
    if quantized:
        flux_params = quantize_tree(
            flux_params,
            mode=quantized if isinstance(quantized, str) else "w8")
    vae_sd = load_safetensors_dir(os.path.join(flux_path, "vae"))
    vae_params = vae_params_from_diffusers(vae_sd, vae_cfg)
    del vae_sd

    proj_params = proj_params_from_reference(proj_sd, proj_cfg)
    del proj_sd
    mllm_sd = load_safetensors_dir(mllm_path)
    if "internvl" in model:
        encoder_fn = _internvl_encoder_fn(mllm_sd, mllm_cfg, mllm_path)
    elif "qwenvl" in model:
        encoder_fn = _qwenvl_encoder_fn(mllm_sd, mllm_cfg, mllm_path)
    elif "minicpm" in model:
        encoder_fn = _minicpm_encoder_fn(mllm_sd, mllm_cfg, mllm_path)
    else:
        raise ValueError(f"unknown model family for {model}")
    del mllm_sd

    return X2IPipeline(
        encoder_fn=encoder_fn,
        proj=Proj(proj_cfg), proj_params={"params": proj_params},
        flux=FluxTransformer2D(flux_cfg),
        flux_params={"params": flux_params},
        vae=AutoencoderKL(vae_cfg), vae_params={"params": vae_params},
        scheduler=FlowMatchEulerScheduler(sched_cfg),
        gen_cfg=GenerationConfig(height=height, width=width,
                                 num_inference_steps=num_steps, seed=seed),
        encoder_batch_fn=getattr(encoder_fn, "batch", None))
