"""Synthetic checkpoint DIRECTORIES in the released on-disk layouts.

These builders produce miniature but layout-exact copies of the artifacts
the reference consumes at its entry points
(/root/reference/infer/inference_minicpm.py:51-91):

  * a diffusers FLUX dir: `transformer/{config.json,*.safetensors}` +
    `vae/{config.json,*.safetensors}` + `scheduler/scheduler_config.json`
  * HF MLLM dirs (config.json + model.safetensors + tokenizer files) for
    the three encoder families (Qwen2.5-VL / InternVL / MiniCPM-o)
  * the proj `diffusion_pytorch_model.bin` torch state dict with DDP
    `module.` prefixes

so tests can drive convert/load.py::build_pipeline_from_checkpoints and
the CLI end to end — the exact path real released weights take — without
the weights themselves. Weights are random; layouts, key names, config
files, and tokenizer files are the real formats.
"""

from __future__ import annotations

import json
import os

import numpy as np
import torch

# ---------------------------------------------------------------- tokenizer

_BASE_SPECIALS = ["<|endoftext|>", "<|im_start|>", "<|im_end|>"]

_CHATML = ("{% for message in messages %}<|im_start|>{{ message['role'] }}\n"
           "{% if message['content'] is string %}{{ message['content'] }}"
           "{% else %}{% for item in message['content'] %}"
           "{% if item['type'] == 'image' %}"
           "<|vision_start|><|image_pad|><|vision_end|>"
           "{% elif item['type'] == 'video' %}"
           "<|vision_start|><|video_pad|><|vision_end|>"
           "{% elif item['type'] == 'text' %}{{ item['text'] }}{% endif %}"
           "{% endfor %}{% endif %}<|im_end|>\n{% endfor %}"
           "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}")

FAMILY_SPECIALS = {
    # ids start at 256 (after the byte-level base vocab), in list order
    "qwenvl": _BASE_SPECIALS + ["<|vision_start|>", "<|vision_end|>",
                                "<|image_pad|>", "<|video_pad|>"],
    "internvl": _BASE_SPECIALS + ["<img>", "</img>", "<IMG_CONTEXT>"],
    "minicpm": _BASE_SPECIALS + ["<image>", "</image>", "<audio>",
                                 "</audio>", "<unk>"],
}

VOCAB_SIZE = 320          # 256 bytes + specials + headroom


def special_id(family: str, token: str) -> int:
    return 256 + FAMILY_SPECIALS[family].index(token)


def write_tokenizer_dir(path: str, family: str) -> None:
    """Qwen2-style byte-level BPE (vocab.json + merges.txt, no merges so
    every byte is a token) + the family's special tokens + a ChatML chat
    template. Loads through AutoTokenizer both fast and slow."""
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode
    os.makedirs(path, exist_ok=True)
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    specials = FAMILY_SPECIALS[family]
    added = {str(256 + i): {"content": s, "lstrip": False,
                            "normalized": False, "rstrip": False,
                            "single_word": False, "special": True}
             for i, s in enumerate(specials)}
    cfg = {"tokenizer_class": "Qwen2Tokenizer",
           "model_max_length": 32768,
           "added_tokens_decoder": added,
           "chat_template": _CHATML,
           "eos_token": "<|im_end|>",
           "pad_token": "<|endoftext|>",
           "unk_token": "<unk>" if family == "minicpm" else None,
           "bos_token": None,
           "clean_up_tokenization_spaces": False,
           "errors": "replace"}
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump(cfg, f)


# ---------------------------------------------------------------- FLUX dir

FLUX_KW = dict(patch_size=1, in_channels=16, num_layers=1,
               num_single_layers=2, attention_head_dim=16,
               num_attention_heads=4, joint_attention_dim=64,
               pooled_projection_dim=32, guidance_embeds=False,
               axes_dims_rope=(4, 6, 6))

VAE_KW = dict(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
              latent_channels=4, norm_num_groups=4,
              scaling_factor=0.3611, shift_factor=0.1159,
              use_mid_attention=True)


def _save_torch_sd(sd, path, drop=()):
    from safetensors.torch import save_file
    sd = {k: v.detach().clone().contiguous() for k, v in sd.items()
          if k not in drop}
    save_file(sd, path)


def build_flux_dir(root: str, seed: int = 0) -> str:
    """diffusers-layout FLUX checkpoint dir (FluxPipeline.from_pretrained
    layout: inference_minicpm.py:72-77)."""
    from torch_mirrors import MirrorAutoencoderKL, MirrorFluxTransformer2D
    path = os.path.join(root, "flux")
    os.makedirs(os.path.join(path, "transformer"), exist_ok=True)
    os.makedirs(os.path.join(path, "vae"), exist_ok=True)
    os.makedirs(os.path.join(path, "scheduler"), exist_ok=True)
    torch.manual_seed(seed)
    mirror = MirrorFluxTransformer2D(**FLUX_KW, time_embed_channels=256)
    _save_torch_sd(mirror.state_dict(),
                   os.path.join(path, "transformer",
                                "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(path, "transformer", "config.json"), "w") as f:
        json.dump({"_class_name": "FluxTransformer2DModel", **FLUX_KW,
                   "axes_dims_rope": list(FLUX_KW["axes_dims_rope"])}, f)
    vae = MirrorAutoencoderKL(**VAE_KW)
    _save_torch_sd(vae.state_dict(),
                   os.path.join(path, "vae",
                                "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(path, "vae", "config.json"), "w") as f:
        json.dump({"_class_name": "AutoencoderKL",
                   "in_channels": 3, "out_channels": 3,
                   "latent_channels": VAE_KW["latent_channels"],
                   "block_out_channels": list(VAE_KW["block_out_channels"]),
                   "layers_per_block": VAE_KW["layers_per_block"],
                   "norm_num_groups": VAE_KW["norm_num_groups"],
                   "scaling_factor": VAE_KW["scaling_factor"],
                   "shift_factor": VAE_KW["shift_factor"],
                   "mid_block_add_attention":
                       VAE_KW["use_mid_attention"]}, f)
    with open(os.path.join(path, "scheduler",
                           "scheduler_config.json"), "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 1.0,
                   "use_dynamic_shifting": False}, f)
    return path


# ---------------------------------------------------------------- proj bin

def build_proj_bin(root: str, in_channels: int, input_dim: int,
                   output_dim0: int = 32, output_dim1: int = 64,
                   kernel_size: int = 5, use_cnn: bool = True,
                   use_scale: bool = False, seed: int = 0) -> str:
    """The released proj artifact: a bare torch .bin of Proj7Exp
    (utils/proj.py:35-53) with DDP 'module.' prefixes
    (inference_minicpm.py:80-91)."""
    torch.manual_seed(seed)
    sd = {}
    if use_scale:
        sd["cha_scale"] = torch.randn(1, in_channels, 1, 1)
    elif use_cnn:
        sd["conv.weight"] = torch.randn(1, in_channels, kernel_size,
                                        kernel_size) * 0.05
        sd["conv.bias"] = torch.randn(1) * 0.01
    sd["mlp.layernorm.weight"] = torch.ones(input_dim)
    sd["mlp.layernorm.bias"] = torch.zeros(input_dim)
    sd["mlp.projector.0.weight"] = torch.randn(output_dim1, input_dim) * .05
    sd["mlp.projector.2.weight"] = torch.randn(output_dim1,
                                               output_dim1) * 0.05
    sd["mlp.fc.1.weight"] = torch.randn(output_dim0, output_dim1) * 0.05
    sd["mlp.fc.1.bias"] = torch.zeros(output_dim0)
    sd = {"module." + k: v for k, v in sd.items()}
    path = os.path.join(root, "diffusion_pytorch_model.bin")
    torch.save(sd, path)
    return path


# ---------------------------------------------------------------- MLLM dirs

def build_qwenvl_dir(root: str, seed: int = 0) -> str:
    """HF Qwen2.5-VL dir: config.json (transformers-written, nested
    text_config layout) + model.safetensors + Qwen2 tokenizer files."""
    from transformers.models.qwen2_5_vl import (
        Qwen2_5_VLConfig as HFCfg, Qwen2_5_VLForConditionalGeneration)
    path = os.path.join(root, "qwenvl")
    os.makedirs(path, exist_ok=True)
    torch.manual_seed(seed)
    cfg = HFCfg(
        vision_config=dict(depth=2, hidden_size=32, intermediate_size=64,
                           num_heads=4, patch_size=4, spatial_merge_size=2,
                           temporal_patch_size=2, window_size=16,
                           out_hidden_size=48, fullatt_block_indexes=[1],
                           in_channels=3),
        text_config=dict(
            vocab_size=VOCAB_SIZE, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, rope_theta=1e6, rms_norm_eps=1e-6,
            max_position_embeddings=32768, tie_word_embeddings=True,
            rope_scaling={"type": "mrope", "mrope_section": [1, 2, 3]}),
        image_token_id=special_id("qwenvl", "<|image_pad|>"),
        video_token_id=special_id("qwenvl", "<|video_pad|>"),
        vision_start_token_id=special_id("qwenvl", "<|vision_start|>"),
        attn_implementation="eager")
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    _save_torch_sd(model.state_dict(),
                   os.path.join(path, "model.safetensors"),
                   drop=("lm_head.weight",))      # tied, like released
    cfg.save_pretrained(path)
    write_tokenizer_dir(path, "qwenvl")
    return path


def build_internvl_dir(root: str, seed: int = 0) -> str:
    """HF InternVLChatModel dir: config.json (llm_config + vision_config,
    the released InternVL2_5-* layout) + model.safetensors + slow Qwen2
    tokenizer files."""
    import ref_loader
    import sys
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM
    path = os.path.join(root, "internvl")
    os.makedirs(path, exist_ok=True)
    torch.manual_seed(seed)
    iv = ref_loader.load_intern_vit()
    cfgmod = sys.modules["refivl.configuration_intern_vit"]
    vis_kw = dict(patch_size=7, image_size=28, hidden_size=32,
                  qkv_bias=True, num_attention_heads=4,
                  intermediate_size=64, qk_normalization=False,
                  num_hidden_layers=2, norm_type="layer_norm")
    vit = iv.InternVisionModel(cfgmod.InternVisionConfig(
        **vis_kw, use_flash_attn=False, drop_path_rate=0.0,
        initializer_factor=0.1)).eval()
    llm_kw = dict(vocab_size=VOCAB_SIZE, hidden_size=32,
                  intermediate_size=64, num_hidden_layers=2,
                  num_attention_heads=4, num_key_value_heads=2,
                  head_dim=8, rope_theta=1e6, rms_norm_eps=1e-6,
                  max_position_embeddings=32768, tie_word_embeddings=True)
    lm = Qwen2ForCausalLM(
        HFQwen2Config(**llm_kw, attn_implementation="eager")).eval()
    vit_hidden, llm_hidden, downsample = 32, 32, 0.5
    mlp_in = int(vit_hidden * (1 / downsample) ** 2)
    mlp1 = torch.nn.Sequential(
        torch.nn.LayerNorm(mlp_in), torch.nn.Linear(mlp_in, llm_hidden),
        torch.nn.GELU(), torch.nn.Linear(llm_hidden, llm_hidden)).eval()
    sd = {}
    sd.update({"vision_model." + k: v for k, v in
               vit.state_dict().items()})
    sd.update({"language_model." + k: v for k, v in lm.state_dict().items()
               if k != "lm_head.weight"})         # tied, like released 1B
    sd.update({"mlp1." + k: v for k, v in mlp1.state_dict().items()})
    _save_torch_sd(sd, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"model_type": "internvl_chat",
                   "llm_config": {"architectures": ["Qwen2ForCausalLM"],
                                  **llm_kw},
                   "vision_config": vis_kw,
                   "downsample_ratio": downsample,
                   "ps_version": "v2",
                   "force_image_size": 28,
                   "template": "internvl2_5"}, f)
    write_tokenizer_dir(path, "internvl")
    return path


def build_minicpm_dir(root: str, seed: int = 7) -> str:
    """HF MiniCPM-o dir: flat config.json + model.safetensors (the
    reference's own MiniCPMO module provides the key naming) +
    preprocessor_config.json (slice_config) + tokenizer files."""
    import ref_loader
    import types as _t
    path = os.path.join(root, "minicpm")
    os.makedirs(path, exist_ok=True)
    mc = ref_loader.load_minicpmo()
    mc.AutoProcessor = _t.SimpleNamespace(
        from_pretrained=lambda *a, **k: None)
    cfgmod = ref_loader.load_reference_module(
        "configuration_minicpm.py", "refpkg.configuration_minicpm")
    vis_kw = dict(hidden_size=32, image_size=70, intermediate_size=64,
                  num_attention_heads=4, num_hidden_layers=3,
                  patch_size=14)
    aud_kw = dict(num_mel_bins=80, d_model=16, encoder_layers=2,
                  encoder_attention_heads=4, encoder_ffn_dim=64,
                  max_source_positions=1500)
    llm_kw = dict(vocab_size=VOCAB_SIZE, hidden_size=128,
                  num_hidden_layers=2, num_attention_heads=2,
                  num_key_value_heads=2, intermediate_size=64,
                  max_position_embeddings=256, rope_theta=1e6,
                  tie_word_embeddings=False)
    cfg = cfgmod.MiniCPMOConfig(
        vision_config=dict(vis_kw), audio_config=dict(aud_kw),
        query_num=4, init_vision=True, init_audio=True, init_tts=False,
        chunk_input=True, **llm_kw)
    cfg._attn_implementation = "eager"
    cfg.vision_config._attn_implementation = "eager"
    cfg.audio_config._attn_implementation = "eager"
    torch.manual_seed(seed)
    model = mc.MiniCPMO(cfg).eval()
    _save_torch_sd(model.state_dict(),
                   os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"model_type": "minicpmo", **llm_kw,
                   "vision_config": vis_kw, "audio_config": aud_kw,
                   "query_num": 4, "audio_pool_step": 2}, f)
    with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
        json.dump({"image_processor_type": "MiniCPMVImageProcessor",
                   "slice_config": {"max_slice_nums": 1,
                                    "scale_resolution": 70,
                                    "patch_size": 14}}, f)
    write_tokenizer_dir(path, "minicpm")
    return path


MLLM_BUILDERS = {"qwenvl": build_qwenvl_dir,
                 "internvl": build_internvl_dir,
                 "minicpm": build_minicpm_dir}

PROJ_DIMS = {"qwenvl": dict(in_channels=3, input_dim=48),
             "internvl": dict(in_channels=3, input_dim=32),
             "minicpm": dict(in_channels=3, input_dim=128)}

REGISTRY_NAME = {"qwenvl": "x2i-qwenvl2.5-7b",
                 "internvl": "x2i-internvl2.5-1b",
                 "minicpm": "x2i-minicpm-o-2.6"}


def build_family_checkpoints(root: str, family: str):
    """-> (flux_dir, mllm_dir, proj_bin, registry_model_name)."""
    flux = build_flux_dir(root)
    mllm = MLLM_BUILDERS[family](root)
    proj = build_proj_bin(root, **PROJ_DIMS[family])
    return flux, mllm, proj, REGISTRY_NAME[family]
