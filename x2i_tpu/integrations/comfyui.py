"""ComfyUI-style integration surface.

Mirrors /root/reference/x2i_comfyui/{nodes.py,model.py}: loader/encode
"nodes" that produce ComfyUI CONDITIONING — `[[prompt_embeds,
{"pooled_output": pooled}]]` (model.py:247) — consumable by stock FLUX
sampler nodes, plus the self-describing single-file proj checkpoint format
`{"config": {...}, "state_dict": {...}}` (model.py:31-97).

These classes follow the ComfyUI node protocol (INPUT_TYPES /
RETURN_TYPES / FUNCTION) but do not import the ComfyUI host, so they are
testable standalone and registrable by a thin ComfyUI plugin shim.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# per-size proj configs incl. the 0_5b variant (x2i_comfyui/model.py:43-57)
PROJ_SIZE_CONFIGS = {
    "0_5b": dict(in_channels=25, input_dim=896, num_heads=14, head_dim=64),
    "internvl1b": dict(in_channels=25, input_dim=896, num_heads=12,
                       head_dim=64, use_scale=True, use_cnn=False),
    "internvl4b": dict(in_channels=37, input_dim=2048, num_heads=16,
                       head_dim=128),
    "3b": dict(in_channels=37, input_dim=2048, num_heads=28, head_dim=128),
    "7b": dict(in_channels=29, input_dim=3584, num_heads=28, head_dim=128),
}


def save_proj_checkpoint(path: str, config: Dict, params: Dict) -> None:
    """Self-describing single-file proj checkpoint (numpy npz with a json
    config — the TPU-native analogue of model.py's {config, state_dict}
    torch file)."""
    import json
    flat = {}

    def walk(prefix, tree):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(name, v)
            else:
                flat[name] = np.asarray(v)

    walk("", params)
    np.savez(path, __config__=json.dumps(config), **flat)


def load_proj_checkpoint(path: str) -> Tuple[Dict, Dict]:
    import json
    data = np.load(path, allow_pickle=False)
    config = json.loads(str(data["__config__"]))
    params: Dict = {}
    for key in data.files:
        if key == "__config__":
            continue
        parts = key.split(".")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return config, params


class MLLMLoader:
    """ComfyUI node: load an MLLM encoder bundle
    (x2i_comfyui/nodes.py:83-109)."""

    RETURN_TYPES = ("MLLM",)
    FUNCTION = "load"
    CATEGORY = "X2I"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "mllm_type": (["qwenvl2.5", "internvl2.5", "minicpm-o"],),
            "model_path": ("STRING", {"default": ""}),
        }}

    def load(self, mllm_type: str, model_path: str):
        """Builds the encoder_fn for MLLMEncode from an HF checkpoint dir
        (the reference repacks Qwen into a single .pt,
        x2i_comfyui/model.py:149-179; we consume the HF layout directly)."""
        from x2i_tpu.convert import load as L
        from x2i_tpu.core.config import MODEL_REGISTRY
        registry_name = {
            "qwenvl2.5": "x2i-qwenvl2.5-7b",
            "internvl2.5": "x2i-internvl2.5-1b",
            "minicpm-o": "x2i-minicpm-o-2.6",
        }[mllm_type]
        mllm_cfg = MODEL_REGISTRY[registry_name]["mllm"]
        sd = L.load_safetensors_dir(model_path)
        builder = {"qwenvl2.5": L._qwenvl_encoder_fn,
                   "internvl2.5": L._internvl_encoder_fn,
                   "minicpm-o": L._minicpm_encoder_fn}[mllm_type]
        return (builder(sd, mllm_cfg, model_path),)


class ProjLoader:
    """ComfyUI node: load the proj from a self-describing checkpoint
    (x2i_comfyui/nodes.py:141-161)."""

    RETURN_TYPES = ("PROJ",)
    FUNCTION = "load"
    CATEGORY = "X2I"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"proj_path": ("STRING", {"default": ""})}}

    def load(self, proj_path: str):
        import jax.numpy as jnp
        from x2i_tpu.core.config import ProjConfig
        from x2i_tpu.models.proj import Proj
        config, params = load_proj_checkpoint(proj_path)
        cfg = ProjConfig(**config)
        return ((Proj(cfg), {"params": params}),)


class MLLMEncode:
    """ComfyUI node: prompt/images -> CONDITIONING
    (x2i_comfyui/nodes.py:112-138, model.py:183-247)."""

    RETURN_TYPES = ("CONDITIONING",)
    FUNCTION = "encode"
    CATEGORY = "X2I"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"mllm": ("MLLM",), "proj": ("PROJ",),
                             "text": ("STRING", {"multiline": True})},
                "optional": {"images": ("IMAGE_PATHS",)}}

    def encode(self, mllm, proj, text: str, images=None):
        encoder_fn = mllm
        proj_model, proj_params = proj
        states = encoder_fn({"prompt": text, "images": images,
                             "task": "text2image"})
        pooled, prompt_embeds = proj_model.apply(proj_params, states)
        return ([[np.asarray(prompt_embeds),
                  {"pooled_output": np.asarray(pooled)}]],)


class LoadImagePath:
    RETURN_TYPES = ("IMAGE_PATHS",)
    FUNCTION = "load"
    CATEGORY = "X2I"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"path": ("STRING", {"default": ""})}}

    def load(self, path: str):
        return ([path],)


class MultiImagePaths:
    """Up to 4 image paths (x2i_comfyui/nodes.py:62-80)."""

    RETURN_TYPES = ("IMAGE_PATHS",)
    FUNCTION = "load"
    CATEGORY = "X2I"

    @classmethod
    def INPUT_TYPES(cls):
        opt = {f"path{i}": ("STRING", {"default": ""}) for i in range(1, 5)}
        return {"optional": opt}

    def load(self, path1="", path2="", path3="", path4=""):
        return ([p for p in (path1, path2, path3, path4) if p],)


NODE_CLASS_MAPPINGS = {
    "X2I_MLLMLoader": MLLMLoader,
    "X2I_MLLMEncode": MLLMEncode,
    "X2I_ProjLoader": ProjLoader,
    "X2I_LoadImagePath": LoadImagePath,
    "X2I_MultiImagePaths": MultiImagePaths,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "X2I_MLLMLoader": "X2I MLLM Loader (TPU)",
    "X2I_MLLMEncode": "X2I MLLM Encode (TPU)",
    "X2I_ProjLoader": "X2I Proj Loader (TPU)",
    "X2I_LoadImagePath": "X2I Load Image Path",
    "X2I_MultiImagePaths": "X2I Multi Image Paths",
}
