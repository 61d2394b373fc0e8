"""Checkpoint conversion CLI: torch/safetensors -> native orbax trees.

Production serving shouldn't re-run the torch->JAX conversion (and a torch
import) at every startup; this converts once:

  python -m x2i_tpu.convert.cli flux   --src <diffusers_dir> --dst out/flux
  python -m x2i_tpu.convert.cli vae    --src <diffusers_dir> --dst out/vae
  python -m x2i_tpu.convert.cli mllm   --model x2i-internvl2.5-1b \
      --src <hf_dir> --dst out/mllm
  python -m x2i_tpu.convert.cli proj   --model x2i-internvl2.5-1b \
      --src proj.bin --dst out/proj
  (--quantize w8|w8a8|w4 stores int8/int4 kernels for single-chip serving)

Load back with load_native(dst).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Any


def save_native(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_native(path: str) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def main(argv=None) -> int:
    p = argparse.ArgumentParser("x2i_tpu.convert")
    p.add_argument("kind", choices=("flux", "vae", "mllm", "proj",
                                    "t5", "clip"))
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--model", default="x2i-internvl2.5-1b",
                   help="registry name (for flux/mllm/proj configs)")
    p.add_argument("--quantize", choices=("w8", "w8a8", "w4"), default=None)
    args = p.parse_args(argv)

    from x2i_tpu.core.config import MODEL_REGISTRY, VAEConfig
    from x2i_tpu.convert import hf_config as H
    from x2i_tpu.convert import load as L
    from x2i_tpu.convert import torch_models as T

    # like build_pipeline_from_checkpoints: the directory's own config
    # files win, registry entries are the fallback
    entry = MODEL_REGISTRY[args.model]
    if args.kind == "flux":
        sd = L.load_safetensors_dir(os.path.join(args.src, "transformer")
                                    if os.path.isdir(os.path.join(
                                        args.src, "transformer"))
                                    else args.src)
        flux_cfg = H.flux_config_from_dir(args.src, base=entry["flux"]) \
            or entry["flux"]
        tree = T.flux_params_from_diffusers(sd, flux_cfg)
        if args.quantize:
            from x2i_tpu.ops.quant import quantize_tree
            tree = quantize_tree(tree, mode=args.quantize)
    elif args.kind == "vae":
        sd = L.load_safetensors_dir(os.path.join(args.src, "vae")
                                    if os.path.isdir(os.path.join(
                                        args.src, "vae")) else args.src)
        tree = L.vae_params_from_diffusers(
            sd, H.vae_config_from_dir(args.src) or VAEConfig())
    elif args.kind == "mllm":
        sd = L.load_safetensors_dir(args.src)
        if "internvl" in args.model:
            cfg = H.internvl_config_from_dir(args.src, entry["mllm"]) \
                or entry["mllm"]
            tree = L.internvl_params_from_hf(sd, cfg)
        elif "qwenvl" in args.model:
            full = H.qwenvl_config_from_dir(args.src, entry["mllm"])
            tree = L.qwen2_5_vl_params_from_hf(
                sd, full.llm if full else entry["mllm"],
                vision_depth=full.vision.depth if full else 32)
        else:
            from x2i_tpu.models.minicpmo import MiniCPMOConfig
            cfg = H.minicpmo_config_from_dir(args.src, entry["mllm"]) \
                or MiniCPMOConfig(llm=entry["mllm"])
            tree = L.minicpmo_params_from_hf(sd, cfg)
    elif args.kind == "proj":
        proj_sd = L.load_torch_bin(args.src)
        tree = T.proj_params_from_reference(
            proj_sd, H.proj_config_from_sd(proj_sd, base=entry["proj"]))
    elif args.kind == "t5":
        from x2i_tpu.models.t5 import T5Config
        tree = T.t5_params_from_hf(L.load_safetensors_dir(args.src),
                                   T5Config().num_layers)
    else:  # clip
        from x2i_tpu.models.clip import CLIPTextConfig
        tree = T.clip_params_from_hf(L.load_safetensors_dir(args.src),
                                     CLIPTextConfig().num_hidden_layers)

    save_native(args.dst, tree)
    n = sum(x.size for x in _leaves(tree))
    print(f"converted {args.kind}: {n / 1e6:.1f}M params -> {args.dst}")
    return 0


def _leaves(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    raise SystemExit(main())
