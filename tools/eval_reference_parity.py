"""One-command reference-parity evaluation (BASELINE.md north star).

Runs the seed-matched generation protocol on real checkpoints and emits
CLIP-T (and, when a directory of reference-generated images is supplied,
CLIP-FID between the two sets) as JSON. This is the measurement the
reference never ships (SURVEY.md §5.5) applied at its exact operating
point (/root/reference/infer/inference_minicpm.py:181-215 — 4-step or
28-step sampling, guidance 3.5, 1024x1024).

Usage (the moment weights exist):

    python tools/eval_reference_parity.py \
        --model internvl1b \
        --flux_path /ckpts/shuttle-3-diffusion \
        --mllm_path /ckpts/InternVL2_5-1B \
        --proj_path /ckpts/proj/diffusion_pytorch_model.bin \
        --clip_path /ckpts/clip-vit-large-patch14 \
        --out parity.json [--reference_dir refs/] [--save_dir imgs/]

Prompt bank: defaults to the reference's English text2image prompts
(inference_minicpm.py:218-235 uses one prompt per language; pass
--prompts_file with one prompt per line to override).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

def _default_prompts():
    # the 6-language text2image bank (mirrors the reference protocol,
    # inference_minicpm.py:218-235)
    from x2i_tpu.prompts import text2image_bank
    return [p for _, p in text2image_bank()]


def load_images_dir(path: str) -> np.ndarray:
    from PIL import Image
    files = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")))
    if not files:
        raise FileNotFoundError(f"no images in {path}")
    return np.stack([
        np.asarray(Image.open(os.path.join(path, f)).convert("RGB"))
        for f in files])


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="internvl1b",
                    help="MODEL_REGISTRY name (internvl1b/4b, qwenvl3b/7b,"
                         " minicpm)")
    ap.add_argument("--flux_path", required=True,
                    help="diffusers FLUX dir (transformer/ + vae/)")
    ap.add_argument("--mllm_path", required=True)
    ap.add_argument("--proj_path", required=True,
                    help="reference diffusion_pytorch_model.bin")
    ap.add_argument("--clip_path", required=True,
                    help="HF CLIP dir (e.g. clip-vit-large-patch14)")
    ap.add_argument("--num_steps", type=int, default=4)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--prompts_file", default=None)
    ap.add_argument("--reference_dir", default=None,
                    help="reference-generated images for CLIP-FID")
    ap.add_argument("--save_dir", default=None)
    ap.add_argument("--no_quantize", action="store_true",
                    help="bf16 FLUX weights instead of int8 weight-only")
    ap.add_argument("--out", default="parity.json")
    args = ap.parse_args(argv)

    from x2i_tpu.convert.load import build_pipeline_from_checkpoints
    from x2i_tpu.evalmetrics import (build_clip_scorer, frechet_distance,
                                     seed_matched_protocol)

    prompts = _default_prompts()
    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]

    pipe = build_pipeline_from_checkpoints(
        args.model, args.flux_path, args.mllm_path, args.proj_path,
        num_steps=args.num_steps, height=args.height, width=args.width,
        quantized=not args.no_quantize)
    scorer = build_clip_scorer(args.clip_path)

    def generate(prompt: str, seed: int) -> np.ndarray:
        return pipe.text2image(prompt, seed=seed)

    images = seed_matched_protocol(generate, prompts, args.seeds)
    if args.save_dir:
        from PIL import Image
        os.makedirs(args.save_dir, exist_ok=True)
        i = 0
        for prompt in prompts:
            for seed in args.seeds:
                Image.fromarray(images[i]).save(os.path.join(
                    args.save_dir, f"p{i // len(args.seeds)}_s{seed}.png"))
                i += 1

    texts = [p for p in prompts for _ in args.seeds]
    clip_t = scorer.clip_t(images, texts)
    result = {
        "model": args.model,
        "num_steps": args.num_steps,
        "resolution": [args.height, args.width],
        "prompts": len(prompts),
        "seeds": args.seeds,
        "clip_t_mean": float(np.mean(clip_t)),
        "clip_t_per_image": [float(x) for x in clip_t],
    }
    if args.reference_dir:
        ref = load_images_dir(args.reference_dir)
        ours_f = np.asarray(scorer.image_features(images))
        ref_f = np.asarray(scorer.image_features(ref))
        result["clip_fid_vs_reference"] = frechet_distance(ours_f, ref_f)
        result["reference_clip_t_mean"] = float(
            np.mean(scorer.clip_t(ref, texts[:len(ref)])))

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
