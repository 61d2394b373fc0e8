"""Evaluation metrics: CLIP-T score and seed-matched comparison protocol.

The reference computes no eval metrics in-repo (SURVEY.md §5.5); BASELINE.md
defines quality as CLIP-T / FID delta vs reference outputs under a
seed-matched protocol (fixed seeds + prompts; bitwise latents are impossible
across torch/JAX RNGs). This module provides:

  * CLIPScorer: image-text cosine similarity with full CLIP (text tower +
    vision tower + projections + logit scale),
  * image feature extraction for FID-style statistics (mean/cov + Fréchet
    distance over any embedding, CLIP features by default — "CLIP-FID").
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from x2i_tpu.models.clip import (CLIPTextConfig, CLIPTextEncoder,
                                 CLIPVisionConfig, CLIPVisionEncoder)

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_clip_images(images: np.ndarray,
                           size: int = 224) -> np.ndarray:
    """uint8 (B, H, W, 3) -> CLIP-normalized (B, size, size, 3) f32."""
    from PIL import Image
    out = []
    for img in images:
        pil = Image.fromarray(np.asarray(img, np.uint8)).resize(
            (size, size), Image.BICUBIC)
        out.append((np.asarray(pil, np.float32) / 255.0 - CLIP_MEAN)
                   / CLIP_STD)
    return np.stack(out)


@dataclasses.dataclass
class CLIPScorer:
    """Full CLIP scoring head. Projections map both towers to the shared
    space; score = 100 * cosine(image, text) (the standard CLIP-T)."""

    text_model: CLIPTextEncoder
    text_params: Any
    vision_model: CLIPVisionEncoder
    vision_params: Any
    text_projection: jnp.ndarray        # (text_hidden, proj)
    visual_projection: jnp.ndarray      # (vision_hidden, proj)
    tokenize: Callable[[str], np.ndarray]

    def text_features(self, texts: Sequence[str]) -> jnp.ndarray:
        ids = np.stack([self.tokenize(t) for t in texts])
        _, pooled = self.text_model.apply(self.text_params,
                                          jnp.asarray(ids))
        feats = pooled.astype(jnp.float32) @ self.text_projection
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def image_features(self, images: np.ndarray) -> jnp.ndarray:
        px = preprocess_clip_images(images,
                                    self.vision_model.cfg.image_size)
        _, pooled = self.vision_model.apply(self.vision_params,
                                            jnp.asarray(px))
        feats = pooled.astype(jnp.float32) @ self.visual_projection
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def clip_t(self, images: np.ndarray,
               texts: Sequence[str]) -> np.ndarray:
        """Per-pair CLIP-T scores (B,)."""
        img = self.image_features(images)
        txt = self.text_features(texts)
        return np.asarray(100.0 * jnp.sum(img * txt, axis=-1))


def build_clip_scorer(clip_path: str,
                      dtype=jnp.float32) -> "CLIPScorer":
    """One-call loader: HF CLIP checkpoint directory -> CLIPScorer.

    Reads config.json + weights (safetensors or pytorch_model.bin) of a
    `transformers.CLIPModel` export (e.g. openai/clip-vit-large-patch14 —
    the text tower the reference loads at /root/reference/infer/
    inference_minicpm.py:67), converts both towers + projections to the
    flax modules, and builds the BPE tokenize callable via the checkpoint's
    own tokenizer files. Eval runs in f32 by default for score stability.
    """
    import json
    import os

    from x2i_tpu.convert.load import load_safetensors_dir, load_torch_bin
    from x2i_tpu.convert.torch_models import (_np, clip_params_from_hf,
                                              clip_vision_params_from_hf)

    with open(os.path.join(clip_path, "config.json")) as f:
        hf_cfg = json.load(f)
    tc, vc = hf_cfg["text_config"], hf_cfg["vision_config"]
    proj_dim = hf_cfg.get("projection_dim", 768)

    text_cfg = CLIPTextConfig(
        vocab_size=tc.get("vocab_size", 49408),
        hidden_size=tc.get("hidden_size", 768),
        intermediate_size=tc.get("intermediate_size", 3072),
        num_hidden_layers=tc.get("num_hidden_layers", 12),
        num_attention_heads=tc.get("num_attention_heads", 12),
        max_position_embeddings=tc.get("max_position_embeddings", 77),
        eos_token_id=tc.get("eos_token_id", 49407),
        dtype=dtype, param_dtype=dtype)
    vision_cfg = CLIPVisionConfig(
        hidden_size=vc.get("hidden_size", 1024),
        intermediate_size=vc.get("intermediate_size", 4096),
        num_hidden_layers=vc.get("num_hidden_layers", 24),
        num_attention_heads=vc.get("num_attention_heads", 16),
        image_size=vc.get("image_size", 224),
        patch_size=vc.get("patch_size", 14),
        projection_dim=proj_dim, dtype=dtype, param_dtype=dtype)

    try:
        sd = load_safetensors_dir(clip_path)
    except FileNotFoundError:
        sd = load_torch_bin(os.path.join(clip_path, "pytorch_model.bin"))

    text_params = clip_params_from_hf(sd, text_cfg.num_hidden_layers)
    vision_params = clip_vision_params_from_hf(
        sd, vision_cfg.num_hidden_layers)
    text_projection = jnp.asarray(_np(sd["text_projection.weight"]).T,
                                  dtype)
    visual_projection = jnp.asarray(_np(sd["visual_projection.weight"]).T,
                                    dtype)

    from transformers import CLIPTokenizerFast
    tok = CLIPTokenizerFast.from_pretrained(clip_path)
    max_len = text_cfg.max_position_embeddings

    def tokenize(text: str) -> np.ndarray:
        return np.asarray(
            tok(text, padding="max_length", truncation=True,
                max_length=max_len)["input_ids"], np.int32)

    return CLIPScorer(
        text_model=CLIPTextEncoder(text_cfg),
        text_params={"params": text_params},
        vision_model=CLIPVisionEncoder(vision_cfg),
        vision_params={"params": vision_params},
        text_projection=text_projection,
        visual_projection=visual_projection,
        tokenize=tokenize)


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """scipy-free Fréchet distance (FID with inception-style features;
    CLIP features here => 'CLIP-FID'): trace term via eigenvalues of
    cov_a @ cov_b (trace sqrtm(A B) == sum sqrt eig(A B))."""
    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    cov_a = np.cov(feats_a, rowvar=False)
    cov_b = np.cov(feats_b, rowvar=False)
    diff = float(((mu_a - mu_b) ** 2).sum())
    eig = np.linalg.eigvals(cov_a @ cov_b)
    tr_sqrt = float(np.sqrt(np.maximum(eig.real, 0.0)).sum())
    return diff + float(np.trace(cov_a) + np.trace(cov_b)) - 2.0 * tr_sqrt


def seed_matched_protocol(generate: Callable[[str, int], np.ndarray],
                          prompts: Sequence[str],
                          seeds: Sequence[int]) -> np.ndarray:
    """Run the BASELINE seed-matched generation grid: one image per
    (prompt, seed); returns (len(prompts)*len(seeds), H, W, 3) uint8."""
    out = []
    for prompt in prompts:
        for seed in seeds:
            out.append(generate(prompt, seed)[0])
    return np.stack(out)
