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
