"""Attention-distillation KD math (shared by the trainer and the inline
per-block path inside the DiT scan).

Semantics from /root/reference/train/train_minicpm.py:63-66,606-625:
term = F.kl_div(log_softmax(normalize(teacher)/tau),
                softmax(normalize(student)/tau), 'batchmean'),
normalize = (x - mean)/(1e-7 + std) with Bessel-corrected std; non-finite
terms are skipped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_logit(x: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    n = xf.shape[-1]
    var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / (n - 1)
    return (xf - mean) / (eps + jnp.sqrt(var))


def kl_term(teacher, student: jnp.ndarray, tau: float) -> jnp.ndarray:
    """One block's KD term over (B, S, D), 'batchmean' reduction.

    teacher may be a dense array or an int8-quantized (values, scales)
    pair from quantize_kd_stacks."""
    teacher = dequantize_kd(teacher)
    b = teacher.shape[0]
    logp_t = jax.nn.log_softmax(normalize_logit(teacher) / tau, axis=-1)
    log_q_s = jax.nn.log_softmax(normalize_logit(student) / tau, axis=-1)
    q_s = jnp.exp(log_q_s)
    kl = jnp.sum(q_s * (log_q_s - logp_t)) / b
    return jnp.where(jnp.isfinite(kl), kl, 0.0)


def quantize_kd_tensor(x: jnp.ndarray):
    """Per-token symmetric int8 quantization: (..., D) -> ((..., D) int8,
    (...,) f32 scales)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale[..., 0]


def quantize_kd_stacks(aux: dict) -> dict:
    """Per-token int8 quantization of the teacher KD stacks.

    The (B, L, S, 3072) bf16 stacks are ~1.6 GB/batch-element at the
    reference training point (SURVEY §7.3.3); the KD loss normalizes each
    token's logits anyway, so per-token int8 is essentially free noise
    under tau=3 smoothing. Halves HBM residency in the colocated step and
    the infer->train transfer in the disaggregated topology (the reference
    ships these bf16 over NCCL, train_minicpm.py:812-824). To avoid ever
    materializing the bf16 stacks, prefer the in-scan path
    (FluxTransformer2D quantize_attn_outputs=True)."""
    return {key: quantize_kd_tensor(x) for key, x in aux.items()}


def dequantize_kd(t):
    """Inverse of quantize_kd_stacks for one stack (or passthrough)."""
    if isinstance(t, tuple):
        q, scale = t
        return q.astype(jnp.float32) * scale[..., None]
    return t
