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


def kl_term(teacher: jnp.ndarray, student: jnp.ndarray,
            tau: float) -> jnp.ndarray:
    """One block's KD term over (B, S, D), 'batchmean' reduction."""
    b = teacher.shape[0]
    logp_t = jax.nn.log_softmax(normalize_logit(teacher) / tau, axis=-1)
    log_q_s = jax.nn.log_softmax(normalize_logit(student) / tau, axis=-1)
    q_s = jnp.exp(log_q_s)
    kl = jnp.sum(q_s * (log_q_s - logp_t)) / b
    return jnp.where(jnp.isfinite(kl), kl, 0.0)
