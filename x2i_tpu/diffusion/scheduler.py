"""Flow-matching Euler discrete scheduler.

Re-implements the semantics of diffusers' FlowMatchEulerDiscreteScheduler as
driven by the reference (FluxPipeline sampling at
/root/reference/infer/inference_minicpm.py:181-215; 1-step distillation
timestep draw at /root/reference/train/train_minicpm.py:242-252,752-782;
phase-2 logit-normal sampling at
/root/reference/lightcontrol/train_lightcontrol.py:693-706), as pure
functions over static-shape arrays so the whole schedule lives inside jit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from x2i_tpu.core.config import SchedulerConfig


def calculate_shift(image_seq_len: int,
                    base_seq_len: int = 256,
                    max_seq_len: int = 4096,
                    base_shift: float = 0.5,
                    max_shift: float = 1.16) -> float:
    """Resolution-dependent mu (train_minicpm.py:242-252)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def _time_shift(mu: float, sigma_pow: float, t: jnp.ndarray) -> jnp.ndarray:
    return math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0) ** sigma_pow)


@dataclass(frozen=True)
class FlowMatchEulerScheduler:
    cfg: SchedulerConfig = SchedulerConfig()

    def inference_sigmas(self, num_inference_steps: int,
                         image_seq_len: Optional[int] = None) -> jnp.ndarray:
        """Sigma schedule incl. trailing 0: shape (num_steps + 1,).

        Matches FluxPipeline: sigmas = linspace(1, 1/n, n), then dynamic
        (exp-mu) or static shift.
        """
        sigmas = jnp.linspace(1.0, 1.0 / num_inference_steps,
                              num_inference_steps, dtype=jnp.float32)
        sigmas = self.shift_sigmas(sigmas, image_seq_len)
        return jnp.concatenate([sigmas, jnp.zeros((1,), jnp.float32)])

    def shift_sigmas(self, sigmas: jnp.ndarray,
                     image_seq_len: Optional[int] = None) -> jnp.ndarray:
        c = self.cfg
        if c.use_dynamic_shifting:
            if image_seq_len is None:
                raise ValueError("dynamic shifting requires image_seq_len")
            mu = calculate_shift(image_seq_len, c.base_image_seq_len,
                                 c.max_image_seq_len, c.base_shift,
                                 c.max_shift)
            return _time_shift(mu, 1.0, sigmas)
        return c.shift * sigmas / (1.0 + (c.shift - 1.0) * sigmas)

    @staticmethod
    def step(sample: jnp.ndarray, model_output: jnp.ndarray,
             sigma: jnp.ndarray, sigma_next: jnp.ndarray) -> jnp.ndarray:
        """One Euler step of the rectified flow ODE (f32 update)."""
        out = sample.astype(jnp.float32) + (
            (sigma_next - sigma) * model_output.astype(jnp.float32))
        return out.astype(sample.dtype)

    @staticmethod
    def add_noise(x0: jnp.ndarray, noise: jnp.ndarray,
                  sigma: jnp.ndarray) -> jnp.ndarray:
        """Flow-matching noising x_t = (1-σ)x0 + σz
        (train_lightcontrol.py:703-706)."""
        sigma = sigma.reshape(sigma.shape + (1,) * (x0.ndim - sigma.ndim))
        return ((1.0 - sigma) * x0.astype(jnp.float32)
                + sigma * noise.astype(jnp.float32)).astype(x0.dtype)


def compute_density_for_timestep_sampling(
        key: jax.Array, batch_size: int, scheme: str = "logit_normal",
        logit_mean: float = 0.0, logit_std: float = 1.0,
        mode_scale: float = 1.29) -> jnp.ndarray:
    """u ~ density over [0,1] (diffusers training util used by
    train_lightcontrol.py:693-701)."""
    if scheme == "logit_normal":
        u = logit_mean + logit_std * jax.random.normal(key, (batch_size,))
        return jax.nn.sigmoid(u)
    if scheme == "mode":
        u = jax.random.uniform(key, (batch_size,))
        return 1.0 - u - mode_scale * (jnp.cos(math.pi * u / 2) ** 2 - 1 + u)
    return jax.random.uniform(key, (batch_size,))


def loss_weighting(scheme: str, sigmas: jnp.ndarray) -> jnp.ndarray:
    """compute_loss_weighting_for_sd3 equivalent
    (train_lightcontrol.py:746-762)."""
    if scheme == "sigma_sqrt":
        return sigmas ** -2.0
    if scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas ** 2
        return 2.0 / (math.pi * bot)
    return jnp.ones_like(sigmas)
