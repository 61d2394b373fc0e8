"""Block-wise 8-bit Adam state (bitsandbytes AdamW8bit equivalent).

The reference trains the proj with bnb.optim.AdamW8bit
(/root/reference/train/train_minicpm.py:441-451) to shrink optimizer
memory. TPU equivalent: quantize the Adam first/second moments to int8 with
per-block (128-element) absmax scales between steps — the same dynamic
block-wise scheme bitsandbytes uses — implemented as an optax
GradientTransformation wrapping adamw's update math in f32.

State memory: 2 moments x (1 byte + 4/128 scale bytes) per param vs 8
bytes f32 -> ~3.9x smaller.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 128


# Moments are stored as float8_e4m3 with per-block absmax scales: 1 byte
# per entry like bitsandbytes' dynamic 8-bit map, with the wide dynamic
# range the second moment needs (linear int8 zeroes small entries within a
# block and makes 1/sqrt(nu) explode).
_F8_MAX = 448.0


def _quantize(x: jnp.ndarray):
    flat = x.reshape(-1)
    pad = (-flat.size) % BLOCK
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / _F8_MAX
    scale = jnp.maximum(scale, 1e-30)
    q = (blocks / scale).astype(jnp.float8_e4m3fn)
    return q, scale.astype(jnp.float32)


def _dequantize(q: jnp.ndarray, scale: jnp.ndarray, shape) -> jnp.ndarray:
    flat = (q.astype(jnp.float32) * scale).reshape(-1)
    n = 1
    for s in shape:
        n *= s
    return flat[:n].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    mu_q: Any
    mu_scale: Any
    nu_q: Any
    nu_scale: Any


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8,
              weight_decay: float = 1e-2) -> optax.GradientTransformation:
    lr_fn = (learning_rate if callable(learning_rate)
             else (lambda _: learning_rate))

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: _quantize(jnp.zeros_like(p, jnp.float32)), params)
        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu_q=jax.tree_util.tree_map(lambda t: t[0], mu,
                                        is_leaf=lambda x: isinstance(
                                            x, tuple)),
            mu_scale=jax.tree_util.tree_map(lambda t: t[1], mu,
                                            is_leaf=lambda x: isinstance(
                                                x, tuple)),
            nu_q=jax.tree_util.tree_map(lambda t: t[0], mu,
                                        is_leaf=lambda x: isinstance(
                                            x, tuple)),
            nu_scale=jax.tree_util.tree_map(lambda t: t[1], mu,
                                            is_leaf=lambda x: isinstance(
                                                x, tuple)),
        )

    def update_fn(grads, state, params):
        count = state.count + 1
        lr = lr_fn(state.count)

        def one(g, p, mq, ms, nq, ns):
            g = g.astype(jnp.float32)
            mu = _dequantize(mq, ms, g.shape)
            nu = _dequantize(nq, ns, g.shape)
            mu = b1 * mu + (1 - b1) * g
            nu = b2 * nu + (1 - b2) * g * g
            mu_hat = mu / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu / (1 - b2 ** count.astype(jnp.float32))
            upd = -(lr * (mu_hat / (jnp.sqrt(nu_hat) + eps)
                          + weight_decay * p.astype(jnp.float32)))
            return upd.astype(p.dtype), _quantize(mu), _quantize(nu)

        out = jax.tree_util.tree_map(one, grads, params, state.mu_q,
                                     state.mu_scale, state.nu_q,
                                     state.nu_scale)
        is3 = lambda x: isinstance(x, tuple) and len(x) == 3
        updates = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is3)
        mu = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is3)
        nu = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=is3)
        is2 = lambda x: isinstance(x, tuple) and len(x) == 2

        new_state = Adam8bitState(
            count=count,
            mu_q=jax.tree_util.tree_map(lambda t: t[0], mu, is_leaf=is2),
            mu_scale=jax.tree_util.tree_map(lambda t: t[1], mu,
                                            is_leaf=is2),
            nu_q=jax.tree_util.tree_map(lambda t: t[0], nu, is_leaf=is2),
            nu_scale=jax.tree_util.tree_map(lambda t: t[1], nu,
                                            is_leaf=is2),
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)
