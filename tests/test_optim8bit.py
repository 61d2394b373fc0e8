"""8-bit Adam: tracks f32 adamw closely on a quadratic, state is int8."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from x2i_tpu.train.optim8bit import adamw8bit


def _train(opt, steps=60):
    params = {"w": jnp.asarray(np.linspace(-2, 2, 300).astype(np.float32)
                               .reshape(3, 100))}
    target = jnp.ones((3, 100))
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(
            lambda p: jnp.mean((p["w"] - target) ** 2))(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(steps):
        params, state = step(params, state)
    return params, state


def test_adamw8bit_matches_adamw_trajectory():
    p8, s8 = _train(adamw8bit(1e-2))
    p32, _ = _train(optax.adamw(1e-2))
    final8 = np.asarray(p8["w"])
    final32 = np.asarray(p32["w"])
    # both should move decisively toward the target and agree closely
    # (fp8 moment noise causes small drift, same class as bitsandbytes)
    assert np.abs(final32 - final8).max() < 0.1
    assert np.abs(final8 - 1.0).mean() < np.abs(
        np.linspace(-2, 2, 300) - 1).mean() * 0.9


def test_state_is_int8():
    opt = adamw8bit(1e-3)
    params = {"w": jnp.zeros((300,))}
    state = opt.init(params)
    assert state.mu_q["w"].dtype == jnp.float8_e4m3fn
    assert state.nu_q["w"].dtype == jnp.float8_e4m3fn


def test_quantize_roundtrip():
    from x2i_tpu.train.optim8bit import _dequantize, _quantize
    x = jnp.asarray(np.random.default_rng(0).standard_normal(200),
                    jnp.float32)
    q, s = _quantize(x)
    back = _dequantize(q, s, x.shape)
    # e4m3: ~4% relative error worst case
    rel = jnp.abs(back - x) / (jnp.abs(x) + 1e-6)
    assert float(jnp.median(rel)) < 0.05
    # small entries must NOT collapse to zero (the int8 failure mode)
    small = jnp.abs(x) < 0.01
    assert float(jnp.abs(back[small]).min()) > 0 or not bool(small.any())
