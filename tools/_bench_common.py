"""Shared helpers for the TPU bench/probe tools."""
import functools

import jax
import jax.numpy as jnp


def pattern_params(model, *example, method=None):
    """Full-size params without tracing init at scale: eval_shape the init,
    then pattern-fill on device (int8 iota pattern, norm scales one, tiny
    bf16 embed values — same matmul cost as real weights, no 2x uint32
    jax.random intermediates that OOM a 16 GB chip at 12B params)."""
    kwargs = {} if method is None else {"method": method}
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), *example, **kwargs))

    @functools.partial(jax.jit, static_argnums=0)
    def _int8(shape):
        flat = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
        row = jax.lax.broadcasted_iota(jnp.int32, shape,
                                       max(len(shape) - 2, 0))
        return ((flat * 31 + row * 7) % 251 - 125).astype(jnp.int8)

    def make(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.dtype == jnp.int8:
            return _int8(leaf.shape)
        if "pre_scale" in name:           # w4 AWQ equalization: identity
            return jnp.ones(leaf.shape, jnp.float32)
        if leaf.dtype == jnp.float32 and "scale" in name:
            return jnp.full(leaf.shape, 2e-4, jnp.float32)
        if "embed" in name:
            flat = jax.lax.broadcasted_iota(jnp.int32, leaf.shape,
                                            leaf.ndim - 1)
            return (((flat * 13) % 61 - 30) / 600.0).astype(leaf.dtype)
        if "norm" in name and leaf.ndim == 1:
            return jnp.ones(leaf.shape, leaf.dtype)
        return jnp.zeros(leaf.shape, leaf.dtype)

    return jax.tree_util.tree_map_with_path(make, shapes)


def qwen_lm_config(kind: str, quant):
    """Qwen2-family LM shapes used by the X2I encoders (SURVEY §2.10).
    kind: 0_5b (InternVL2.5-1B LM / Qwen2.5-0.5B shape, the Qwen2Config
    default) | 3b | 7b (the reference flagship,
    /root/reference/infer/inference_qwenvl.py)."""
    from x2i_tpu.core.config import Qwen2Config
    if kind == "3b":
        return Qwen2Config(
            vocab_size=151936, hidden_size=2048, intermediate_size=11008,
            num_hidden_layers=36, num_attention_heads=16,
            num_key_value_heads=2, head_dim=128, quantized=quant)
    if kind == "7b":
        return Qwen2Config(
            vocab_size=152064, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28,
            num_key_value_heads=4, head_dim=128, quantized=quant)
    return Qwen2Config(quantized=quant)
