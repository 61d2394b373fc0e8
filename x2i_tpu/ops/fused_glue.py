"""Fused row-local glue kernels for the w8a8 inference path.

Between the int8 MXU matmuls, the DiT spends ~20% of its step time in
elementwise glue (profile_generate.py breakdown in DESIGN.md): LayerNorm +
AdaLN modulate feeding the attention/MLP projections, gelu feeding the MLP
out-projection, and the dynamic per-token activation quantization that
w8a8_matmul performs on each of those inputs. Every one of these stages is
ROW-LOCAL (LayerNorm statistics, the modulate broadcast, gelu, and the
per-token abs-max all operate within one (token, D) row), but XLA compiles
them as a chain of reduce + elementwise fusions that re-reads the 28-113 MB
activation from HBM once per stage: mean/var pass, normalize+modulate pass,
abs-max pass, scale+round pass.

These Pallas kernels do each chain in ONE pass: load a row tile into VMEM
once, compute the f32 statistics, the bf16 intermediate (rounded where the
XLA path rounds — int8 codes agree with the unfused chain to within one
quantization step; bit-exactness across differently-fused compilations is
not attainable, see tests/test_fused_glue.py), the row abs-max, and store
int8 + per-row scale.
Consumed by quant.w8a8_matmul_prequant via QuantDense's (xq, a_scale)
input form. Inference-only: no custom_vjp (training keeps the XLA glue —
the student step differentiates through these stages).

Reference behavior being fused: the LayerNorm/modulate/gelu stages of
/root/reference/lightcontrol/lightcontrol_flux.py:59-104,108-204 around
torch Linears; the quantization stage is this framework's own w8a8 design
(ops/quant.py) with identical math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _row_quantize(mf: jnp.ndarray):
    """f32 (R, D) -> (int8 (R, D), f32 scale (R, 1)); must match
    quant.w8a8_matmul's dynamic activation quantization bit-for-bit."""
    amax = jnp.max(jnp.abs(mf), axis=-1, keepdims=True)
    a_scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(mf / a_scale), -127, 127).astype(jnp.int8)
    return q, a_scale


def _ln_modulate(x_ref, shift_ref, scale_ref, *, eps: float):
    """Shared LN+modulate body of the two ln_mod kernels (quantizing and
    same-dtype) — one definition so their numerics cannot drift."""
    x = x_ref[0].astype(jnp.float32)                      # (R, D)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    # round to the storage dtype exactly where the unfused path does
    # (ops/norms.layer_norm returns input-dtype), so downstream stages
    # see the same values
    y = (xc * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
    return y * (1.0 + scale_ref[0, 0][None, :]) + shift_ref[0, 0][None, :]


def _ln_mod_quant_kernel(x_ref, shift_ref, scale_ref, q_ref, s_ref, *,
                         eps: float):
    m = _ln_modulate(x_ref, shift_ref, scale_ref, eps=eps)
    q, a = _row_quantize(m.astype(jnp.float32))
    q_ref[0] = q
    s_ref[0] = a


def _gelu_quant_kernel(x_ref, q_ref, s_ref):
    g = jax.nn.gelu(x_ref[0].astype(jnp.float32), approximate=True)
    g = g.astype(x_ref.dtype)            # match nn.gelu's bf16 output
    q, a = _row_quantize(g.astype(jnp.float32))
    q_ref[0] = q
    s_ref[0] = a


def _quant_kernel(x_ref, q_ref, s_ref):
    q, a = _row_quantize(x_ref[0].astype(jnp.float32))
    q_ref[0] = q
    s_ref[0] = a


def _ln_mod_kernel(x_ref, shift_ref, scale_ref, o_ref, *, eps: float):
    """LayerNorm + modulate in one pass, same-dtype output (no quantize):
    the glue fusion for weight-only (w8/w4) and bf16 inference, where the
    matmuls take bf16 activations directly."""
    o_ref[0] = _ln_modulate(x_ref, shift_ref, scale_ref,
                            eps=eps).astype(x_ref.dtype)


def _rows_call(kernel, x, extra=(), block_rows: int = 256,
               interpret: bool = False, out: str = "quant"):
    """Launch a row-local kernel over (B, S, D) with optional per-batch
    (B, D) extras. Rows are independent, so a ragged final block is safe:
    out-of-range rows compute garbage that is dropped on store.
    out="quant" -> (int8 codes, f32 row scales); out="same" -> one array
    in x.dtype."""
    batch, seq, dim = x.shape
    br = min(block_rows, seq)
    grid = (batch, pl.cdiv(seq, br))
    in_specs = [pl.BlockSpec((1, br, dim), lambda b, r: (b, r, 0))]
    # extras ride as (B, 1, D): a (B, D) array with a (1, D) block violates
    # Mosaic's last-two-dims rule as soon as B > 1 (1 is neither
    # 8-divisible nor equal to B); with the unit middle axis the block's
    # last two dims (1, D) equal the array's for any batch.
    extra = tuple(e[:, None, :] for e in extra)
    for _ in extra:
        in_specs.append(pl.BlockSpec((1, 1, dim), lambda b, r: (b, 0, 0)))
    if out == "same":
        out_specs = pl.BlockSpec((1, br, dim), lambda b, r: (b, r, 0))
        out_shape = jax.ShapeDtypeStruct((batch, seq, dim), x.dtype)
    else:
        out_specs = (pl.BlockSpec((1, br, dim), lambda b, r: (b, r, 0)),
                     pl.BlockSpec((1, br, 1), lambda b, r: (b, r, 0)))
        out_shape = (jax.ShapeDtypeStruct((batch, seq, dim), jnp.int8),
                     jax.ShapeDtypeStruct((batch, seq, 1), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, *extra)


def ln_mod_quant(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray,
                 eps: float = 1e-6, block_rows: int = 256,
                 interpret: bool = False):
    """quantize(modulate(layer_norm(x), shift, scale)) in one HBM pass.

    x (B, S, D); shift/scale (B, D) AdaLN rows. Returns (xq int8 (B,S,D),
    a_scale f32 (B,S,1)) — the (xq, a_scale) input form of QuantDense.
    Matches layer_norm (ops/norms.py) + _modulate (models/flux.py) +
    w8a8_matmul's activation quantization (ops/quant.py) numerics."""
    return _rows_call(functools.partial(_ln_mod_quant_kernel, eps=eps),
                      x, (shift, scale), block_rows, interpret)


def ln_mod(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray,
           eps: float = 1e-6, block_rows: int = 256,
           interpret: bool = False) -> jnp.ndarray:
    """modulate(layer_norm(x), shift, scale) in one HBM pass, x.dtype out.

    The no-quantize sibling of ln_mod_quant for the weight-only (w8/w4)
    and bf16 inference paths: XLA compiles the unfused chain as a reduce
    fusion (mean/var) plus a normalize+modulate fusion — two full reads of
    the (B, S, D) activation; this kernel does both in one."""
    return _rows_call(functools.partial(_ln_mod_kernel, eps=eps),
                      x, (shift, scale), block_rows, interpret, out="same")


def gelu_quant(x: jnp.ndarray, block_rows: int = 128,
               interpret: bool = False):
    """quantize(gelu(x)) in one HBM pass; x (B, S, D) is the MLP mid
    activation (D = 4*dim, so the default row tile is smaller)."""
    return _rows_call(_gelu_quant_kernel, x, (), block_rows, interpret)


def quant_rows(x: jnp.ndarray, block_rows: int = 256,
               interpret: bool = False):
    """Plain per-token quantization in one HBM pass (for inputs that need
    no preceding pointwise stage, e.g. attention outputs feeding their
    out-projection)."""
    return _rows_call(_quant_kernel, x, (), block_rows, interpret)
