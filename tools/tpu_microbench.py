#!/usr/bin/env python
"""Hardware microbenchmarks + validations for the Pallas kernels and
quantized matmuls (run on a real TPU; interpret-mode correctness is
covered by tests/). Emits timings for: fused attention backward at the
FLUX training point, the chunked 16k-token forward, and w8 vs w8a8
QuantDense matmuls."""
import sys; sys.path.insert(0, ".")
# Runs the hardware validations that interpret mode couldn't cover.
import numpy as np, jax, jax.numpy as jnp, time
print("backend:", jax.default_backend(), flush=True)
from x2i_tpu.ops import flash_attention as fa

rng = np.random.default_rng(0)
# 1) fused backward kernels compile+run at the FLUX training point
B,H,S,D = 1,24,4608,128
q = jnp.asarray(rng.standard_normal((B,H,S,D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B,H,S,D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B,H,S,D)), jnp.bfloat16)
grad_pallas = jax.jit(jax.grad(lambda q,k,v: jnp.sum(fa.flash_attention(q,k,v).astype(jnp.float32)**2), argnums=(0,1,2)))
grad_xla = jax.jit(jax.grad(lambda q,k,v: jnp.sum(fa.xla_attention(q,k,v).astype(jnp.float32)**2), argnums=(0,1,2)))
fwd_pallas = jax.jit(lambda q,k,v: fa.flash_attention(q,k,v))
t0=time.perf_counter()
g = grad_pallas(q,k,v)
jax.block_until_ready(g)
print(f"fused bwd kernels: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
gx = grad_xla(q,k,v)
errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)))) for a,b in zip(g, gx)]
print("bwd maxerr dq/dk/dv:", errs, flush=True)

def timeit(f, *a, n=20):
    jax.block_until_ready(f(*a))
    t0=time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

print(f"fwd per-iter (pallas): {timeit(fwd_pallas,q,k,v):.2f} ms", flush=True)
print(f"fwd+bwd per-iter (pallas): {timeit(grad_pallas,q,k,v):.2f} ms", flush=True)
print(f"fwd+bwd per-iter (xla): {timeit(grad_xla,q,k,v):.2f} ms", flush=True)

# 2) chunked forward at 16k tokens
S2 = 16384
q2 = jnp.asarray(rng.standard_normal((1,4,S2,128)), jnp.bfloat16)
k2 = jnp.asarray(rng.standard_normal((1,4,S2,128)), jnp.bfloat16)
v2 = jnp.asarray(rng.standard_normal((1,4,S2,128)), jnp.bfloat16)
t0=time.perf_counter()
o2 = jax.jit(lambda q,k,v: fa.flash_attention(q,k,v))(q2,k2,v2)
o2.block_until_ready()
print(f"chunked fwd 16k: compile+run {time.perf_counter()-t0:.0f}s finite={bool(jnp.isfinite(o2.astype(jnp.float32)).all())}", flush=True)

# 3) w8a8 QuantDense matmul on MXU
from x2i_tpu.ops.quant import QuantDense, quantize_kernel
x = jnp.asarray(rng.standard_normal((4096, 3072)), jnp.bfloat16)
w = rng.standard_normal((3072, 3072)).astype(np.float32) * 0.02
qk, sc = quantize_kernel(w)
params = {"params": {"qkernel": jnp.asarray(qk), "scale": jnp.asarray(sc),
                     "bias": jnp.zeros(3072, jnp.bfloat16)}}
for mode in ("w8", "w8a8"):
    f = jax.jit(lambda p, x: QuantDense(3072, mode=mode).apply(p, x))
    y = f(params, x); y.block_until_ready()
    t0=time.perf_counter()
    for _ in range(50): y = f(params, x)
    y.block_until_ready()
    print(f"{mode} 4096x3072x3072 matmul: {(time.perf_counter()-t0)/50*1e3:.3f} ms", flush=True)

# 4) causal block skip in the chunked kernel (32k MLLM prefill):
# kv blocks above the causal diagonal are skipped, so the long-prefill
# matmul work halves vs a mask-everything kernel. Compare vs XLA SDPA.
S3 = 32768
q3 = jnp.asarray(rng.standard_normal((1, 2, S3, 128)), jnp.bfloat16)
k3 = jnp.asarray(rng.standard_normal((1, 2, S3, 128)), jnp.bfloat16)
v3 = jnp.asarray(rng.standard_normal((1, 2, S3, 128)), jnp.bfloat16)
causal_pallas = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v,
                                                           causal=True))
o3 = causal_pallas(q3, k3, v3); o3.block_until_ready()
ms = timeit(causal_pallas, q3, k3, v3, n=5)
flops = 2 * 2 * S3 * S3 * 128 * 2 / 2        # qk+pv, halved by causality
print(f"causal chunked 32k prefill (pallas): {ms:.1f} ms "
      f"({flops/ms/1e9:.1f} TFLOP/s effective)", flush=True)
causal_xla = jax.jit(lambda q, k, v: fa.xla_attention(q, k, v, causal=True))
try:
    o3x = causal_xla(q3, k3, v3); o3x.block_until_ready()
    print(f"causal 32k prefill (xla): {timeit(causal_xla, q3, k3, v3, n=3):.1f} ms",
          flush=True)
    err = float(jnp.max(jnp.abs(o3.astype(jnp.float32) - o3x.astype(jnp.float32))))
    print(f"causal 32k maxerr pallas-vs-xla: {err:.4f}", flush=True)
except Exception as e:
    print("xla 32k causal failed (memory):", str(e)[:120], flush=True)
