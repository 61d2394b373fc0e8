#!/usr/bin/env python
"""Hardware benchmark of long-context MLLM prefill on one chip.

The reference accepts up to 32k-token multimodal prompts at inference
(/root/reference/infer/inference_minicpm.py:169) and runs them through
torch SDPA. Here the same prefill runs through the chunked online-softmax
Pallas kernel (ops/flash_attention.py), whose causal block skip halves the
attention MXU work — this tool measures that end-to-end on a full-size
Qwen2-family encoder LM.

Env: X2I_PREFILL_LM (0_5b|3b|7b, default 7b), X2I_PREFILL_S (default
32768), X2I_PREFILL_QUANT (w8a8|w8|bf16), X2I_PREFILL_SKIP_AB=1 to run the
causal-skip A/B (sets X2I_FA_NO_CAUSAL_SKIP for the B side),
X2I_PREFILL_PROJ=1 to run the full conditioning encode (prefill + proj)
via the scan-fused streaming mix.

X2I_PREFILL_PROJ=0 times the bare prefill returning only the final normed
hidden (B, S, H). With =1 it returns the proj outputs (pooled, seq): the
stacked all-layer export the reference feeds its proj
(torch.stack(hidden_states[0], dim=1)) is (B, L+1, S, H) = 6.8 GiB bf16 at
32k on the 7B shape and cannot sit next to the 7.1 GiB int8 params on a
16 GB chip — the streamed path (models/proj.py::streaming_mix_spec +
Qwen2LM.encode_premixed) accumulates the proj channel mix inside the layer
scan, keeping one (B, S, H) f32 buffer instead.

Measured 2026-08-18 (v5e, Qwen2.5-7B shape, w8a8, 32768 tokens):
  bare prefill, causal block skip ON : 4790 ms (6.8k tok/s)
  bare prefill, skip OFF (A/B)       : 7443 ms (4.4k tok/s)  -> 1.55x
  prefill + streamed proj (full 32k-token conditioning encode on one
  chip; the stacked path cannot allocate): 5590 ms (5.9k tok/s)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from x2i_tpu.models.qwen2 import Qwen2LM
    from tools._bench_common import pattern_params, qwen_lm_config

    kind = os.environ.get("X2I_PREFILL_LM", "7b")
    s = int(os.environ.get("X2I_PREFILL_S", "32768"))
    quant = os.environ.get("X2I_PREFILL_QUANT", "w8a8")
    with_proj = os.environ.get("X2I_PREFILL_PROJ", "0") == "1"
    cfg = qwen_lm_config(kind, False if quant == "bf16" else quant)
    print(f"backend: {jax.default_backend()}  lm={kind} quant={quant} "
          f"S={s} proj={with_proj}", flush=True)

    lm = Qwen2LM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (1, s)), jnp.int32)
    params = pattern_params(lm, ids)
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_bytes/2**30:.2f} GiB", flush=True)

    if with_proj:
        from x2i_tpu.core.config import ProjConfig
        from x2i_tpu.models.proj import Proj, streaming_mix_spec
        proj_cfg = ProjConfig(in_channels=cfg.num_layers_with_embedding,
                              input_dim=cfg.hidden_size)
        proj = Proj(proj_cfg)
        proj_params = proj.init(
            jax.random.key(0),
            jnp.zeros((1, proj_cfg.in_channels, 128, proj_cfg.input_dim),
                      jnp.bfloat16))

        def prefill(params, ids):
            weights, mix_fn = streaming_mix_spec(
                proj_cfg, proj_params, cfg.num_hidden_layers)
            mixed, _ = lm.apply(params, ids, weights, mix_fn,
                                method=Qwen2LM.encode_premixed)
            pooled, seq = proj.apply(proj_params, mixed, method=Proj.mlp)
            return pooled, seq
    else:
        def prefill(params, ids):
            return lm.apply(params, ids)[1]    # final normed hidden only

    def bench(tag):
        # a FRESH function object per run: jax's trace cache is keyed on
        # function identity, and the skip knob is read at trace time —
        # reusing `prefill` itself would silently reuse the first trace
        def fresh(params, ids):
            return prefill(params, ids)

        t0 = time.perf_counter()
        j = jax.jit(fresh).lower(params, ids).compile()
        print(f"[{tag}] compile: {time.perf_counter()-t0:.0f}s", flush=True)
        out = j(params, ids)
        jax.block_until_ready(out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        assert bool(jnp.isfinite(leaf.astype(jnp.float32)).all())
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            out = j(params, ids)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"[{tag}] prefill {s} tokens: {dt*1e3:.0f} ms "
              f"({s/dt/1e3:.1f}k tok/s)", flush=True)
        return dt

    dt_skip = bench("causal-skip")
    if os.environ.get("X2I_PREFILL_SKIP_AB", "0") == "1":
        os.environ["X2I_FA_NO_CAUSAL_SKIP"] = "1"
        dt_noskip = bench("no-skip")
        del os.environ["X2I_FA_NO_CAUSAL_SKIP"]
        print(f"causal block skip speedup: {dt_noskip/dt_skip:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
