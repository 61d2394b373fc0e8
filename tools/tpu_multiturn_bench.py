#!/usr/bin/env python
"""Multi-turn session at FLAGSHIP shapes on one chip.

VERDICT r4 item 7: the REPL/MultiTurnSession are tested tiny/CPU only;
this drives a scripted multi-turn session against the flagship serving
stack — Qwen2.5-7B-shape encoder LM (w8a8, pattern weights) + w4 12B DiT
+ VAE resident on ONE 16 GB v5e — and records ms/turn broken into
decode (prefill + 128-token answer decode with hidden export) and image
generation, with the chat history growing turn over turn.

The turn program IS MultiTurnSession.turn's computation
(x2i_tpu/multiturn.py:59-79 — embed -> greedy_decode_with_hiddens ->
concat_answer_hiddens -> proj), jitted as one program with the prompt
padded to a fixed 512-token budget (right-padding-aware decode), plus
the existing generate program at s_txt = 512 + 128 conditioning tokens.
Mirrors /root/reference/infer/inference_multi_turn.py:132-156 (prefill
AND answer states conditioning, fixed seed per turn).

Env: X2I_MT_TURNS (default 4), X2I_MT_PX (1024), X2I_MT_NEW (128).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from x2i_tpu.core.config import (FluxConfig, ProjConfig,
                                     SchedulerConfig, VAEConfig)
    from x2i_tpu.diffusion import (FlowMatchEulerScheduler, denoise_flux,
                                   prepare_latent_image_ids,
                                   unpack_latents)
    from x2i_tpu.models.decoding import (concat_answer_hiddens,
                                         greedy_decode_with_hiddens)
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.proj import Proj
    from x2i_tpu.models.qwen2 import Qwen2LM
    from x2i_tpu.models.vae import AutoencoderKL
    from __graft_entry__ import _full_size_quantized_flux_params
    from tools._bench_common import pattern_params, qwen_lm_config

    turns = int(os.environ.get("X2I_MT_TURNS", "4"))
    px = int(os.environ.get("X2I_MT_PX", "1024"))
    max_new = int(os.environ.get("X2I_MT_NEW", "128"))
    s0 = 512
    s_txt = s0 + max_new                 # conditioning = prefill + answer
    print(f"backend: {jax.default_backend()}  turns={turns} px={px} "
          f"prefill={s0}+{max_new}", flush=True)

    lm_cfg = qwen_lm_config("7b", "w8a8")
    lm = Qwen2LM(lm_cfg)
    ids0 = jnp.zeros((1, s0), jnp.int32)
    lm_params = pattern_params(lm, ids0)

    proj_cfg = ProjConfig(in_channels=lm_cfg.num_layers_with_embedding,
                          input_dim=lm_cfg.hidden_size)
    proj = Proj(proj_cfg)
    proj_params = proj.init(
        jax.random.key(0),
        jnp.zeros((1, proj_cfg.in_channels, s_txt, proj_cfg.input_dim),
                  jnp.bfloat16))

    flux_cfg = FluxConfig(quantized="w4", guidance_embeds=False,
                          fused_glue=True)
    flux = FluxTransformer2D(flux_cfg)
    grid = px // 8
    s_img = (grid // 2) ** 2
    flux_params = _full_size_quantized_flux_params(flux, flux_cfg, s_img,
                                                   s_txt)
    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg)
    vae_params = vae.init(
        jax.random.key(0),
        jnp.zeros((1, grid, grid, vcfg.latent_channels), jnp.bfloat16),
        method=vae.decode)

    sched = FlowMatchEulerScheduler(SchedulerConfig(shift=1.0))
    sigmas = sched.inference_sigmas(4)
    img_ids = prepare_latent_image_ids(grid, grid)
    txt_ids = jnp.zeros((s_txt, 3), jnp.float32)

    def turn_fn(lm_params, proj_params, ids, mask):
        """MultiTurnSession.turn minus host tokenize: embed -> decode
        with hidden export -> cat prefill+answer -> proj."""
        emb = lm.apply(lm_params, ids, method=Qwen2LM.embed)
        prefill, steps, tokens, valid = greedy_decode_with_hiddens(
            lm, lm_params, emb, mask, max_new, eos_token_id=-1)
        all_hidden = concat_answer_hiddens(prefill, steps)
        pooled, prompt_embeds = proj.apply(proj_params, all_hidden)
        return tokens, valid, pooled, prompt_embeds

    def generate(flux_params, vae_params, noise, prompt, pooled):
        lat = denoise_flux(flux, flux_params, noise, prompt, pooled,
                           sigmas, img_ids, txt_ids)
        lat = unpack_latents(lat, px, px)
        return vae.apply(vae_params, jnp.transpose(lat, (0, 2, 3, 1)),
                         method=vae.decode)

    mask0 = jnp.zeros((1, s0), bool).at[:, :32].set(True)
    noise = jax.random.normal(jax.random.key(0),
                              (1, s_img, flux_cfg.in_channels),
                              jnp.bfloat16)
    t0 = time.perf_counter()
    jturn = (jax.jit(turn_fn)
             .lower(lm_params, proj_params, ids0, mask0).compile())
    prompt_sh = jnp.zeros((1, s_txt, flux_cfg.joint_attention_dim),
                          jnp.bfloat16)
    pooled_sh = jnp.zeros((1, flux_cfg.pooled_projection_dim),
                          jnp.bfloat16)
    jgen = (jax.jit(generate)
            .lower(flux_params, vae_params, noise, prompt_sh, pooled_sh)
            .compile())
    print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)

    # scripted conversation: each turn appends ~48 synthetic history
    # tokens (prior user msg + decoded answer summary), fixed seed per
    # turn (inference_multi_turn.py:149-156)
    rng = np.random.default_rng(0)
    ids = np.zeros((1, s0), np.int32)
    fill = 32                                  # turn-1 user msg tokens
    ids[0, :fill] = rng.integers(10, lm_cfg.vocab_size - 10, fill)
    results = []
    for t in range(turns):
        mask = np.zeros((1, s0), bool)
        mask[0, :fill] = True
        t1 = time.perf_counter()
        tokens, valid, pooled, prompt_embeds = jturn(
            lm_params, proj_params, jnp.asarray(ids), jnp.asarray(mask))
        tokens = np.asarray(tokens)            # fetch = hard sync
        t2 = time.perf_counter()
        img = jgen(flux_params, vae_params, noise, prompt_embeds, pooled)
        img = np.asarray(img)                  # fetch = hard sync
        t3 = time.perf_counter()
        results.append({"turn": t + 1, "history_tokens": int(fill),
                        "decode_ms": round(1e3 * (t2 - t1)),
                        "generate_ms": round(1e3 * (t3 - t2)),
                        "total_ms": round(1e3 * (t3 - t1))})
        print(results[-1], flush=True)
        assert np.isfinite(img).all()
        # append this turn's exchange to the history (cap at the budget)
        new = min(48, s0 - fill)
        if new > 0:
            ids[0, fill:fill + new] = np.concatenate(
                [tokens[0][:new // 2] % (lm_cfg.vocab_size - 10) + 10,
                 rng.integers(10, lm_cfg.vocab_size - 10,
                              new - new // 2)])[:new]
            fill += new

    import json
    tot = [r["total_ms"] for r in results[1:]] or \
        [results[0]["total_ms"]]
    print(json.dumps({"turns": results,
                      "steady_ms_per_turn": round(float(np.mean(tot)))}),
          flush=True)


if __name__ == "__main__":
    main()
