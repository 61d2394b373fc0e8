#!/usr/bin/env python
"""Single-chip END-TO-END serving probe: int8 MLLM encoder + int8 12B DiT
+ VAE resident on ONE v5e, full request path timed.

The reference serves from an 80 GB A100 holding the MLLM (bf16) plus FLUX
(bf16) (/root/reference/infer/inference_qwenvl.py). On a 16 GB chip that
only works quantized: Qwen2Config.quantized="w8a8" puts the encoder at
~1 byte/param next to the int8 DiT (ops/quant.py). This probe builds the
InternVL2.5-1B encoder LM (Qwen2.5-0.5B shape, SURVEY §2.10: 25
hidden-state channels; X2I_SERVE_LM=3b for the Qwen3B shape, which does
NOT fit — see inline note), the full-size FLUX and the VAE
with pattern weights, and times prefill -> proj -> 4-step denoise -> VAE
decode at 1024^2 as three AOT programs sharing the chip.

Env: X2I_SERVE_PX (default 1024), X2I_SERVE_PREFILL (text tokens, 512),
X2I_SERVE_LM (0_5b|3b|7b), X2I_SERVE_LM_QUANT (w8a8|w8|w4),
X2I_SERVE_DIT_QUANT (w8a8|w8|w4).

Measured 2026-08-18 (v5e, prefill 512, 1024^2 4-step):
  0_5b + w8a8 DiT      : 1366 ms/request (0.732 req/s)  — int8 MXU DiT
  3b   + w4 DiT        : 2904 ms/request (0.344 req/s)  — bf16 MXU on int4
                         weights; the ONLY way this encoder/DiT pair fits
                         one 16 GB chip (w8a8 DiT + 3B encoder = 14.25 GiB
                         params -> OOM on generate temps).
  7b w8a8 + w4 DiT     : 2919 ms/request (0.343 req/s)  — the reference's
                         FLAGSHIP encoder (Qwen2.5-7B, 7.10 GiB int8) next
                         to the 12B DiT (~6 GiB int4) on one 16 GB chip; in
                         bf16 this pair needs ~39 GiB (an 80 GB A100 in the
                         reference). Request time is DiT-bound: identical
                         to the 3B pair — the prefill rides along free.
  7b w8a8 + w4a8 DiT   : 1438 ms/request (0.695 req/s)  — round 5: the
                         int4-stored DiT computed on the int8 MXU
                         (ops/quant.py w4a8 half-split packing; same
                         38 dB image quality as w4, measured quant_e2e)
                         lifts the flagship pair 2.03x at the same
                         memory footprint.
  3b w4a8 + w8a8 DiT   : 1278 ms/request (0.783 req/s)  — round 5: the
                         w4a8 ENCODER (1.90 GiB vs 3.17 int8) frees the
                         room the full-rate int8 DiT needs (13.13 GiB
                         params + 2.16 temps fits) — 2.27x the round-4
                         3B pair, which was stuck on the bf16-compute
                         w4 DiT.
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

    from x2i_tpu.core.config import (FluxConfig, ProjConfig,
                                     SchedulerConfig, VAEConfig)
    from x2i_tpu.diffusion import (FlowMatchEulerScheduler, denoise,
                                   prepare_latent_image_ids, unpack_latents)
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.proj import Proj
    from x2i_tpu.models.qwen2 import Qwen2LM
    from x2i_tpu.models.vae import AutoencoderKL
    from __graft_entry__ import _full_size_quantized_flux_params
    from tools._bench_common import pattern_params, qwen_lm_config

    px = int(os.environ.get("X2I_SERVE_PX", "1024"))
    s_txt = int(os.environ.get("X2I_SERVE_PREFILL", "512"))
    print(f"backend: {jax.default_backend()}  px={px} prefill={s_txt}",
          flush=True)

    if os.environ.get("X2I_SERVE_VISION", "0") == "1":
        # image-conditioned encoder batching A/B only (no DiT resident)
        return _vision_encode_ab(s_txt)
    if os.environ.get("X2I_SERVE_AUDIO", "0") == "1":
        # audio-conditioned encoder batching A/B only (no DiT resident)
        return _audio_encode_ab(s_txt)

    # --- encoder, int8. Default: the InternVL2.5-1B LM (Qwen2.5-0.5B
    # shape = Qwen2Config defaults) — 0.9 GiB int8, the encoder family
    # that FITS next to the int8 12B DiT on one chip. X2I_SERVE_LM=3b
    # builds the Qwen2.5-3B shape instead (3.17 GiB int8): next to the
    # w8a8 DiT params alone reach 14.25 GiB and generate's ~1.9 GiB
    # temps no longer fit — for that pair set X2I_SERVE_DIT_QUANT=w4
    # (nibble-packed int4 DiT, ~6 GiB, bf16 MXU compute). ---
    lm_kind = os.environ.get("X2I_SERVE_LM", "0_5b")
    lm_quant = os.environ.get("X2I_SERVE_LM_QUANT", "w8a8")
    # 7b = Qwen2.5-7B, the reference's flagship X2I encoder
    # (/root/reference/infer/inference_qwenvl.py). Only fits next to
    # the 12B DiT with X2I_SERVE_DIT_QUANT=w4 (and w4 or w8a8 LM).
    lm_cfg = qwen_lm_config(lm_kind, lm_quant)
    lm = Qwen2LM(lm_cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, lm_cfg.vocab_size, (1, s_txt)), jnp.int32)
    lm_params = pattern_params(lm, ids)
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree_util.tree_leaves(lm_params))
    print(f"encoder params: {n_bytes/2**30:.2f} GiB", flush=True)

    # --- proj (Qwen3B: 37 channels, hidden 2048) ---
    proj_cfg = ProjConfig(in_channels=lm_cfg.num_layers_with_embedding,
                          input_dim=lm_cfg.hidden_size)
    proj = Proj(proj_cfg)
    proj_params = proj.init(
        jax.random.key(0),
        jnp.zeros((1, proj_cfg.in_channels, s_txt, proj_cfg.input_dim),
                  jnp.bfloat16))

    # --- DiT + VAE ---
    dit_quant = os.environ.get("X2I_SERVE_DIT_QUANT", "w8a8")
    flux_cfg = FluxConfig(quantized=dit_quant, guidance_embeds=False,
                          fused_glue=True)
    print(f"dit quant: {dit_quant}", flush=True)
    flux = FluxTransformer2D(flux_cfg)
    grid = px // 8
    s_img = (grid // 2) ** 2
    flux_params = _full_size_quantized_flux_params(flux, flux_cfg, s_img,
                                                   s_txt)
    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg)
    vae_params = vae.init(
        jax.random.key(0), jnp.zeros((1, min(grid, 128), min(grid, 128),
                                      vcfg.latent_channels), jnp.bfloat16),
        method=vae.decode)

    sched = FlowMatchEulerScheduler(SchedulerConfig(shift=1.0))
    sigmas = sched.inference_sigmas(4)
    img_ids = prepare_latent_image_ids(grid, grid)
    txt_ids = jnp.zeros((s_txt, 3), jnp.float32)

    def encode(lm_params, proj_params, ids):
        states, _ = lm.apply(lm_params, ids)       # (1, C, S, H)
        return proj.apply(proj_params, states)     # (pooled, seq)

    def generate(flux_params, vae_params, noise, prompt, pooled):
        # shared helper = the pipeline's shipping precomputed-mods program
        from x2i_tpu.diffusion import denoise_flux
        lat = denoise_flux(flux, flux_params, noise, prompt, pooled,
                           sigmas, img_ids, txt_ids)
        lat = unpack_latents(lat, px, px)
        return vae.apply(vae_params, jnp.transpose(lat, (0, 2, 3, 1)),
                         method=vae.decode)

    noise = jax.random.normal(jax.random.key(1),
                              (1, s_img, flux_cfg.in_channels),
                              jnp.bfloat16)
    t0 = time.perf_counter()
    jenc = jax.jit(encode).lower(lm_params, proj_params, ids).compile()
    pooled_s, seq_s = jax.eval_shape(encode, lm_params, proj_params, ids)
    jgen = (jax.jit(generate)
            .lower(flux_params, vae_params, noise, seq_s, pooled_s)
            .compile())
    print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)
    total_args = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(
            (lm_params, proj_params, flux_params, vae_params))) / 2**30
    temps = 0.0
    for ex in (jenc, jgen):
        mem = ex.memory_analysis()
        if mem is not None:
            temps = max(temps, mem.temp_size_in_bytes / 2**30)
    print(f"params {total_args:.2f} GiB + max program temps "
          f"{temps:.2f} GiB", flush=True)
    if total_args + temps > 15.5:
        # a runtime RESOURCE_EXHAUSTED can wedge the relay — bail clean
        print("over the 15.75 GiB HBM budget — not executing", flush=True)
        sys.exit(3)

    def request():
        pooled, seq = jenc(lm_params, proj_params, ids)
        return jgen(flux_params, vae_params, noise, seq, pooled)

    img = request()
    jax.block_until_ready(img)
    assert bool(jnp.isfinite(img.astype(jnp.float32)).all())
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        img = request()
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / iters
    print(f"end-to-end request (prefill {s_txt} tok + proj + 4-step "
          f"{px}^2 + VAE) on ONE chip: {dt*1000:.0f} ms "
          f"({1/dt:.3f} req/s)", flush=True)

    # --- batched-encoder A/B (X2IPipeline.run_batch's single-prefill
    # program): B text requests through ONE (B, S) prefill+proj vs B
    # serial (1, S) programs — the reference encodes per-request
    # (pipeline.py run_batch before batching; VERDICT r2 weak #4) ---
    bsz = int(os.environ.get("X2I_SERVE_BATCH", "4"))
    if bsz > 1:
        ids_b = jnp.asarray(np.random.default_rng(2).integers(
            0, lm_cfg.vocab_size, (bsz, s_txt)), jnp.int32)
        jenc_b = (jax.jit(encode)
                  .lower(lm_params, proj_params, ids_b).compile())
        jax.block_until_ready(jenc_b(lm_params, proj_params, ids_b))
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jenc_b(lm_params, proj_params, ids_b)
        jax.block_until_ready(out)
        bt = (time.perf_counter() - t0) / iters
        t0 = time.perf_counter()
        for _ in range(iters):
            for j in range(bsz):
                out = jenc(lm_params, proj_params, ids_b[j:j + 1])
        jax.block_until_ready(out)
        st = (time.perf_counter() - t0) / iters
        print(f"encoder batch={bsz}: batched {bt*1000:.0f} ms vs serial "
              f"{st*1000:.0f} ms -> {st/bt:.2f}x "
              f"({bsz/bt:.2f} vs {bsz/st:.2f} enc-req/s)", flush=True)


def _audio_encode_ab(s_txt: int):
    """Audio-conditioned serving encode A/B (X2I_SERVE_AUDIO=1): B
    audio+text requests through ONE whisper call + ONE (B, S) prefill
    (convert/load.py minicpm encoder_batch_fn's batched path) vs B
    serial encodes. Flagship MiniCPM-o shapes: whisper-medium apm
    (bf16) + w8a8 Qwen2-7B-shape LM. Audio requests are bucketable
    because chunking is static per chunk count
    (processing_minicpmo.py:183-191); here each request carries one
    ~10 s clip (one mel chunk, 250 conditioning tokens)."""
    from dataclasses import replace as _rep

    from tools._bench_common import pattern_params
    from x2i_tpu.core.config import ProjConfig, _minicpm_llm
    from x2i_tpu.data.minicpm_vision import (audio_placeholder_spans,
                                             bounds_to_map,
                                             chunk_audio_mels)
    from x2i_tpu.models.minicpmo import MiniCPMOConfig, MiniCPMOEncoder
    from x2i_tpu.models.proj import Proj
    from x2i_tpu.models.whisper_enc import chunk_bias

    lm_quant = os.environ.get("X2I_SERVE_LM_QUANT", "w8a8")
    lm_cfg = _rep(_minicpm_llm(), quantized=lm_quant)
    cfg = MiniCPMOConfig(llm=lm_cfg)
    enc = MiniCPMOEncoder(cfg)
    bsz = int(os.environ.get("X2I_SERVE_BATCH", "4"))

    rng = np.random.default_rng(0)
    secs = 10
    rows = []
    for b in range(bsz):
        audio = (rng.standard_normal(secs * 16000) * 0.1
                 ).astype(np.float32)
        mels, lens = chunk_audio_mels(audio)
        spans = audio_placeholder_spans(len(audio))
        toks = list(rng.integers(5, 1000, 40))
        ids_r, bounds, pos = list(toks), [], len(toks)
        for n in spans:
            bounds.append((pos + 1, pos + 1 + n))
            ids_r += [3] + [0] * n + [4]        # <audio> unk* </audio>
            pos += n + 2
        mask = [1] * len(ids_r) + [0] * (s_txt - len(ids_r))
        rows.append((np.asarray([ids_r + [0] * (s_txt - len(ids_r))],
                                np.int32),
                     np.asarray([mask], np.int64), mels, lens, bounds))

    def adict_and_map(mel_list, len_list, bounds_list, S):
        t_max = max(m.shape[2] for m in mel_list)
        mels = np.zeros((sum(m.shape[0] for m in mel_list), 80, t_max),
                        np.float32)
        r0 = 0
        for m in mel_list:
            mels[r0:r0 + m.shape[0], :, :m.shape[2]] = m
            r0 += m.shape[0]
        lens = np.concatenate(len_list)
        conv_lens = (lens - 1) // 2 + 1
        t_conv = (t_max - 1) // 2 + 1
        frame_mask = np.arange(t_conv)[None] < lens[:, None]
        pooled_pad = t_conv // 2
        rows_parts, base = [], 0
        for m, ln, bounds in zip(mel_list, len_list, bounds_list):
            cl = (np.asarray(ln) - 1) // 2 + 1
            rr = np.concatenate([(base + k) * pooled_pad
                                 + np.arange((c - 2) // 2 + 1)
                                 for k, c in enumerate(cl)])
            rows_parts.append(rr[:sum(e - s for s, e in bounds)])
            base += m.shape[0]
        adict = {"mel": jnp.asarray(mels),
                 "frame_mask": jnp.asarray(frame_mask),
                 "attn_bias": jnp.asarray(chunk_bias(t_conv,
                                                     chunk_frames=50))}
        amap = bounds_to_map(bounds_list, S,
                             rows=np.concatenate(rows_parts))
        return adict, jnp.asarray(amap)

    proj_cfg = ProjConfig(in_channels=lm_cfg.num_layers_with_embedding,
                          input_dim=lm_cfg.hidden_size)
    proj = Proj(proj_cfg)
    proj_params = proj.init(
        jax.random.key(0),
        jnp.zeros((1, proj_cfg.in_channels, s_txt, proj_cfg.input_dim),
                  jnp.bfloat16))

    a0, m0 = adict_and_map([rows[0][2]], [rows[0][3]], [rows[0][4]],
                           s_txt)
    enc_params = pattern_params(enc, jnp.asarray(rows[0][0]),
                                jnp.asarray(rows[0][1], bool),
                                None, a0, None, m0)
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree_util.tree_leaves(enc_params))
    print(f"omni encoder params ({lm_quant} LM + bf16 apm): "
          f"{n_bytes/2**30:.2f} GiB", flush=True)

    def encode(enc_params, proj_params, ids, mask, adict, amap):
        states = enc.apply(enc_params, ids, mask, None, adict, None,
                           amap)
        return proj.apply(proj_params, states)

    ids_b = np.concatenate([r[0] for r in rows], 0)
    mask_b = np.concatenate([r[1] for r in rows], 0)
    ab, mb = adict_and_map([r[2] for r in rows], [r[3] for r in rows],
                           [r[4] for r in rows], s_txt)
    t0 = time.perf_counter()
    args_b = (enc_params, proj_params, jnp.asarray(ids_b),
              jnp.asarray(mask_b, bool), ab, mb)
    jenc_b = jax.jit(encode).lower(*args_b).compile()
    args_s = []
    for r in rows:
        ar, mr = adict_and_map([r[2]], [r[3]], [r[4]], s_txt)
        args_s.append((enc_params, proj_params, jnp.asarray(r[0]),
                       jnp.asarray(r[1], bool), ar, mr))
    jenc_s = jax.jit(encode).lower(*args_s[0]).compile()
    print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)

    def drain(out):
        return float(np.asarray(
            jax.tree_util.tree_leaves(out)[0][:1, :1], np.float32)[0, 0])

    drain(jenc_b(*args_b))
    drain(jenc_s(*args_s[0]))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jenc_b(*args_b)
    drain(out)
    bt = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        for a in args_s:
            out = jenc_s(*a)
    drain(out)
    st = (time.perf_counter() - t0) / iters
    print(f"audio-conditioned encode batch={bsz}: batched {bt*1000:.0f} ms"
          f" vs serial {st*1000:.0f} ms -> {st/bt:.2f}x "
          f"({bsz/bt:.2f} vs {bsz/st:.2f} enc-req/s)", flush=True)


def _vision_encode_ab(s_txt: int):
    """Image-conditioned serving encode A/B (X2I_SERVE_VISION=1): B
    image+text requests through ONE vision-tower call + ONE (B, S)
    prefill+proj (convert/load.py::encoder_batch_fn's batched path) vs B
    serial encodes. Uses the flagship Qwen2.5-VL-7B shapes — full-size
    vision tower (bf16, ~1.3 GiB) + w8a8 7B LM — and the reference's
    image policy (max 128^2 px -> one static 16-token grid per image,
    inference_qwenvl.py:136-180), which is what makes image requests
    shape-bucketable."""
    from PIL import Image

    from tools._bench_common import pattern_params, qwen_lm_config
    from x2i_tpu.core.config import ProjConfig
    from x2i_tpu.data.qwen_vision import (get_rope_index,
                                          prepare_vision_inputs)
    from x2i_tpu.models.proj import Proj
    from x2i_tpu.models.qwen2_5_vl import (Qwen2_5_VLConfig,
                                           Qwen2_5_VLEncoder,
                                           QwenVisionConfig)

    lm_quant = os.environ.get("X2I_SERVE_LM_QUANT", "w8a8")
    lm_cfg = qwen_lm_config(os.environ.get("X2I_SERVE_LM", "7b"), lm_quant)
    cfg = Qwen2_5_VLConfig(
        vision=QwenVisionConfig(out_hidden_size=lm_cfg.hidden_size),
        llm=lm_cfg, mrope_section=(16, 24, 24))
    enc = Qwen2_5_VLEncoder(cfg)
    bsz = int(os.environ.get("X2I_SERVE_BATCH", "4"))

    rng = np.random.default_rng(0)
    imgs = [Image.fromarray((rng.random((128, 128, 3)) * 255)
                            .astype(np.uint8)) for _ in range(bsz)]
    rows = []
    for im in imgs:
        vin = prepare_vision_inputs([im])
        n = int(np.prod(vin["image_grid_thw"][0])) // 4
        toks = list(rng.integers(5, 1000, 40))
        ids_r = toks + [cfg.vision_start_token_id] \
            + [cfg.image_token_id] * n \
            + list(rng.integers(5, 1000, 12))
        mask = [1] * len(ids_r) + [0] * (s_txt - len(ids_r))
        rows.append((np.asarray([ids_r + [0] * (s_txt - len(ids_r))],
                                np.int32),
                     np.asarray([mask], np.int64), vin))

    def vdict_of(vin):
        return {k: jnp.asarray(vin[k]) for k in
                ("patches", "pos_hw", "window_seg", "image_seg",
                 "reverse_index")}

    def pos_of(ids, mask, grids):
        pos, _ = get_rope_index(ids, image_grid_thw=grids,
                                attention_mask=mask,
                                image_token_id=cfg.image_token_id,
                                video_token_id=cfg.video_token_id,
                                vision_start_token_id=cfg
                                .vision_start_token_id)
        return jnp.asarray(pos)

    ids_b = np.concatenate([r[0] for r in rows], 0)
    mask_b = np.concatenate([r[1] for r in rows], 0)
    vin_b = prepare_vision_inputs(imgs)
    pos_b = pos_of(ids_b, mask_b, vin_b["image_grid_thw"])

    proj_cfg = ProjConfig(in_channels=lm_cfg.num_layers_with_embedding,
                          input_dim=lm_cfg.hidden_size)
    proj = Proj(proj_cfg)
    proj_params = proj.init(
        jax.random.key(0),
        jnp.zeros((1, proj_cfg.in_channels, s_txt, proj_cfg.input_dim),
                  jnp.bfloat16))

    enc_params = pattern_params(enc, jnp.asarray(ids_b[:1]),
                                jnp.asarray(mask_b[:1], bool),
                                pos_of(rows[0][0], rows[0][1],
                                       rows[0][2]["image_grid_thw"]),
                                vdict_of(rows[0][2]))
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree_util.tree_leaves(enc_params))
    print(f"VL encoder params ({lm_quant} LM + bf16 vision): "
          f"{n_bytes/2**30:.2f} GiB", flush=True)

    def encode(enc_params, proj_params, ids, mask, pos, vdict):
        states = enc.apply(enc_params, ids, mask, pos, vdict)
        return proj.apply(proj_params, states)

    t0 = time.perf_counter()
    args_b = (enc_params, proj_params, jnp.asarray(ids_b),
              jnp.asarray(mask_b, bool), pos_b, vdict_of(vin_b))
    jenc_b = jax.jit(encode).lower(*args_b).compile()
    args_s = [(enc_params, proj_params, jnp.asarray(ids),
               jnp.asarray(mask, bool),
               pos_of(ids, mask, vin["image_grid_thw"]), vdict_of(vin))
              for ids, mask, vin in rows]
    jenc_s = jax.jit(encode).lower(*args_s[0]).compile()
    print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)

    # NB: through this environment's relay, block_until_ready can return
    # BEFORE execution (measured: a 5-iter loop timed "0 ms"). A host
    # fetch of real output data cannot lie — the TPU executes enqueued
    # programs in order, so fetching the last result bounds all of them.
    def drain(out):
        return float(np.asarray(
            jax.tree_util.tree_leaves(out)[0][:1, :1], np.float32)[0, 0])

    drain(jenc_b(*args_b))
    drain(jenc_s(*args_s[0]))
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jenc_b(*args_b)
    drain(out)
    bt = (time.perf_counter() - t0) / iters
    t0 = time.perf_counter()
    for _ in range(iters):
        for a in args_s:
            out = jenc_s(*a)
    drain(out)
    st = (time.perf_counter() - t0) / iters
    print(f"image-conditioned encode batch={bsz}: batched {bt*1000:.0f} ms"
          f" vs serial {st*1000:.0f} ms -> {st/bt:.2f}x "
          f"({bsz/bt:.2f} vs {bsz/st:.2f} enc-req/s)", flush=True)


if __name__ == "__main__":
    main()
