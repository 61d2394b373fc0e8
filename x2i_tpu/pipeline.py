"""X2I inference pipeline: MLLM hidden states -> proj -> FLUX -> VAE.

The reference wires this inline per script (tokenizer -> MLLM -> proj ->
diffusers FluxPipeline -> manual VAE decode,
/root/reference/infer/inference_minicpm.py:51-91,181-215; SURVEY.md §1
"there is no shared pipeline object"). Here it IS one object: `encode()`
produces conditioning from any modality mix, `generate()` is a single jitted
program (proj + lax.scan denoise + VAE decode), and the task methods mirror
the reference CLI surface (text2image / image2image / imagetext2image /
video2image / audio2image / x2image, inference_minicpm.py:218-335).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import (FluxConfig, GenerationConfig, ProjConfig,
                                 SchedulerConfig, VAEConfig)
from x2i_tpu.diffusion.sampling import (denoise, pack_latents,
                                        prepare_latent_image_ids,
                                        unpack_latents)
from x2i_tpu.diffusion.scheduler import FlowMatchEulerScheduler
from x2i_tpu.models.flux import FluxTransformer2D
from x2i_tpu.models.proj import Proj
from x2i_tpu.models.vae import AutoencoderKL, postprocess


@dataclasses.dataclass
class X2IPipeline:
    """encoder_fn(inputs: dict) -> (B, C, S, H) MLLM hidden-state stack;
    the remaining stages are owned models + params."""

    encoder_fn: Callable[[Dict[str, Any]], jnp.ndarray]
    proj: Proj
    proj_params: Any
    flux: FluxTransformer2D
    flux_params: Any
    vae: AutoencoderKL
    vae_params: Any
    scheduler: FlowMatchEulerScheduler
    gen_cfg: GenerationConfig = GenerationConfig()

    def encode(self, encoder_inputs: Dict[str, Any]
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (pooled (B, 768), prompt_embeds (B, S, 4096)).

        For very long prompts (the reference accepts up to 32k tokens,
        inference_minicpm.py:169) the (B, C, S, H) stack this path
        materializes grows to GiBs; the streamed alternative —
        models/proj.py::streaming_mix_spec +
        models/qwen2.py::Qwen2LM.encode_premixed + Proj.mlp — computes
        the same conditioning with one (B, S, H) buffer
        (tools/tpu_prefill_bench.py X2I_PREFILL_PROJ=1)."""
        states = self.encoder_fn(encoder_inputs)
        return self.proj.apply(self.proj_params, states)

    # optional LightControl branch (set by with_controls)
    control_model: Any = None
    control_params: Any = None
    control_cfg: Any = None
    # optional serving mesh (set by with_mesh)
    mesh: Any = None
    # optional batched encoder: fn(list_of_request_dicts) -> (N, C, S, H)
    # stacked hidden states from ONE prefill program (text requests share
    # the 512-token padded shape). None -> run_batch encodes serially.
    encoder_batch_fn: Any = None

    def encode_batch(self, requests: Sequence[Dict[str, Any]]
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched encode: one MLLM prefill program for the whole request
        list when encoder_batch_fn is available (the serial fallback is
        the reference behavior — each CLI invocation encodes alone).
        -> (pooled (N, 768), prompt_embeds (N, S, 4096))."""
        if self.encoder_batch_fn is not None:
            states = self.encoder_batch_fn(list(requests))
        else:
            states = jnp.concatenate(
                [self.encoder_fn(r) for r in requests], axis=0)
        return self.proj.apply(self.proj_params, states)

    def with_mesh(self, mesh) -> "X2IPipeline":
        """Data-parallel multi-chip serving: params are replicated across
        `mesh` once (here), and generate() shards each batch over the
        'data' axis — GSPMD partitions the whole denoise+VAE program, so
        throughput scales with chips at unchanged per-image latency.
        Batch sizes must be multiples of mesh.shape['data'] (size the
        BatchingServer buckets accordingly)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        return dataclasses.replace(
            self, mesh=mesh,
            flux_params=jax.device_put(self.flux_params, rep),
            vae_params=jax.device_put(self.vae_params, rep),
            control_params=(jax.device_put(self.control_params, rep)
                            if self.control_params is not None else None))

    def _shard_request(self, *arrays):
        """Place batch-leading arrays on the serving mesh ('data' axis)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        n = self.mesh.shape["data"]
        sh = NamedSharding(self.mesh, P("data"))
        out = []
        for a in arrays:
            if a is None:
                out.append(None)
                continue
            if a.shape[0] % n:
                raise ValueError(
                    f"serving batch {a.shape[0]} must be a multiple of the "
                    f"mesh data axis ({n})")
            out.append(jax.device_put(a, sh))
        return out

    def with_controls(self, control_cfg, control_params) -> "X2IPipeline":
        """Attach trained ControlNeXt branches for instruction-editing
        inference (lightcontrol_flux.py:504-507 injection)."""
        from x2i_tpu.models.controlnext import ControlNeXt
        return dataclasses.replace(
            self, control_model=ControlNeXt(control_cfg),
            control_params=control_params, control_cfg=control_cfg)

    @functools.cached_property
    def _generate_jit(self):
        @functools.partial(jax.jit, static_argnames=("height", "width",
                                                     "num_steps"))
        def run(flux_params, vae_params, prompt_embeds, pooled, noise,
                control_pixels, height, width, num_steps):
            grid_h = 2 * (height // 16)
            grid_w = 2 * (width // 16)
            img_ids = prepare_latent_image_ids(grid_h, grid_w)
            txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.float32)
            sigmas = self.scheduler.inference_sigmas(
                num_steps, image_seq_len=noise.shape[1])

            def model_fn(lat, pr, po, t, iid, tid, g, mods=None):
                controls = None
                if control_pixels is not None:
                    from x2i_tpu.models.controlnext import \
                        apply_control_bank
                    controls = apply_control_bank(
                        self.control_cfg, self.control_params,
                        control_pixels, t * 1000.0)
                return self.flux.apply(flux_params, lat, pr, po, t, iid,
                                       tid, guidance=g, controls=controls,
                                       precomputed_mods=mods)

            gscale = (self.gen_cfg.guidance_scale
                      if self.flux.cfg.guidance_embeds else None)
            pooled_c = pooled.astype(self.flux.cfg.dtype)
            # all denoise steps' adaLN modulations in one pass (each mod
            # weight read once per image instead of once per step)
            mods = self.flux.apply(
                flux_params, noise, prompt_embeds, pooled_c, sigmas[:-1],
                img_ids, txt_ids,
                guidance=(None if gscale is None else
                          jnp.full((noise.shape[0],), gscale, jnp.float32)),
                mods_only=True)
            lat = denoise(model_fn, noise,
                          prompt_embeds.astype(self.flux.cfg.dtype),
                          pooled_c, sigmas,
                          img_ids, txt_ids, guidance_scale=gscale,
                          mods=mods)
            lat = unpack_latents(lat, height, width)
            tile_px = self.gen_cfg.vae_tile_px
            if tile_px and max(height, width) > tile_px:
                # tiled decode runs as a SEPARATE program (see
                # _decode_tiled_jit): fusing it into this jit makes the
                # combined buffer liveness overrun HBM at 2048^2 even
                # though each half fits. Hand back NHWC latents.
                return jnp.transpose(lat, (0, 2, 3, 1))
            pixels = self.vae.apply(vae_params,
                                    jnp.transpose(lat, (0, 2, 3, 1)),
                                    method=self.vae.decode)
            return postprocess(pixels)

        return run

    @functools.cached_property
    def _decode_tiled_jit(self):
        @jax.jit
        def run(vae_params, lat_nhwc):
            pixels = self.vae.apply(vae_params, lat_nhwc,
                                    method=self.vae.decode_tiled)
            return postprocess(pixels)
        return run

    def generate(self, pooled: jnp.ndarray, prompt_embeds: jnp.ndarray,
                 height: Optional[int] = None, width: Optional[int] = None,
                 num_steps: Optional[int] = None,
                 seed: Optional[int] = None,
                 control_pixels: Optional[jnp.ndarray] = None
                 ) -> np.ndarray:
        """-> uint8 images (B, H, W, 3). Mirrors generate()
        (inference_minicpm.py:181-215). control_pixels: optional
        (B, H, W, 3) guidance image in [-1, 1] for the LightControl branch
        (requires with_controls)."""
        g = self.gen_cfg
        height = height or g.height
        width = width or g.width
        num_steps = num_steps or g.num_inference_steps
        seed = g.seed if seed is None else seed
        batch = prompt_embeds.shape[0]
        s_img = (2 * (height // 16)) * (2 * (width // 16)) // 4
        noise = jax.random.normal(
            jax.random.key(seed),
            (batch, s_img, self.flux.cfg.in_channels), jnp.bfloat16)
        if control_pixels is not None and self.control_model is None:
            raise ValueError("control_pixels given but no ControlNeXt "
                             "attached; call with_controls() first")
        if self.mesh is not None:
            prompt_embeds, pooled, noise, control_pixels = \
                self._shard_request(prompt_embeds, pooled, noise,
                                    control_pixels)
        out = self._generate_jit(self.flux_params, self.vae_params,
                                 prompt_embeds, pooled, noise,
                                 control_pixels, height, width, num_steps)
        tile_px = g.vae_tile_px
        if tile_px and max(height, width) > tile_px:
            out = self._decode_tiled_jit(self.vae_params, out)
        return np.asarray(out)

    # ---- task surface (inference_minicpm.py:218-335) ----

    def run_task(self, task: str, prompt: Optional[str] = None,
                 images: Optional[Sequence] = None,
                 video: Optional[Any] = None,
                 audio: Optional[Any] = None,
                 use_answer: bool = False,
                 **gen_kwargs) -> np.ndarray:
        inputs = {"prompt": prompt, "images": images, "video": video,
                  "audio": audio, "task": task, "use_answer": use_answer}
        pooled, prompt_embeds = self.encode(inputs)
        return self.generate(pooled, prompt_embeds, **gen_kwargs)

    def text2image(self, prompt: str, **kw) -> np.ndarray:
        return self.run_task("text2image", prompt=prompt, **kw)

    def image2image(self, images, **kw) -> np.ndarray:
        return self.run_task("image2image", images=images, **kw)

    def imagetext2image(self, prompt: str, images, **kw) -> np.ndarray:
        return self.run_task("imagetext2image", prompt=prompt,
                             images=images, **kw)

    def video2image(self, video, **kw) -> np.ndarray:
        return self.run_task("video2image", video=video, **kw)

    def audio2image(self, audio, **kw) -> np.ndarray:
        return self.run_task("audio2image", audio=audio, **kw)

    def x2image(self, prompt=None, images=None, audio=None,
                **kw) -> np.ndarray:
        return self.run_task("x2image", prompt=prompt, images=images,
                             audio=audio, **kw)

    def run_batch(self, requests, **gen_kwargs) -> np.ndarray:
        """Batched generation for the serving engine: ONE batched encoder
        prefill (see encode_batch) + ONE jitted denoise. requests: list of
        run_task-style dicts."""
        pooled, embeds = self.encode_batch(requests)
        return self.generate(pooled, embeds, **gen_kwargs)

    def serving_server(self, batch_size: int = 1, max_wait_s: float = 0.05,
                       buckets=None, **gen_kwargs):
        """-> x2i_tpu.serve.BatchingServer over this pipeline (size-
        bucketed batches; each bucket is one compiled shape)."""
        from x2i_tpu.serve import BatchingServer
        return BatchingServer(
            lambda reqs: self.run_batch(reqs, **gen_kwargs),
            batch_size=batch_size, max_wait_s=max_wait_s, buckets=buckets)


def build_random_pipeline(scale: str = "tiny",
                          seed: int = 0,
                          gen_cfg: Optional[GenerationConfig] = None
                          ) -> X2IPipeline:
    """Random-weight pipeline for smoke runs without checkpoints. The
    encoder is a tiny Qwen2 over hashed prompt tokens — same code path as a
    real MLLM (prefill + hidden-state stack)."""
    from x2i_tpu.core.config import tiny_flux_config, tiny_qwen2_config
    from x2i_tpu.models.qwen2 import Qwen2LM

    if scale != "tiny":
        raise NotImplementedError("full-scale requires checkpoints")
    key = jax.random.key(seed)
    flux_cfg = tiny_flux_config(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                                use_pallas_attention=True)
    lm_cfg = tiny_qwen2_config(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    proj_cfg = ProjConfig(in_channels=lm_cfg.num_layers_with_embedding,
                          input_dim=lm_cfg.hidden_size,
                          output_dim0=flux_cfg.pooled_projection_dim,
                          output_dim1=flux_cfg.joint_attention_dim)
    vae_cfg = VAEConfig(block_out_channels=(32, 32, 32, 32),
                        layers_per_block=1, latent_channels=16,
                        norm_num_groups=4)
    seq = 32

    lm = Qwen2LM(lm_cfg)
    lm_params = lm.init(key, jnp.zeros((1, seq), jnp.int32))

    def tokenize(text: str) -> np.ndarray:
        ids = np.zeros((1, seq), np.int32)
        toks = [hash(c) % lm_cfg.vocab_size for c in (text or "")][:seq]
        ids[0, :len(toks)] = toks
        return ids

    def encoder_fn(inputs):
        ids = jnp.asarray(tokenize(inputs.get("prompt") or ""))
        if inputs.get("use_answer"):
            # reasoning2image (inference_qwenvl.py:121-132): decode an
            # answer and condition on cat(prefill, step) hidden states
            from x2i_tpu.models.decoding import (concat_answer_hiddens,
                                                 greedy_decode_with_hiddens)
            emb = lm.apply(lm_params, ids, method=Qwen2LM.embed)
            mask = jnp.ones(ids.shape, bool)
            prefill, steps, _, _ = greedy_decode_with_hiddens(
                lm, lm_params, emb, mask, max_new_tokens=8, eos_token_id=1)
            return concat_answer_hiddens(prefill, steps)
        states, _ = lm.apply(lm_params, ids)
        return states

    def encoder_batch_fn(inputs_list):
        if any(i.get("use_answer") for i in inputs_list):
            return jnp.concatenate([encoder_fn(i) for i in inputs_list], 0)
        ids = jnp.asarray(np.concatenate(
            [tokenize(i.get("prompt") or "") for i in inputs_list]))
        states, _ = lm.apply(lm_params, ids)    # ONE prefill program
        return states

    proj = Proj(proj_cfg)
    proj_params = proj.init(
        key, jnp.zeros((1, proj_cfg.in_channels, seq, proj_cfg.input_dim)))
    flux = FluxTransformer2D(flux_cfg)
    grid = 8
    flux_params = flux.init(
        key, jnp.zeros((1, (grid // 2) ** 2, flux_cfg.in_channels)),
        jnp.zeros((1, seq, flux_cfg.joint_attention_dim)),
        jnp.zeros((1, flux_cfg.pooled_projection_dim)), jnp.zeros((1,)),
        prepare_latent_image_ids(grid, grid), jnp.zeros((seq, 3)))
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init(key, jnp.zeros((1, 64, 64, 3)))

    pipe = X2IPipeline(
        encoder_fn=encoder_fn, proj=proj, proj_params=proj_params,
        flux=flux, flux_params=flux_params, vae=vae, vae_params=vae_params,
        scheduler=FlowMatchEulerScheduler(SchedulerConfig(shift=1.0)),
        gen_cfg=gen_cfg or GenerationConfig(height=64, width=64,
                                            num_inference_steps=4),
        encoder_batch_fn=encoder_batch_fn)
    # expose the tiny LM so multiturn.build_random_session can drive a
    # chat session over the same random weights (not a dataclass field:
    # checkpoint-backed pipelines don't have it)
    pipe._random_ctx = {"lm": lm, "lm_params": lm_params,
                        "lm_cfg": lm_cfg, "tokenize": tokenize}
    return pipe
