"""Full-size phase-1 trainer assembly from on-disk checkpoints.

Wires what the reference's train_{minicpm,qwenvl,internvl}.py main() does
(load frozen teachers + MLLM + FLUX, build datamodule, construct trainer;
/root/reference/train/train_minicpm.py:372-525,840-866) into the colocated
x2i_tpu step: converters -> frozen param trees, HF tokenizers -> the
DistillDataModule, encoder family -> student_states_fn, T5+CLIP ->
teacher_text_fn, mesh placement (FSDP for frozen FLUX) -> TrainLoop.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from x2i_tpu.core.config import (DistillConfig, FluxConfig, MODEL_REGISTRY,
                                 ProjConfig)


def assemble_distill(model: str, flux_path: str, mllm_path: str,
                     t5_path: str, clip_path: str,
                     urls, dcfg: Optional[DistillConfig] = None,
                     proj_ckpt: Optional[str] = None):
    """Returns (step_fn, state, flux_params, train_loader_factory).

    Paths follow the reference launchers: FLUX.1-dev diffusers dir (teacher
    + student share the frozen transformer), HF MLLM dir, T5-XXL encoder
    dir, CLIP text dir (train_minicpm.py:859-860, 677-679).
    """
    import jax
    from transformers import AutoTokenizer

    from x2i_tpu.convert.load import (_internvl_encoder_fn,  # noqa: F401
                                      load_safetensors_dir)
    from x2i_tpu.convert.torch_models import (clip_params_from_hf,
                                              flux_params_from_diffusers,
                                              internvl_params_from_hf,
                                              proj_params_from_reference,
                                              qwen2_params_from_hf,
                                              t5_params_from_hf)
    from x2i_tpu.data.datamodule import DistillDataConfig, DistillDataModule
    from x2i_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.proj import Proj
    from x2i_tpu.models.t5 import T5Config, T5Encoder
    from x2i_tpu.train.distill import (TrainState, make_distill_step,
                                       make_optimizer)

    dcfg = dcfg or DistillConfig()
    entry = MODEL_REGISTRY[model]
    # rope stays outside the flash kernel for training: the fused path's
    # backward rotate transients cost ~60 MB of peak HBM, which tips the
    # single-chip 12B step over the 15.75 GB budget (measured; the half
    # layout's cheap XLA rotation is kept either way)
    flux_cfg: FluxConfig = dataclasses.replace(entry["flux"],
                                               rope_in_kernel=False)
    proj_cfg: ProjConfig = entry["proj"]
    mllm_cfg = entry["mllm"]

    # frozen weights
    flux_params = {"params": flux_params_from_diffusers(
        load_safetensors_dir(os.path.join(flux_path, "transformer")),
        flux_cfg)}
    t5_cfg = T5Config()                         # t5-xxl defaults
    t5 = T5Encoder(t5_cfg)
    t5_params = {"params": t5_params_from_hf(
        load_safetensors_dir(t5_path), t5_cfg.num_layers)}
    clip_cfg = CLIPTextConfig()
    clip = CLIPTextEncoder(clip_cfg)
    clip_params = {"params": clip_params_from_hf(
        load_safetensors_dir(clip_path), clip_cfg.num_hidden_layers)}

    # MLLM encoder: the phase-1 corpus is text-only (100k captions,
    # BASELINE.md), so the student path is a text prefill per family.
    mllm_sd = load_safetensors_dir(mllm_path)
    if "internvl" in model:
        from x2i_tpu.models.internvl import InternVLEncoder
        enc = InternVLEncoder(mllm_cfg)
        enc_params = {"params": internvl_params_from_hf(mllm_sd, mllm_cfg)}

        def student_states_fn(batch):
            return enc.apply(enc_params, batch["mllm_ids"],
                             batch["mllm_mask"], None)
    elif "qwenvl" in model:
        from x2i_tpu.convert.load import qwen2_5_vl_params_from_hf
        from x2i_tpu.models.qwen2_5_vl import (Qwen2_5_VLConfig,
                                               Qwen2_5_VLEncoder,
                                               QwenVisionConfig)
        full_cfg = Qwen2_5_VLConfig(
            vision=QwenVisionConfig(out_hidden_size=mllm_cfg.hidden_size),
            llm=mllm_cfg)
        enc = Qwen2_5_VLEncoder(full_cfg)
        enc_params = {"params": qwen2_5_vl_params_from_hf(mllm_sd,
                                                          mllm_cfg)}

        def student_states_fn(batch):
            mask = batch["mllm_mask"].astype(jnp.int32)
            pos = jnp.clip(jnp.cumsum(mask, axis=-1) - 1, 0, None)
            pos3d = jnp.broadcast_to(pos[None], (3,) + pos.shape)
            return enc.apply(enc_params, batch["mllm_ids"],
                             batch["mllm_mask"], pos3d, None)
    else:  # minicpm
        from x2i_tpu.convert.load import minicpmo_params_from_hf
        from x2i_tpu.models.minicpmo import MiniCPMOConfig, MiniCPMOEncoder
        ocfg = MiniCPMOConfig(llm=mllm_cfg)
        enc = MiniCPMOEncoder(ocfg)
        enc_params = {"params": minicpmo_params_from_hf(mllm_sd, ocfg)}

        def student_states_fn(batch):
            return enc.apply(enc_params, batch["mllm_ids"],
                             batch["mllm_mask"])
    del mllm_sd

    def teacher_text_fn(batch):
        seq = t5.apply(t5_params, batch["t5_ids"], batch["t5_mask"])
        _, pooled = clip.apply(clip_params, batch["clip_ids"])
        return seq, pooled

    proj = Proj(proj_cfg)
    if proj_ckpt:
        from x2i_tpu.convert.load import load_torch_bin
        proj_params = {"params": proj_params_from_reference(
            load_torch_bin(proj_ckpt), proj_cfg)}
    else:
        dummy = jnp.zeros((1, proj_cfg.in_channels, dcfg.text_seq_len,
                           proj_cfg.input_dim), jnp.float32)
        proj_params = proj.init(jax.random.key(0), dummy)

    optimizer = make_optimizer(dcfg)
    step_fn = make_distill_step(
        FluxTransformer2D(flux_cfg).apply, proj.apply, teacher_text_fn,
        student_states_fn, optimizer, flux_cfg, dcfg)
    state = TrainState(proj_params, optimizer.init(proj_params),
                       jnp.zeros((), jnp.int32))

    # data: reference tokenization recipe (datamodule_*.py)
    mllm_tok = AutoTokenizer.from_pretrained(mllm_path,
                                             trust_remote_code=True,
                                             use_fast=False)
    t5_tok = AutoTokenizer.from_pretrained(t5_path)
    clip_tok = AutoTokenizer.from_pretrained(clip_path)

    def mllm_tokenize(prompt):
        out = mllm_tok(prompt, padding="max_length",
                       max_length=dcfg.text_seq_len, truncation=True)
        return out["input_ids"], out["attention_mask"]

    def t5_tokenize(caption):
        out = t5_tok(caption, padding="max_length",
                     max_length=dcfg.text_seq_len, truncation=True)
        return out["input_ids"], out["attention_mask"]

    def clip_tokenize(caption):
        return clip_tok(caption, padding="max_length", max_length=77,
                        truncation=True)["input_ids"]

    # per-family prompt wrapper matching the reference datamodules
    # (see data.datamodule.family_chat_template; golden-pinned against
    # the reference preproc in tests/test_datamodule_reference_golden.py)
    from x2i_tpu.data.datamodule import family_chat_template
    chat_template = family_chat_template(model, mllm_tok)

    dm = DistillDataModule(
        DistillDataConfig(urls=urls, batch_size=dcfg.train_batch_size,
                          text_seq_len=dcfg.text_seq_len),
        mllm_tokenize=mllm_tokenize, t5_tokenize=t5_tokenize,
        clip_tokenize=clip_tokenize, chat_template=chat_template)

    return step_fn, state, flux_params, dm.train_loader
