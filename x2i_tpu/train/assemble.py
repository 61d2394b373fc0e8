"""Full-size phase-1 trainer assembly from on-disk checkpoints.

Wires what the reference's train_{minicpm,qwenvl,internvl}.py main() does
(load frozen teachers + MLLM + FLUX, build datamodule, construct trainer;
/root/reference/train/train_minicpm.py:372-525,840-866) into the colocated
x2i_tpu step: converters -> frozen param trees, HF tokenizers -> the
DistillDataModule, encoder family -> student_states_fn, T5+CLIP ->
teacher_text_fn, mesh placement (FSDP for frozen FLUX) -> TrainLoop.
"""

from __future__ import annotations

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
    from x2i_tpu.models.templates import internvl2_5_prompt, task_instruction
    from x2i_tpu.train.distill import (TrainState, make_distill_step,
                                       make_optimizer)

    dcfg = dcfg or DistillConfig()
    entry = MODEL_REGISTRY[model]
    flux_cfg: FluxConfig = entry["flux"]
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

    # MLLM encoder (InternVL family shown; qwen/minicpm mirror
    # convert.load's family dispatch)
    if "internvl" not in model:
        raise NotImplementedError(
            "full-size distillation assembly currently wires the InternVL "
            "family; qwen/minicpm reuse the same skeleton with their "
            "encoder builders from convert.load")
    from x2i_tpu.models.internvl import InternVLEncoder
    enc = InternVLEncoder(mllm_cfg)
    enc_params = {"params": internvl_params_from_hf(
        load_safetensors_dir(mllm_path), mllm_cfg)}

    def student_states_fn(batch):
        return enc.apply(enc_params, batch["mllm_ids"],
                         batch["mllm_mask"], None)

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

    dm = DistillDataModule(
        DistillDataConfig(urls=urls, batch_size=dcfg.train_batch_size,
                          text_seq_len=dcfg.text_seq_len),
        mllm_tokenize=mllm_tokenize, t5_tokenize=t5_tokenize,
        clip_tokenize=clip_tokenize,
        chat_template=lambda s: internvl2_5_prompt(s))

    return step_fn, state, flux_params, dm.train_loader
