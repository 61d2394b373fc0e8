#!/usr/bin/env python
"""Golden-activation exporter for checkpoint-parity validation.

When real checkpoints are present, this runs the torch/HF reference model
and our JAX model on identical inputs and writes per-module activations +
deltas to an .npz — the golden-tensor strategy SURVEY.md §4 prescribes for
the rebuild (the reference repo itself has no tests).

Usage:
  python tools/export_goldens.py qwen2 --hf <hf_dir> --out goldens.npz
  python tools/export_goldens.py proj  --ckpt proj.bin --model \
      x2i-internvl2.5-1b --out goldens.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def export_qwen2(hf_dir: str, out: str, seq: int = 16) -> None:
    import jax.numpy as jnp
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from x2i_tpu.convert.torch_models import qwen2_params_from_hf
    from x2i_tpu.core.config import Qwen2Config
    from x2i_tpu.models.qwen2 import Qwen2LM

    hf = AutoModelForCausalLM.from_pretrained(
        hf_dir, torch_dtype=torch.float32).eval()
    c = hf.config
    cfg = Qwen2Config(vocab_size=c.vocab_size, hidden_size=c.hidden_size,
                      intermediate_size=c.intermediate_size,
                      num_hidden_layers=c.num_hidden_layers,
                      num_attention_heads=c.num_attention_heads,
                      num_key_value_heads=c.num_key_value_heads,
                      head_dim=c.hidden_size // c.num_attention_heads,
                      rope_theta=c.rope_theta,
                      rms_norm_eps=c.rms_norm_eps,
                      tie_word_embeddings=c.tie_word_embeddings,
                      dtype=jnp.float32, param_dtype=jnp.float32,
                      use_pallas_attention=False)
    params = {"params": qwen2_params_from_hf(hf.state_dict(), cfg)}
    rng = np.random.default_rng(0)
    ids = rng.integers(0, c.vocab_size, (1, seq))
    pos = np.arange(seq)[None]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 position_ids=torch.tensor(pos),
                 output_hidden_states=True)
    want = torch.stack(ref.hidden_states, dim=1).numpy()
    got, _ = Qwen2LM(cfg).apply(params, jnp.asarray(ids),
                                position_ids=jnp.asarray(pos))
    got = np.asarray(got)
    np.savez(out, input_ids=ids, reference=want, ours=got,
             max_abs_delta=np.abs(got - want).max(axis=(0, 2, 3)))
    print(f"per-layer max|delta|: {np.abs(got - want).max(axis=(0, 2, 3))}")


def export_proj(ckpt: str, model: str, out: str) -> None:
    import importlib.util
    import jax.numpy as jnp
    import torch

    from x2i_tpu.convert.load import load_torch_bin
    from x2i_tpu.convert.torch_models import proj_params_from_reference
    from x2i_tpu.core.config import MODEL_REGISTRY
    from x2i_tpu.models.proj import Proj

    cfg = MODEL_REGISTRY[model]["proj"]
    sd = load_torch_bin(ckpt)
    params = {"params": proj_params_from_reference(sd, cfg)}

    spec = importlib.util.spec_from_file_location(
        "ref_proj", "/root/reference/utils/proj.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.Proj7Exp(in_channels=cfg.in_channels,
                       kernel_size=cfg.kernel_size,
                       input_dim=cfg.input_dim,
                       output_dim0=cfg.output_dim0,
                       output_dim1=cfg.output_dim1, use_t5=cfg.use_t5,
                       use_scale=cfg.use_scale,
                       use_cnn=cfg.use_cnn).eval().float()
    ref.load_state_dict({k.removeprefix("module."): v
                         for k, v in torch.load(
                             ckpt, map_location="cpu",
                             weights_only=True).items()})

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, cfg.in_channels, 512,
                             cfg.input_dim)).astype(np.float32)
    with torch.no_grad():
        want_pooled, want_seq = ref(torch.tensor(x))
    fcfg = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32,
                            "param_dtype": jnp.float32})
    pooled, seq = Proj(fcfg).apply(params, jnp.asarray(x))
    np.savez(out, pooled_ref=want_pooled.numpy(), pooled=np.asarray(pooled),
             seq_ref=want_seq.numpy(), seq=np.asarray(seq))
    print("pooled max|delta|:",
          np.abs(np.asarray(pooled) - want_pooled.numpy()).max())
    print("seq    max|delta|:",
          np.abs(np.asarray(seq) - want_seq.numpy()).max())


def main(argv=None) -> int:
    p = argparse.ArgumentParser("export_goldens")
    p.add_argument("kind", choices=("qwen2", "proj"))
    p.add_argument("--hf", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--model", default="x2i-internvl2.5-1b")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if args.kind == "qwen2":
        export_qwen2(args.hf, args.out)
    else:
        export_proj(args.ckpt, args.model, args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
