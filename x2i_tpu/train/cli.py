"""Training CLIs mirroring the reference launchers.

`python -m x2i_tpu.train.cli distill ...` replaces
torchrun train/train_{minicpm,qwenvl,internvl}.py (one trainer, the encoder
is a flag — the reference's three scripts are ~95% identical clones,
SURVEY.md §1). `... lightcontrol ...` replaces accelerate
lightcontrol/train_lightcontrol.py. Flags mirror
/root/reference/train/train_minicpm.py:68-187 and train_minicpm.sh.

Without checkpoints/data this runs on synthetic batches with
randomly-initialized tiny or full models (--synthetic / --tiny), which is
also how the trainer is exercised in CI.
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser():
    p = argparse.ArgumentParser("x2i_tpu.train")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("distill", help="phase-1 attention distillation")
    d.add_argument("--model", default="x2i-internvl2.5-1b")
    d.add_argument("--urls", default=None, help="webdataset shard urls")
    d.add_argument("--synthetic", action="store_true",
                   help="synthetic token batches (no data needed)")
    d.add_argument("--tiny", action="store_true",
                   help="tiny random models (no checkpoints needed)")
    d.add_argument("--batch_size", type=int, default=1)
    d.add_argument("--learning_rate", type=float, default=1e-4)
    d.add_argument("--lr_warmup_steps", type=int, default=100)
    d.add_argument("--max_train_steps", type=int, default=100_000)
    d.add_argument("--gradient_accumulation_steps", type=int, default=1)
    d.add_argument("--max_grad_norm", type=float, default=1.0)
    d.add_argument("--use_8bit_adam", action="store_true")
    d.add_argument("--checkpointing_steps", type=int, default=1000)
    d.add_argument("--checkpoints_total_limit", type=int, default=5)
    d.add_argument("--output_dir", default="ckpt_distill")
    d.add_argument("--seed", type=int, default=2024)
    d.add_argument("--trace_dir", default=None)

    l = sub.add_parser("lightcontrol", help="phase-2 ControlNeXt finetune")
    l.add_argument("--tiny", action="store_true")
    l.add_argument("--synthetic", action="store_true")
    l.add_argument("--batch_size", type=int, default=1)
    l.add_argument("--learning_rate", type=float, default=1e-5)
    l.add_argument("--max_train_steps", type=int, default=2_000_000)
    l.add_argument("--gradient_accumulation_steps", type=int, default=8)
    l.add_argument("--checkpointing_steps", type=int, default=1000)
    l.add_argument("--output_dir", default="ckpt_lightcontrol")
    l.add_argument("--seed", type=int, default=42)
    return p


def run_distill(args) -> int:
    import jax

    from x2i_tpu.train.runner import TrainLoop

    if not args.tiny:
        print("full-size distillation requires converted checkpoints; "
              "run with --tiny --synthetic for the wired-up smoke path",
              file=sys.stderr)
        return 2

    from x2i_tpu.train.harness import build_tiny_distill
    step_fn, state, flux_params, batch = build_tiny_distill(
        batch_size=args.batch_size, use_8bit_adam=args.use_8bit_adam)

    def batches():
        while True:
            yield batch

    loop = TrainLoop(step_fn, state, flux_params, batches(),
                     checkpoint_dir=args.output_dir,
                     checkpointing_steps=args.checkpointing_steps,
                     max_to_keep=args.checkpoints_total_limit,
                     trace_dir=args.trace_dir, seed=args.seed,
                     log_every=10)
    metrics = loop.run(args.max_train_steps)
    print(f"final: {metrics}")
    return 0


def run_lightcontrol(args) -> int:
    if not args.tiny:
        print("lightcontrol full-size training requires converted "
              "checkpoints; run with --tiny --synthetic for the wired-up "
              "smoke path", file=sys.stderr)
        return 2

    import jax
    import jax.numpy as jnp
    import numpy as np

    from x2i_tpu.core.config import (ControlNeXtConfig, LightControlConfig,
                                     SchedulerConfig, VAEConfig,
                                     tiny_flux_config)
    from x2i_tpu.models.controlnext import init_control_bank
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.vae import AutoencoderKL
    from x2i_tpu.train.lightcontrol import (ControlTrainState,
                                            make_lightcontrol_optimizer,
                                            make_lightcontrol_step)
    from x2i_tpu.train.runner import TrainLoop

    flux_cfg = tiny_flux_config(guidance_embeds=True, in_channels=16)
    vae_cfg = VAEConfig(block_out_channels=(8, 8, 8, 8),
                        layers_per_block=1, latent_channels=4,
                        norm_num_groups=4, dtype=jnp.float32,
                        param_dtype=jnp.float32)
    ctrl_cfg = ControlNeXtConfig(in_channels=(8, 8), out_channels=(8, 16),
                                 groups=(2, 2), time_embed_dim=16,
                                 final_out_channels=flux_cfg.inner_dim,
                                 dtype=jnp.float32,
                                 param_dtype=jnp.float32)
    ccfg = LightControlConfig(
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        learning_rate=args.learning_rate)
    PX, B, S_txt = 32, args.batch_size, 8
    flux = FluxTransformer2D(flux_cfg)
    vae = AutoencoderKL(vae_cfg)
    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)
    px = jnp.asarray(rng.standard_normal((B, PX, PX, 3)), jnp.float32)
    vae_params = vae.init(key, px[:1])
    s_img = (PX // 16) ** 2
    flux_params = flux.init(
        key, jnp.zeros((1, s_img, flux_cfg.in_channels)),
        jnp.zeros((1, S_txt, flux_cfg.joint_attention_dim)),
        jnp.zeros((1, flux_cfg.pooled_projection_dim)), jnp.zeros((1,)),
        jnp.zeros((s_img, 3)), jnp.zeros((S_txt, 3)),
        guidance=jnp.ones((1,)),
        controls=jnp.zeros((flux_cfg.num_layers, 1, s_img,
                            flux_cfg.inner_dim)))
    bank = init_control_bank(ctrl_cfg, flux_cfg.num_layers, key,
                             image_size=PX)
    prompt = jnp.asarray(
        rng.standard_normal((B, S_txt, flux_cfg.joint_attention_dim)),
        jnp.float32)
    pooled = jnp.asarray(
        rng.standard_normal((B, flux_cfg.pooled_projection_dim)),
        jnp.float32)
    opt = make_lightcontrol_optimizer(ccfg)
    step = make_lightcontrol_step(
        flux.apply,
        lambda p, r: vae.apply(vae_params, p, r, method=vae.encode),
        lambda b: (pooled, prompt), ctrl_cfg, flux_cfg, ccfg,
        SchedulerConfig(shift=3.0), opt)
    state = ControlTrainState(bank, opt.init(bank),
                              jnp.zeros((), jnp.int32))

    def batches():
        while True:
            yield {"style_pixels": px}

    loop = TrainLoop(step, state, flux_params, batches(),
                     checkpoint_dir=args.output_dir,
                     checkpointing_steps=args.checkpointing_steps,
                     seed=args.seed, log_every=10)
    metrics = loop.run(args.max_train_steps)
    print(f"final: {metrics}")
    return 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    args = build_parser().parse_args(argv)
    if args.cmd == "distill":
        return run_distill(args)
    return run_lightcontrol(args)


if __name__ == "__main__":
    raise SystemExit(main())
