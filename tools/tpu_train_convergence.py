#!/usr/bin/env python
"""Training convergence artifact: 500+ real TrainLoop steps on one chip,
with a mid-run crash + auto-resume, recording the KD-loss curve.

VERDICT r3 item 6: tests prove the distill step *runs and learns* over a
handful of tiny steps; this proves trainer + checkpointing work as a
SYSTEM — the full-size (12B FLUX) phase-1 distillation step at the
grid-96 operating point, driven by x2i_tpu.train.runner.TrainLoop with
periodic orbax checkpoints, killed mid-run (simulated crash via
os._exit AFTER a step completes — never mid-TPU-op, which wedges this
environment's relay), then auto-resumed from the latest checkpoint and
run to completion. The loss curve (JSONL) must decline through the
resume point.

The data is a fixed synthetic set of --num_samples conditioning tuples
cycled forever (the reference's phase-1 data is (mllm hidden states,
t5/clip teacher conditioning) pairs, train_minicpm.py:663-825; a small
fixed set makes convergence visible in 500 steps).

Usage:
  python tools/tpu_train_convergence.py --max_steps 500 --die_at 250
  python tools/tpu_train_convergence.py --max_steps 500   # auto-resumes
  python tools/tpu_train_convergence.py --report          # summarize
"""
from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

OUT_DIR = "/tmp/x2i_convergence"


def build(grid: int, num_samples: int, seed: int = 0,
          lr: float = 1e-4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from x2i_tpu.core.config import DistillConfig, FluxConfig, ProjConfig
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.proj import Proj
    from x2i_tpu.train.distill import (TrainState, make_distill_step,
                                       make_optimizer)
    from __graft_entry__ import _full_size_quantized_flux_params

    s_txt = 512
    s_img = (grid // 2) ** 2
    flux_cfg = FluxConfig(quantized="w8a8", guidance_embeds=False,
                          remat="stack", single_scan_chunks=2)
    flux = FluxTransformer2D(flux_cfg)
    flux_params = _full_size_quantized_flux_params(flux, flux_cfg,
                                                   s_img, s_txt)

    proj_cfg = ProjConfig(in_channels=29, input_dim=3584)
    proj = Proj(proj_cfg)
    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(num_samples):
        samples.append({
            "t5_seq": jnp.asarray(
                rng.standard_normal(
                    (1, s_txt, flux_cfg.joint_attention_dim)) * 0.05,
                jnp.bfloat16),
            "clip_pooled": jnp.asarray(
                rng.standard_normal(
                    (1, flux_cfg.pooled_projection_dim)) * 0.05,
                jnp.bfloat16),
            "mllm_states": jnp.asarray(
                rng.standard_normal((1, 29, s_txt, 3584)) * 0.05,
                jnp.bfloat16),
        })
    proj_params = proj.init(jax.random.key(seed), samples[0]["mllm_states"])

    dcfg = DistillConfig(latent_height=grid, latent_width=grid,
                         inline_kd=True, use_8bit_adam=True,
                         kd_stacks_int8=True, learning_rate=lr)
    optimizer = make_optimizer(dcfg)
    state = TrainState(proj_params, optimizer.init(proj_params),
                       jnp.zeros((), jnp.int32))
    # Split teacher/student two-program step (train/single_chip.py): the
    # colocated single program's teacher-fwd + student-fwd/bwd liveness
    # OOMs one 16 GB chip at full size (measured this round at grid 96);
    # the split topology is how tpu_trainbench.py runs it too.
    from x2i_tpu.train.single_chip import compile_single_chip_distill
    step_fn, _, _ = compile_single_chip_distill(
        flux.apply, proj.apply,
        lambda b: (b["t5_seq"], b["clip_pooled"]),
        lambda b: b["mllm_states"], optimizer, flux_cfg, dcfg,
        state, flux_params, samples[0], jax.random.key(1))
    return step_fn, state, flux_params, samples


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=96)
    ap.add_argument("--max_steps", type=int, default=500)
    ap.add_argument("--die_at", type=int, default=None,
                    help="crash (os._exit) after this step completes")
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--ckpt_every", type=int, default=100)
    ap.add_argument("--lr", type=float, default=2e-5,
                    help="peak LR; the reference's 1e-4 diverges on the "
                         "small fixed synthetic set once warmup ends "
                         "(measured: loss 400 -> 4500 by step 100)")
    ap.add_argument("--out_dir", default=OUT_DIR)
    ap.add_argument("--report", action="store_true")
    a = ap.parse_args(argv)

    curve_path = os.path.join(a.out_dir, "loss_curve.jsonl")
    if a.report:
        return report(curve_path)

    import jax
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from x2i_tpu.train.runner import TrainLoop

    os.makedirs(a.out_dir, exist_ok=True)
    step_fn, state, flux_params, samples = build(
        a.grid, a.num_samples, lr=a.lr)
    batches = itertools.cycle(samples)

    curve = open(curve_path, "a")
    t_start = time.monotonic()
    pending = []

    def flush():
        # device->host fetches amortized: each np.asarray is a relay
        # round-trip, so fetching per-step doubles the step wall time
        for s, dev_loss, t in pending:
            curve.write(json.dumps(
                {"step": s, "loss": round(float(np.asarray(dev_loss)), 6),
                 "t": t}) + "\n")
        pending.clear()
        curve.flush()

    def on_metrics(step, metrics):
        pending.append((step, metrics["loss"],
                        round(time.monotonic() - t_start, 1)))
        if len(pending) >= 25 or (a.die_at is not None
                                  and step + 1 >= a.die_at):
            flush()
        if a.die_at is not None and step + 1 >= a.die_at:
            print(f"simulated crash after step {step}", flush=True)
            curve.close()
            os._exit(3)

    loop = TrainLoop(step_fn, state, flux_params, batches,
                     checkpoint_dir=os.path.join(a.out_dir, "ckpt"),
                     checkpointing_steps=a.ckpt_every, log_every=25,
                     on_metrics=on_metrics, jit_step=False)
    resumed_from = int(np.asarray(loop.state.step))
    print(f"starting at step {resumed_from} "
          f"({'auto-resumed' if resumed_from else 'fresh'})", flush=True)
    last = loop.run(a.max_steps)
    flush()
    print(json.dumps({"final": {k: v for k, v in last.items()
                                if k != "timing"},
                      "timing": last.get("timing"),
                      "resumed_from": resumed_from}), flush=True)
    curve.close()


def report(curve_path: str):
    import numpy as np
    rows = [json.loads(l) for l in open(curve_path)]
    steps = np.array([r["step"] for r in rows])
    loss = np.array([r["loss"] for r in rows])
    # resume re-runs steps from the last checkpoint; keep the LAST record
    # per step so the curve is the as-trained trajectory
    last = {}
    for r in rows:
        last[r["step"]] = r["loss"]
    ss = sorted(last)
    ll = [last[s] for s in ss]
    n = len(ss)
    windows = {f"steps {ss[i]}..{ss[min(i + n // 5, n - 1)]}":
               round(float(np.mean(ll[i:i + n // 5])), 4)
               for i in range(0, n, max(n // 5, 1))}
    print(json.dumps({
        "records": len(rows), "unique_steps": n,
        "first_loss": ll[0], "last_loss": ll[-1],
        "decline_ratio": round(ll[-1] / ll[0], 4),
        "window_means": windows}))


if __name__ == "__main__":
    main()
