#!/usr/bin/env python
"""Phase-2 (LightControl) convergence artifact: 300+ real TrainLoop steps
of the FULL-SIZE control-bank training on one chip, with a mid-run crash +
auto-resume, recording the flow-match loss curve.

VERDICT r4 item 3: phase-1 earned its system-level evidence in round 4
(tools/tpu_train_convergence.py); this is the same artifact for phase-2 —
the reference trains ControlNeXt for 2M steps
(/root/reference/lightcontrol/train_lightcontrol.py:670-798); here the
identical full-size step (19 ControlNeXt branches, frozen int8 12B FLUX
fwd+bwd, 1024^2 targets -> 128x128 latents) runs under
x2i_tpu.train.runner.TrainLoop with periodic orbax checkpoints, is killed
AFTER a step completes (os._exit — never mid-TPU-op, which wedges the
relay), auto-resumes from the latest checkpoint, and the loss declines
through the resume point.

Data: a fixed synthetic set of --num_samples editing pairs (style target
pixels + frozen conditioning embeddings) cycled forever — the frozen
Qwen7B+proj conditioning is precomputed exactly as the reference shares
its frozen encoder across the ZeRO group (train_lightcontrol.py:717-724).

Usage:
  python tools/tpu_lightcontrol_convergence.py --max_steps 300 --die_at 150
  python tools/tpu_lightcontrol_convergence.py --max_steps 300  # resumes
  python tools/tpu_lightcontrol_convergence.py --report
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

OUT_DIR = "/tmp/x2i_lc_convergence"


def build(grid: int, num_samples: int, seed: int = 0, lr: float = 1e-5,
          quant: str = "w8a8"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from x2i_tpu.core.config import (ControlNeXtConfig, FluxConfig,
                                     LightControlConfig, SchedulerConfig,
                                     VAEConfig)
    from x2i_tpu.models.controlnext import init_control_bank
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.vae import AutoencoderKL
    from x2i_tpu.train.lightcontrol import (ControlTrainState,
                                            make_lightcontrol_optimizer,
                                            make_lightcontrol_step)
    from __graft_entry__ import _full_size_quantized_flux_params

    px = grid * 8
    s_txt = 512
    s_img = (grid // 2) ** 2
    flux_cfg = FluxConfig(quantized=quant, guidance_embeds=False,
                          remat="stack", single_scan_chunks=2,
                          rope_in_kernel=False)
    flux = FluxTransformer2D(flux_cfg)
    flux_params = _full_size_quantized_flux_params(flux, flux_cfg,
                                                   s_img, s_txt)

    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg)
    vae_params = vae.init(jax.random.key(0),
                          jnp.zeros((1, 256, 256, 3), jnp.bfloat16))

    ctrl_cfg = ControlNeXtConfig()
    ccfg = LightControlConfig(gradient_accumulation_steps=1,
                              use_8bit_adam=True, learning_rate=lr)
    bank = init_control_bank(ctrl_cfg, ccfg.num_controls,
                             jax.random.key(1), image_size=256)

    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(num_samples):
        samples.append({
            "style_pixels": jnp.asarray(
                rng.standard_normal((1, px, px, 3)) * 0.4, jnp.bfloat16),
            "prompt": jnp.asarray(
                rng.standard_normal(
                    (1, s_txt, flux_cfg.joint_attention_dim)) * 0.05,
                jnp.bfloat16),
            "pooled": jnp.asarray(
                rng.standard_normal(
                    (1, flux_cfg.pooled_projection_dim)) * 0.05,
                jnp.bfloat16),
        })

    optimizer = make_lightcontrol_optimizer(ccfg)
    state = ControlTrainState(bank, optimizer.init(bank),
                              jnp.zeros((), jnp.int32))

    # VAE encoder as its own program at 1024^2 (its full-res conv buffers
    # co-resident with the 12B backward overrun HBM —
    # tools/tpu_lightcontrol_bench.py measured both ways)
    def vae_encode(pix, r):
        return vae.apply(vae_params, pix, r, method=vae.encode)

    jenc = (jax.jit(vae_encode)
            .lower(samples[0]["style_pixels"], jax.random.key(9))
            .compile())

    step_fn = make_lightcontrol_step(
        flux.apply, None, lambda b: (b["pooled"], b["prompt"]),
        ctrl_cfg, flux_cfg, ccfg, SchedulerConfig(shift=3.0), optimizer,
        guidance_scale=None)

    batch0 = dict(samples[0])
    batch0["latents"] = jenc(batch0["style_pixels"], jax.random.key(9))
    t0 = time.perf_counter()
    jstep = (jax.jit(step_fn, donate_argnums=(0,))
             .lower(state, flux_params, batch0, jax.random.key(2))
             .compile())
    print(f"compile: {time.perf_counter()-t0:.0f}s", flush=True)
    mem = jstep.memory_analysis()
    if mem is not None:
        temp = mem.temp_size_in_bytes / 2**30
        args = mem.argument_size_in_bytes / 2**30
        donated = sum(x.size * x.dtype.itemsize
                      for x in jax.tree_util.tree_leaves(state)) / 2**30
        print(f"temp={temp:.2f}GiB args={args:.2f}GiB "
              f"(donated {donated:.2f}GiB)", flush=True)
        if temp + args - donated > 15.5:
            print("over the 15.75 GiB HBM budget — not executing",
                  flush=True)
            sys.exit(3)

    def exec_step(state, frozen_flux, batch, rng_key):
        # one-time relayout of a freshly init'd/restored state onto the
        # executable's donated-input formats (see bench tool notes)
        lat = jenc(batch["style_pixels"], rng_key)
        return jstep(state, frozen_flux, {**batch, "latents": lat},
                     rng_key)

    def relayout(state):
        import jax as _j
        return _j.device_put(state, jstep.input_formats[0][0])

    return exec_step, relayout, state, flux_params, samples


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=128,
                    help="latent grid; 128 = the reference 1024^2 point")
    ap.add_argument("--max_steps", type=int, default=300)
    ap.add_argument("--die_at", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=8)
    ap.add_argument("--ckpt_every", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-5)
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
    exec_step, relayout, state, flux_params, samples = build(
        a.grid, a.num_samples, lr=a.lr)
    batches = itertools.cycle(samples)

    curve = open(curve_path, "a")
    t_start = time.monotonic()
    pending = []

    def flush():
        # amortize device->host fetches (each np.asarray is a relay trip)
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

    loop = TrainLoop(exec_step, state, flux_params, batches,
                     checkpoint_dir=os.path.join(a.out_dir, "ckpt"),
                     checkpointing_steps=a.ckpt_every, log_every=25,
                     on_metrics=on_metrics, jit_step=False)
    loop.state = relayout(loop.state)     # fresh or orbax-restored
    resumed_from = int(np.asarray(loop.state.step))
    print(f"starting at step {resumed_from} "
          f"({'auto-resumed' if resumed_from else 'fresh'})", flush=True)
    last = loop.run(a.max_steps)
    flush()
    print(json.dumps({"final": {k: float(np.asarray(v)) for k, v in
                                last.items() if k != "timing"},
                      "timing": last.get("timing"),
                      "resumed_from": resumed_from}), flush=True)
    curve.close()


def report(curve_path: str):
    import numpy as np
    rows = [json.loads(l) for l in open(curve_path)]
    last = {}
    for r in rows:
        last[r["step"]] = r["loss"]        # resume re-runs: keep last
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
