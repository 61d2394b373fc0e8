#!/usr/bin/env python
"""Prove the data engine feeds the FULL-SIZE trainer at rate.

VERDICT r4 item 5: the C++ tar reader, webdataset stages, and prefetch
loader are correctness-tested, but no artifact showed the real input
pipeline sustaining the measured full-size step rates (0.37-0.41 steps/s)
— the reference built a whole Ray/rpyc tier precisely because training
stalls hide here (/root/reference/core/data/dataloader.py:269-784).

This tool:
  --write        writes N real tar shards of 1024^2 JPEG + caption json
                 (the phase-2 sample shape, lightcontrol datamodule
                 layout: style target image + instruction)
  --loader-only  drains the production pipeline (ShardSampler ->
                 tar_samples [native tarindex] -> decode -> pixel
                 transform -> batch -> PrefetchLoader) and reports
                 samples/s on this host's single core
  (default)      runs --max_steps full-size LightControl steps (frozen
                 int8 12B FLUX fwd+bwd + 19 control branches at the
                 1024^2 operating point) consuming the loader, and
                 reports steps/s plus the per-step time spent BLOCKED on
                 the loader (the stall the reference's Ray tier exists to
                 kill)

Usage:
  python tools/tpu_data_at_rate.py --write --shards 64 --per_shard 8
  python tools/tpu_data_at_rate.py --loader-only --samples 200
  python tools/tpu_data_at_rate.py --max_steps 100
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

DATA_DIR = "/tmp/x2i_data_at_rate"
PX = 1024


def write_shards(out_dir: str, n_shards: int, per_shard: int,
                 seed: int = 0):
    import numpy as np
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for s in range(n_shards):
        path = os.path.join(out_dir, f"shard-{s:05d}.tar")
        with tarfile.open(path, "w") as tf:
            for i in range(per_shard):
                key = f"{s:05d}{i:04d}"
                # structured synthetic image (compresses like a photo,
                # not noise — noise JPEGs are pathologically slow/big)
                yy, xx = np.mgrid[0:PX, 0:PX]
                img = (127 + 80 * np.sin(xx / (7 + s % 13) + i)
                       + 40 * np.cos(yy / (11 + i % 7))
                       + rng.normal(0, 12, (PX, PX))).clip(0, 255)
                im = Image.fromarray(
                    np.stack([img, np.roll(img, 31, 0),
                              np.roll(img, 67, 1)], -1).astype(np.uint8))
                buf = io.BytesIO()
                im.save(buf, "JPEG", quality=90)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                meta = json.dumps({"caption": f"synthetic pair {key}",
                                   "instruction": "no"}).encode()
                info = tarfile.TarInfo(f"{key}.json")
                info.size = len(meta)
                tf.addfile(info, io.BytesIO(meta))
    n = n_shards * per_shard
    print(f"wrote {n_shards} shards / {n} samples "
          f"({time.time()-t0:.0f}s)", flush=True)


def make_loader(data_dir: str, seed: int = 0):
    """The production pipeline: shard shuffle -> native tar -> jpeg
    decode -> [-1,1] float pixels -> batch-of-1 -> prefetch thread."""
    import numpy as np
    from x2i_tpu.data.loader import PrefetchLoader
    from x2i_tpu.data.webdataset import Pipeline, ShardSampler, tar_samples

    shards = ShardSampler(os.path.join(data_dir, "shard-{00000..%05d}.tar"
                                       % (len(os.listdir(data_dir)) - 1)),
                          seed=seed, resample=True)

    def to_pixels(sample):
        im = sample["jpg"]                     # PIL (decode stage)
        meta = sample["json"]                  # dict (decode stage)
        px = np.asarray(im, np.float32) / 127.5 - 1.0
        return {"style_pixels": px[None], "caption": meta["caption"]}

    pipe = (Pipeline(tar_samples(iter(shards)))
            .decode()
            .verify(["jpg", "json"])
            .map(to_pixels))
    return PrefetchLoader(iter(pipe), prefetch=2)


def loader_only(data_dir: str, n_samples: int):
    t0 = time.time()
    n = 0
    for batch in make_loader(data_dir):
        n += 1
        if n >= n_samples:
            break
    dt = time.time() - t0
    print(json.dumps({"samples": n, "seconds": round(dt, 1),
                      "samples_per_s": round(n / dt, 3),
                      "note": "full-size step rates to beat: "
                              "0.366-0.41 steps/s"}), flush=True)


def run_training(data_dir: str, max_steps: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpu_lightcontrol_convergence import build

    grid = PX // 8
    exec_step, relayout, state, flux_params, samples = build(grid, 1)
    cond = {"prompt": samples[0]["prompt"], "pooled": samples[0]["pooled"]}
    state = relayout(state)

    loader = iter(make_loader(data_dir))
    key = jax.random.key(0)
    wait_s = []
    t_run0 = None
    n = 0
    t_last = time.perf_counter()
    for step in range(max_steps):
        t0 = time.perf_counter()
        host = next(loader)                   # blocked-on-data time
        wait_s.append(time.perf_counter() - t0)
        batch = {"style_pixels": jnp.asarray(host["style_pixels"],
                                             jnp.bfloat16), **cond}
        key, sub = jax.random.split(key)
        state, metrics = exec_step(state, flux_params, batch, sub)
        if step == 0:
            jax.block_until_ready(state)      # warm step done
            t_run0 = time.perf_counter()
            wait_s.clear()
            continue
        n += 1
    jax.block_until_ready(state)
    # fetch a real output to bound all enqueued steps (relay
    # block_until_ready can return early; see ROUND4_NOTES)
    loss = float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t_run0
    print(json.dumps({
        "steps": n, "seconds": round(dt, 1),
        "steps_per_s": round(n / dt, 4),
        "synthetic_baseline_steps_per_s": 0.366,
        "loader_wait_total_s": round(sum(wait_s), 2),
        "loader_wait_mean_ms": round(1e3 * sum(wait_s) / max(len(wait_s),
                                                             1), 1),
        "loader_wait_max_ms": round(1e3 * max(wait_s), 1),
        "final_loss": round(loss, 4)}), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=os.path.join(DATA_DIR, "shards"))
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--per_shard", type=int, default=8)
    ap.add_argument("--loader-only", action="store_true")
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--max_steps", type=int, default=100)
    a = ap.parse_args(argv)
    if a.write:
        return write_shards(a.data_dir, a.shards, a.per_shard)
    if a.loader_only:
        return loader_only(a.data_dir, a.samples)
    return run_training(a.data_dir, a.max_steps)


if __name__ == "__main__":
    main()
