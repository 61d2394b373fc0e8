"""Serving latency/throughput microbench for the BatchingServer.

Measures, over a pipeline (tiny random by default, or real checkpoints via
the same flags as tools/eval_reference_parity.py):
  * p50/p95 single-request latency at light load (bucket-1 path),
  * steady-state throughput at saturating load (full-batch path),
  * the partial-load win of bucketed batches vs always-pad-to-max.

Run: python tools/serve_bench.py [--batch_size 4] [--requests 16]
     [--size 256] [--steps 4] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from x2i_tpu.pipeline import build_random_pipeline

    from x2i_tpu.core.config import GenerationConfig

    pipe = build_random_pipeline(
        scale="tiny",
        gen_cfg=GenerationConfig(height=args.size, width=args.size,
                                 num_inference_steps=args.steps))

    def bench(server, n, concurrency):
        lat = []

        def one(i):
            t0 = time.monotonic()
            server.generate({"prompt": f"bench {i}", "task": "text2image"},
                            timeout=600)
            lat.append(time.monotonic() - t0)

        t0 = time.monotonic()
        with ThreadPoolExecutor(concurrency) as ex:
            list(ex.map(one, range(n)))
        wall = time.monotonic() - t0
        return {"throughput_rps": n / wall,
                "latency_p50_s": float(np.percentile(lat, 50)),
                "latency_p95_s": float(np.percentile(lat, 95))}

    srv = pipe.serving_server(batch_size=args.batch_size, max_wait_s=0.05)
    # warm every bucket so compiles don't pollute the measurement
    for b in srv.buckets:
        with ThreadPoolExecutor(b) as ex:
            list(ex.map(
                lambda i: srv.generate(
                    {"prompt": "warm", "task": "text2image"}, timeout=900),
                range(b)))

    light = bench(srv, args.requests, 1)
    heavy = bench(srv, args.requests, args.batch_size)
    srv.close()

    # always-pad baseline: single bucket == batch_size
    srv_pad = pipe.serving_server(batch_size=args.batch_size,
                                  max_wait_s=0.05,
                                  buckets=[args.batch_size])
    srv_pad.generate({"prompt": "warm", "task": "text2image"}, timeout=900)
    light_pad = bench(srv_pad, args.requests, 1)
    srv_pad.close()

    # batched vs serial encoder at full batch: same request list through
    # run_batch with and without the single-prefill encoder program
    import dataclasses
    reqs = [{"prompt": f"encoder bench {i}", "task": "text2image"}
            for i in range(args.batch_size)]
    serial_pipe = dataclasses.replace(pipe, encoder_batch_fn=None)
    for p in (pipe, serial_pipe):     # warm both compiled programs
        p.run_batch(reqs)
    t0 = time.monotonic()
    for _ in range(3):
        pipe.run_batch(reqs)
    batched_s = (time.monotonic() - t0) / 3
    t0 = time.monotonic()
    for _ in range(3):
        serial_pipe.run_batch(reqs)
    serial_s = (time.monotonic() - t0) / 3

    result = {
        "batch_size": args.batch_size,
        "size": args.size,
        "light_load": light,
        "saturated": heavy,
        "light_load_always_pad": light_pad,
        "bucket_speedup_at_light_load":
            light_pad["latency_p50_s"] / light["latency_p50_s"],
        "run_batch_batched_encoder_rps": args.batch_size / batched_s,
        "run_batch_serial_encoder_rps": args.batch_size / serial_s,
        "batched_encoder_speedup": serial_s / batched_s,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
