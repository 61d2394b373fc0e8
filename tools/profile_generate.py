"""Profile the headline 4-step generate and print the device-time breakdown.

Runs one warm iteration of bench.py's exact program under
jax.profiler.trace, then parses the perfetto trace the TPU runtime wrote
and aggregates device-op durations by kernel family (attention kernels,
int8 matmuls, VAE convs, elementwise glue...). This answers "where would
the next millisecond come from" without eyeballing TensorBoard.

Usage: python tools/profile_generate.py [--px 512|1024]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_generate(px: int, quant: str = "w8a8",
                   rope_layout: str = "interleaved",
                   fused_glue: bool = False):
    from x2i_tpu.core.config import FluxConfig, SchedulerConfig, VAEConfig
    from x2i_tpu.diffusion import (FlowMatchEulerScheduler, denoise,
                                   prepare_latent_image_ids, unpack_latents)
    from x2i_tpu.models.flux import FluxTransformer2D
    from x2i_tpu.models.vae import AutoencoderKL
    from __graft_entry__ import _full_size_quantized_flux_params

    cfg = FluxConfig(quantized=quant, guidance_embeds=False,
                     rope_layout=rope_layout,
                     fused_glue=fused_glue)
    model = FluxTransformer2D(cfg)
    grid, s_txt = px // 8, 512
    s_img = (grid // 2) ** 2
    params = _full_size_quantized_flux_params(model, cfg, s_img, s_txt)

    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg)
    vae_params = vae.init(
        jax.random.key(0), jnp.zeros((1, grid, grid, vcfg.latent_channels),
                                     jnp.bfloat16), method=vae.decode)

    sched = FlowMatchEulerScheduler(SchedulerConfig(shift=1.0))
    sigmas = sched.inference_sigmas(4)
    img_ids = prepare_latent_image_ids(grid, grid)
    txt_ids = jnp.zeros((s_txt, 3), jnp.float32)

    def generate(params, vae_params, noise, prompt, pooled):
        # shared helper = the pipeline's shipping precomputed-mods program
        from x2i_tpu.diffusion import denoise_flux
        lat = denoise_flux(model, params, noise, prompt, pooled, sigmas,
                           img_ids, txt_ids)
        lat = unpack_latents(lat, px, px)
        return vae.apply(vae_params, jnp.transpose(lat, (0, 2, 3, 1)),
                         method=vae.decode)

    noise = jax.random.normal(jax.random.key(1),
                              (1, s_img, cfg.in_channels), jnp.bfloat16)
    prompt = jax.random.normal(jax.random.key(2),
                               (1, s_txt, cfg.joint_attention_dim),
                               jnp.bfloat16)
    pooled = jax.random.normal(jax.random.key(3),
                               (1, cfg.pooled_projection_dim), jnp.bfloat16)
    args = (params, vae_params, noise, prompt, pooled)
    compiled = jax.jit(generate).lower(*args).compile()
    return compiled, args


# Mosaic kernel launches are traced under their flax scope name
# (single_blocks.NN / double_blocks.NN): the big ones (~1.9 ms at 4608
# tokens) are the flash-attention kernels, the small ones the fused glue
# kernels — separated by a duration threshold at aggregation time below.
_FAMILIES = [
    ("pallas kernels (attn + glue)",
     re.compile(r"flash|attention_kernel|custom-call|"
                r"(?:single|double)_blocks\.\d+$", re.I)),
    ("int8 matmul (dense path)", re.compile(r"quant|int8|s8", re.I)),
    ("matmul/conv (bf16)", re.compile(r"convolution|dot|cudnn|conv", re.I)),
    ("copies/transposes", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("reduce fusions (norms)", re.compile(r"reduce", re.I)),
    ("fusions (elementwise glue)", re.compile(r"fusion|loop_", re.I)),
]


def classify(name: str) -> str:
    for label, pat in _FAMILIES:
        if pat.search(name):
            return label
    return "other"


def hlo_fusion_families(hlo_text: str):
    """Map trace fusion names (fusion.NNNN) to content-derived families by
    reading the compiled HLO: generic XLA fusion names hide whether a
    fusion is an int8 MXU matmul, a conv, or elementwise glue."""
    comp_text = {}                               # computation -> full text
    current = None
    for line in hlo_text.splitlines():
        ls = line.strip()
        if current is None:
            if "fused_computation" in ls and ls.endswith("{"):
                mm = re.search(r"%?([\w.\-]*fused_computation[\w.\-]*)", ls)
                if mm:
                    current = mm.group(1)
                    comp_text[current] = [ls]
            continue
        comp_text[current].append(ls)
        if ls.startswith("}"):
            current = None

    def fam_of(comp):
        text = "\n".join(comp_text.get(comp, ()))
        # the TPU backend canonicalizes dots to convolution ops, so a
        # "convolution" inside a denoise-loop fusion IS a matmul
        has_mxu = " dot(" in text or "convolution" in text
        if has_mxu and "s8[" in text:
            return "int8 matmul fusions (MXU)"
        if has_mxu:
            return "bf16 matmul/conv fusions (MXU)"
        return None

    fusion_fam = {}
    for m in re.finditer(
            r"%?([\w.\-]*fusion[\w.\-]*)\s*=[^\n]*?calls=%?([\w.\-]+)",
            hlo_text):
        fam = fam_of(m.group(2))
        if fam:
            fusion_fam[m.group(1)] = fam
    return fusion_fam


def parse_trace(trace_dir: str, fusion_fam=None):
    fusion_fam = fusion_fam or {}
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device-lane pids (TensorCore lanes carry the op stream)
    device_pids = {e["pid"] for e in events
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))}
    # Exclusive (self) time: events nest (jit module > while bodies >
    # fusions); walk each lane's interval stack and subtract child time
    # from the enclosing parent so totals do not double-count.
    lanes = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("Steam") or "Infeed" in name:
            continue
        # whole-module rows duplicate the op stream on a separate lane
        if name.startswith("jit_") or name.startswith("jit("):
            continue
        lanes[(e["pid"], e.get("tid"))].append(
            (float(e["ts"]), float(e.get("dur", 0.0)), name))

    per_op = collections.Counter()
    per_family = collections.Counter()
    total = 0.0
    for lane in lanes.values():
        lane.sort(key=lambda t: (t[0], -t[1]))
        stack = []                      # [end_ts, name, own_dur, child_dur]

        def pop(upto):
            nonlocal total
            while stack and stack[-1][0] <= upto + 1e-9:
                end, nm, own, child = stack.pop()
                if stack:
                    stack[-1][3] += own
                self_us = max(own - child, 0.0)
                per_op[nm] += self_us
                per_family[fusion_fam.get(nm, classify(nm))] += self_us
                total += self_us

        for ts, dur, name in lane:
            pop(ts)
            stack.append([ts + dur, name, dur, 0.0])
        pop(float("inf"))
    return per_op, per_family, total


def main():
    ap = argparse.ArgumentParser()
    # defaults = bench.py's shipping configuration (X2I_BENCH_* defaults):
    # profiles measure the program the headline number runs
    ap.add_argument("--px", type=int, default=1024)
    ap.add_argument("--quant", default="w8a8")
    ap.add_argument("--rope", default="half")
    ap.add_argument("--fused_glue", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--family", default=None,
                    help="also print the top ops of ONE family (substring "
                    "match, e.g. 'copies') with their HLO definition "
                    "lines — shapes tell which copy/transpose to attack")
    args = ap.parse_args()

    compiled, a = build_generate(args.px, args.quant, args.rope,
                             bool(args.fused_glue))
    out = compiled(*a)
    out.block_until_ready()                     # warm

    trace_dir = tempfile.mkdtemp(prefix="x2i_prof_")
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        out = compiled(*a)
        out.block_until_ready()
        wall = time.perf_counter() - t0
    print(f"wall: {wall*1e3:.1f} ms   ({args.px}^2, {args.quant})")

    try:
        fusion_fam = hlo_fusion_families(compiled.as_text())
    except Exception as e:                       # HLO text optional
        print(f"(no HLO fusion map: {e})")
        fusion_fam = {}
    per_op, per_family, total = parse_trace(trace_dir, fusion_fam)
    print(f"device op time: {total/1e3:.1f} ms")
    print("\n-- by family " + "-" * 40)
    for fam, dur in per_family.most_common():
        print(f"{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {fam}")
    print(f"\n-- top {args.top} ops " + "-" * 36)
    for name, dur in per_op.most_common(args.top):
        fam = fusion_fam.get(name)
        note = f"  [{fam}]" if fam else ""
        print(f"{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name[:80]}{note}")

    if args.family:
        try:
            hlo = compiled.as_text()
        except Exception:
            hlo = ""
        print(f"\n-- top ops in '{args.family}' " + "-" * 24)
        shown = 0
        for name, dur in per_op.most_common():
            fam = fusion_fam.get(name, classify(name))
            if args.family.lower() not in fam.lower():
                continue
            print(f"{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name}")
            # the HLO definition line carries shapes + operands
            m = re.search(rf"^\s*%?{re.escape(name)}\s*=\s*(.{{0,200}})",
                          hlo, re.M)
            if m:
                print(f"             {m.group(1)}")
            shown += 1
            if shown >= args.top:
                break


if __name__ == "__main__":
    main()
