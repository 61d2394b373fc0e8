"""Command-line interface mirroring the reference inference scripts.

Task surface and flags from /root/reference/infer/inference_minicpm.py:29-35
and its qwenvl/internvl siblings: --task {text2image, image2image,
imagetext2image, video2image, audio2image, x2image}, --num_steps,
--flux_path/--mllm_path/--proj_path, sizes, seed; --use_answer
(reasoning2image, inference_qwenvl.py:121-132). `--random-weights tiny`
runs the full pipeline with random parameters (smoke/e2e without
checkpoints).

`x2i_tpu.cli multiturn` is the interactive chat REPL
(/root/reference/infer/inference_multi_turn.py:80-165): each turn decodes
an answer, conditions on cat(prefill, answer) hidden states, and writes an
image with a fixed seed.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

TASKS = ("text2image", "image2image", "imagetext2image", "video2image",
         "audio2image", "x2image")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("x2i_tpu")
    p.add_argument("--task", choices=TASKS, default="text2image")
    p.add_argument("--use_answer", action="store_true",
                   help="reasoning2image: decode an answer and condition "
                        "on cat(prefill, answer) hidden states "
                        "(Qwen2.5-VL family)")
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--image", type=str, action="append", default=None,
                   help="input image path(s)")
    p.add_argument("--video", type=str, default=None)
    p.add_argument("--audio", type=str, default=None)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--guidance_scale", type=float, default=3.5)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--flux_path", type=str, default=None)
    p.add_argument("--mllm_path", type=str, default=None)
    p.add_argument("--proj_path", type=str, default=None)
    p.add_argument("--model", type=str, default="x2i-internvl2.5-1b",
                   help="registry name (core.config.MODEL_REGISTRY)")
    p.add_argument("--random-weights", choices=("tiny",), default=None,
                   help="run with random weights at the given scale "
                        "(no checkpoints needed)")
    p.add_argument("--quantize",
                   choices=("none", "w8", "w8a8", "w4", "w4a8"),
                   default="w8",
                   help="DiT weight quantization for single-chip "
                        "serving: w8 near-lossless (default), w8a8 "
                        "fastest, w4a8 smallest-at-speed (int4 store, "
                        "int8 MXU — fits next to a 7B encoder), "
                        "none = bf16 (needs >16 GB)")
    p.add_argument("--output", type=str, default="output.png")
    return p


def build_multiturn_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("x2i_tpu multiturn")
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0,
                   help="fixed per-session seed (inference_multi_turn.py "
                        "uses 0 so turns refine the same trajectory)")
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--quantize",
                   choices=("none", "w8", "w8a8", "w4", "w4a8"),
                   default="w8")
    p.add_argument("--flux_path", type=str, default=None)
    p.add_argument("--mllm_path", type=str, default=None)
    p.add_argument("--proj_path", type=str, default=None)
    p.add_argument("--model", type=str, default="x2i-qwenvl2.5-7b")
    p.add_argument("--random-weights", choices=("tiny",), default=None)
    p.add_argument("--output_prefix", type=str, default="multiturn_",
                   help="images are written to {prefix}{turn}.png")
    return p


def multiturn_main(argv=None) -> int:
    """Interactive REPL (inference_multi_turn.py:80-165): empty input is
    rejected, 'stop' exits, every other line is one conversation turn."""
    args = build_multiturn_parser().parse_args(argv)

    if args.random_weights:
        from x2i_tpu.multiturn import build_random_session
        session = build_random_session(seed=args.seed,
                                       max_new_tokens=8)
    else:
        if not (args.flux_path and args.proj_path and args.mllm_path):
            print("error: provide --flux_path/--mllm_path/--proj_path or "
                  "--random-weights tiny", file=sys.stderr)
            return 2
        from x2i_tpu.multiturn import build_session_from_checkpoints
        session = build_session_from_checkpoints(
            model=args.model, flux_path=args.flux_path,
            mllm_path=args.mllm_path, proj_path=args.proj_path,
            num_steps=args.num_steps, height=args.height,
            width=args.width, seed=args.seed,
            max_new_tokens=args.max_new_tokens,
            quantized=False if args.quantize == "none" else args.quantize)

    from PIL import Image
    turn = 0
    while True:
        try:
            raw = input("\nPlease Input Query (stop to exit) >>> ")
        except EOFError:
            break
        if not raw:
            print("Query should not be empty!")
            continue
        if raw == "stop":
            break
        answer, image = session.turn(raw)
        turn += 1
        path = f"{args.output_prefix}{turn}.png"
        Image.fromarray(np.asarray(image)[0]).save(path)
        print(answer)
        print(f"wrote {path}")
    return 0


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "multiturn":
        return multiturn_main(argv[1:])
    args = build_parser().parse_args(argv)

    if args.random_weights:
        from x2i_tpu.core.config import GenerationConfig
        from x2i_tpu.pipeline import build_random_pipeline
        pipe = build_random_pipeline(
            args.random_weights,
            gen_cfg=GenerationConfig(height=min(args.height, 64),
                                     width=min(args.width, 64),
                                     num_inference_steps=args.num_steps,
                                     seed=args.seed))
    else:
        if not (args.flux_path and args.proj_path and args.mllm_path):
            print("error: provide --flux_path/--mllm_path/--proj_path or "
                  "--random-weights tiny", file=sys.stderr)
            return 2
        from x2i_tpu.convert.load import build_pipeline_from_checkpoints
        pipe = build_pipeline_from_checkpoints(
            model=args.model, flux_path=args.flux_path,
            mllm_path=args.mllm_path, proj_path=args.proj_path,
            num_steps=args.num_steps, height=args.height, width=args.width,
            seed=args.seed,
            quantized=False if args.quantize == "none" else args.quantize)

    images = audio = video = None
    if args.image:
        from PIL import Image
        images = [Image.open(p).convert("RGB") for p in args.image]
    if args.video:
        from x2i_tpu.data.video import load_video_frames
        video = load_video_frames(args.video)   # 1fps, <=64 frames
    if args.audio:
        import wave
        with wave.open(args.audio) as w:
            raw = w.readframes(w.getnframes())
            audio = (np.frombuffer(raw, np.int16).astype(np.float32)
                     / 32768.0)
    if args.task in ("image2image", "imagetext2image", "x2image") \
            and images is None and not args.random_weights:
        print("error: task requires --image", file=sys.stderr)
        return 2
    if args.task == "text2image" and not args.prompt:
        print("error: text2image requires --prompt", file=sys.stderr)
        return 2

    out = pipe.run_task(args.task, prompt=args.prompt, images=images,
                        video=video, audio=audio, seed=args.seed,
                        use_answer=args.use_answer)

    from PIL import Image
    img = Image.fromarray(out[0])
    img.save(args.output)
    print(f"wrote {args.output} ({img.size[0]}x{img.size[1]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
