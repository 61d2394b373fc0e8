"""x2i_tpu: TPU-native (JAX/XLA/Pallas/pjit) rebuild of OPPO-Mente-Lab/X2I.

Condition a FLUX-class rectified-flow Diffusion Transformer on the hidden
states of a frozen multimodal LLM through a small trainable alignment
network ("proj"), so images can be generated from multilingual text, images,
video, audio, OCR/long documents and multi-turn chat.

Layering (bottom → top), mirroring SURVEY.md §1 but TPU-idiomatic:
  core/       mesh + sharding, typed configs, checkpointing, profiling
  ops/        Pallas kernels (flash attention) + fused math (RoPE, norms)
  models/     FLUX DiT, VAE, proj, MLLM encoder stacks, ControlNeXt
  diffusion/  flow-match Euler scheduler + lax.scan sampling loop
  data/       host-side webdataset-style input pipeline
  train/      phase-1 attention distillation + phase-2 LightControl
  convert/    torch/safetensors → JAX weight converters
  pipeline    user-facing inference API (mirrors reference infer/ scripts)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy public API (keeps `import x2i_tpu` light)
    if name == "X2IPipeline":
        from x2i_tpu.pipeline import X2IPipeline
        return X2IPipeline
    if name == "build_random_pipeline":
        from x2i_tpu.pipeline import build_random_pipeline
        return build_random_pipeline
    if name == "build_pipeline_from_checkpoints":
        from x2i_tpu.convert.load import build_pipeline_from_checkpoints
        return build_pipeline_from_checkpoints
    if name == "MODEL_REGISTRY":
        from x2i_tpu.core.config import MODEL_REGISTRY
        return MODEL_REGISTRY
    if name == "MultiTurnSession":
        from x2i_tpu.multiturn import MultiTurnSession
        return MultiTurnSession
    if name == "StreamingSession":
        from x2i_tpu.streaming import StreamingSession
        return StreamingSession
    if name == "TTSPipeline":
        from x2i_tpu.streaming import TTSPipeline
        return TTSPipeline
    if name == "BatchingServer":
        from x2i_tpu.serve import BatchingServer
        return BatchingServer
    raise AttributeError(name)
