from x2i_tpu.core.config import (
    FluxConfig,
    ProjConfig,
    VAEConfig,
    Qwen2Config,
    InternVLConfig,
    InternViTConfig,
    MeshConfig,
    MODEL_REGISTRY,
)
from x2i_tpu.core.mesh import make_mesh, shard_batch, replicate
