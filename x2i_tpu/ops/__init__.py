from x2i_tpu.ops.attention import attention
from x2i_tpu.ops.rope import (
    flux_rope_freqs,
    apply_rope_interleaved,
    rope_freqs_half,
    apply_rope_half,
)
from x2i_tpu.ops.norms import rms_norm, layer_norm
