from x2i_tpu.data.webdataset import (
    expand_urls,
    ShardSampler,
    tar_samples,
    decode_sample,
    key_verifier,
    Pipeline,
)
from x2i_tpu.data.loader import Preprocess, PrefetchLoader
