from x2i_tpu.core.mesh import (data_sharding, fsdp_shard_tree, make_mesh,
                               replicate, replicate_tree, shard_batch)
from x2i_tpu.parallel.disaggregated import DisaggregatedDistill
