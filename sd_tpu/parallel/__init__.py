from sd_tpu.parallel.mesh import (
    data_sharding,
    is_main_process,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)
