from recnext_tpu.parallel.sharding import (
    batch_sharding,
    init_distributed,
    make_mesh,
    put_batch,
    replicated,
    state_sharding,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "state_sharding",
           "init_distributed", "put_batch"]
