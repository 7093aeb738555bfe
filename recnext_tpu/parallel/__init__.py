from recnext_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    replicated,
    state_sharding,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "state_sharding"]
