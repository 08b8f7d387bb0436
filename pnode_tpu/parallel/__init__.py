from .data_parallel import (
    make_mesh,
    shard_batch,
    replicate,
    dp_value_and_grad,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "dp_value_and_grad"]
