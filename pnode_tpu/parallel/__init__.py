from .data_parallel import (
    make_mesh,
    shard_batch,
    replicate,
    dp_value_and_grad,
)
from .fused_dp import dp_fused_train_loop

__all__ = ["make_mesh", "shard_batch", "replicate", "dp_value_and_grad",
           "dp_fused_train_loop"]
