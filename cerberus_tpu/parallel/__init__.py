from .mesh import (
    make_mesh,
    replicate_params,
    shard_batch,
    make_sharded_infer_step,
    make_sharded_train_step,
)
