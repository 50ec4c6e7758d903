from aglayout_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    make_sharded_generate,
    make_sharded_train_step,
)
