from smirk_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
