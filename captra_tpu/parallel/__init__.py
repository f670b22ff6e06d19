from captra_tpu.parallel.mesh import (  # noqa: F401
    data_parallel_mesh,
    hybrid_data_parallel_mesh,
    replicate,
    shard_batch,
)
