from micformer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_shardings,
    shard_cases,
    is_primary,
)
