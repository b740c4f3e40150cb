from micformer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_shardings,
    shard_cases,
    is_primary,
    zero1_shardings,
)
from micformer_tpu.parallel.tensor import (  # noqa: F401
    tensor_parallel_shardings,
    tensor_parallel_apply,
    shard_params_tensor_parallel,
)
