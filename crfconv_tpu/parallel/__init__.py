from crfconv_tpu.parallel.sharding import (  # noqa: F401
    make_global_batch,
    make_mesh,
    shard_batch,
    shard_points,
    replicate,
    make_parallel_train_step,
)
from crfconv_tpu.parallel.spatial import (  # noqa: F401
    crf_mean_field_spatial,
)
