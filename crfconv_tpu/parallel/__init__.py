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
from crfconv_tpu.parallel.spatial_forward import (  # noqa: F401
    forward_spatial,
    make_spatial_forward,
)
from crfconv_tpu.parallel.spatial_build import (  # noqa: F401
    build_pyramid_windowed_spatial,
)
from crfconv_tpu.parallel.spatial_train import (  # noqa: F401
    make_spatial_train_step,
)
