from crfconv_tpu.ops.neighbors import (  # noqa: F401
    gather_neighbors,
    upsample_nearest,
    max_pool_neighbors,
    masked_softmax,
    remove_self_loop,
    knn_bruteforce,
)
from crfconv_tpu.ops.crf import (  # noqa: F401
    gaussian_similarity,
    crf_mean_field,
    discrete_crf_update,
)
