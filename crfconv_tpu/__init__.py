"""crfconv_tpu — TPU-native continuous-CRF point-cloud segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
yangfei1223/CRFConv reference (continuous Gaussian CRF decoders over
point-convolution U-Nets for 3D semantic / part segmentation).

Design pillars (see SURVEY.md §7):
  * All device computation is static-shape: neighbor structure is
    precomputed host-side into fixed-K padded int32 index pyramids.
  * Point convolutions and CRF mean-field iterations compile to dense
    gathers + batched contractions that map onto the TPU MXU/VPU.
  * The CRF mean-field loop has a fused Pallas kernel that keeps the
    feature state resident in VMEM across steps.
  * Scaling is expressed with jax.sharding (Mesh + NamedSharding) so the
    same train step runs single-chip or data/spatially parallel.
"""

__version__ = "0.1.0"

from crfconv_tpu.data.batch import PointBatch, RawBatch, ScaleData  # noqa: F401
from crfconv_tpu.data.ply import read_ply, write_ply  # noqa: F401
from crfconv_tpu.ops.knn_host import knn_batch  # noqa: F401
from crfconv_tpu.ops.subsample import grid_subsample  # noqa: F401
from crfconv_tpu.train.metrics import (  # noqa: F401
    RunningScore,
    RunningScoreShapeNet,
)
from crfconv_tpu.utils.logging import init_logger  # noqa: F401


def get_model(name: str, **kwargs):
    """Model registry lookup (lazy import keeps flax off the light path)."""
    from crfconv_tpu.models import get_model as _get

    return _get(name, **kwargs)


__all__ = [
    "PointBatch", "RawBatch", "ScaleData", "read_ply", "write_ply",
    "knn_batch", "grid_subsample", "RunningScore", "RunningScoreShapeNet",
    "init_logger", "get_model", "__version__",
]
