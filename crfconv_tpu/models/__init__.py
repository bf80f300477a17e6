"""Model registry.

Mirrors the reference's public registry (models/__init__.py:1-3):
CRFSegNet_Part, BaselineSegNet, BaselineDiscreteCRFSegNet, CRFSegNet,
DualCRFSegNet, PointConvBig (= PointConvResNet) — all re-designed as
static-shape flax modules consuming a precomputed index pyramid.
"""

from crfconv_tpu.models.common import MLP, MaskedBatchNorm  # noqa: F401
from crfconv_tpu.models.point_conv_big import (  # noqa: F401
    PointConv,
    ResNetBBlock,
    Upsampling,
    PointConvResNet,
)
from crfconv_tpu.models.crf_conv import (  # noqa: F401
    ContinuousCRFConv,
    EdgeListContinuousCRFConv,
)
from crfconv_tpu.models.discrete_crf import DiscreteCRFConv  # noqa: F401
from crfconv_tpu.models.segnets import (  # noqa: F401
    BaselineSegNet,
    CRFSegNet,
    CRFSegNet_Part,
    BaselineDiscreteCRFSegNet,
    DualCRFSegNet,
)

PointConvBig = PointConvResNet

_REGISTRY = {
    "PointConvBig": PointConvResNet,
    "PointConvResNet": PointConvResNet,
    "BaselineSegNet": BaselineSegNet,
    "CRFSegNet": CRFSegNet,
    "CRFSegNet_Part": CRFSegNet_Part,
    "BaselineDiscreteCRFSegNet": BaselineDiscreteCRFSegNet,
    "DualCRFSegNet": DualCRFSegNet,
}


def get_model(name: str, **kwargs):
    """Look a model class up by its reference-compatible name."""
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**kwargs)
