from crfconv_tpu.train.metrics import RunningScore, RunningScoreShapeNet  # noqa: F401
from crfconv_tpu.train.losses import weighted_cross_entropy  # noqa: F401
