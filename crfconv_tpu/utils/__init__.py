from crfconv_tpu.utils.benchtools import device_time  # noqa: F401
from crfconv_tpu.utils.logging import init_logger  # noqa: F401
