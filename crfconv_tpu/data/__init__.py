from crfconv_tpu.data.batch import PointBatch, ScaleData  # noqa: F401
