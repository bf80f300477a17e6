"""bf16 compute mode: forward agrees with f32 to bf16 tolerance, training
step stays finite, and loss math is f32 regardless."""

import numpy as np
import jax
import jax.numpy as jnp

from crfconv_tpu.data.pipeline import synthetic_batch
from crfconv_tpu.models import PointConvResNet
from crfconv_tpu.models.common import set_compute_dtype


def test_bf16_forward_close_and_finite():
    batch = synthetic_batch(1, 256, 6, 8, seed=9)
    model = PointConvResNet(n_classes=8, use_crf=True, steps=1)
    try:
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=False,
        )
        ref = np.asarray(model.apply(variables, batch, train=False))
        set_compute_dtype(jnp.bfloat16)
        out = np.asarray(model.apply(variables, batch, train=False))
    finally:
        set_compute_dtype(None)
    assert out.dtype == np.float32 or out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(out.astype(np.float32)))
    # bf16 matmuls: agreement to ~1e-1 absolute on logits is expected
    err = np.abs(out.astype(np.float32) - ref)
    assert np.median(err) < 0.1, float(np.median(err))


def test_bf16_loss_is_f32():
    from crfconv_tpu.train.losses import weighted_cross_entropy

    scores = jnp.zeros((16, 5), jnp.bfloat16)
    labels = jnp.zeros((16,), jnp.int32)
    loss = weighted_cross_entropy(scores, labels)
    assert loss.dtype == jnp.float32
    assert np.isfinite(float(loss))
