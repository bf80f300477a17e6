"""Shared model building blocks.

``MLP`` reproduces the reference block Linear(bias iff no BN) → BatchNorm →
activation (reference models/common.py:26-40); ``MaskedBatchNorm`` is the
TPU-native replacement for FastBatchNorm1d that additionally supports a
point-validity mask so statistics exclude padded points (a capability the
reference never needed because it relied on exact-size KDTree crops —
SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

# torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
# i.e. variance 1/(3 fan_in).  Matching it keeps training dynamics comparable
# with the reference for the parity harness.
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)

# Trace-time compute dtype for all MLP matmuls (params stay f32).  bf16
# doubles MXU rate; normalization statistics and the CRF mean-field math
# stay f32 regardless.  Set before jitting; default f32 for parity.
_COMPUTE = {"dtype": None}


def set_compute_dtype(dtype: Optional[jnp.dtype]) -> None:
    """None → full f32; jnp.bfloat16 → mixed-precision matmuls."""
    _COMPUTE["dtype"] = dtype


def get_compute_dtype():
    return _COMPUTE["dtype"]


@contextlib.contextmanager
def compute_dtype_scope(dtype: Optional[jnp.dtype]):
    """Scoped variant of set_compute_dtype: restores the previous dtype on
    exit so one component's precision choice never leaks into later
    trace-time reads in the same process (same failure class as the
    neighbor-regime global, VERDICT r4 weak #2)."""
    prev = _COMPUTE["dtype"]
    _COMPUTE["dtype"] = dtype
    try:
        yield
    finally:
        _COMPUTE["dtype"] = prev


def torch_linear_bias_init(key, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def leaky_relu01(x):
    """LeakyReLU(negative_slope=0.1) — the big-family activation."""
    return nn.leaky_relu(x, negative_slope=0.1)


def leaky_relu001(x):
    """LeakyReLU(negative_slope=0.01) — torch's default slope, used by the
    small family's inplace LeakyReLU and by F.leaky_relu residual adds."""
    return nn.leaky_relu(x, negative_slope=0.01)


class MaskedBatchNorm(nn.Module):
    """Batch normalization over all leading axes with optional validity mask.

    Semantics follow torch BatchNorm1d: train mode normalizes with biased
    batch statistics and updates running stats with momentum 0.1 (here the
    flax convention ``ra = decay*ra + (1-decay)*batch`` with decay 0.9),
    using the unbiased variance for the running estimate; eval mode
    normalizes with the running statistics.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))

        # point-sharded training (parallel/spatial_train.py): when this
        # array's point-axis frame is sharded over a mesh axis, batch
        # statistics must be GLOBAL — reduce (count, Σx, Σx²) with psum
        spatial_axis = None
        if train:
            from crfconv_tpu.ops import spatial_state

            ctx = spatial_state.current()
            if ctx is not None and x.ndim >= 2:
                fr = ctx["frames"].get(x.shape[1])
                if fr is not None and fr[0]:
                    # stat_axes ⊇ axis: under a 2-D (data × points) mesh
                    # the batch dim is also device-split, so statistics
                    # reduce over both axes (psum takes a name tuple)
                    spatial_axis = ctx.get("stat_axes", ctx["axis"])
                elif ctx.get("data_axis") is not None:
                    # replicated point frame, but the BATCH dim is still
                    # device-split on the data axis — stats must reduce
                    # over it to match the unsharded step
                    spatial_axis = (ctx["data_axis"],)

        if train:
            # statistics at least f32; f64 inputs (x64 parity tests) keep f64
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            reduce_axes = tuple(range(x.ndim - 1))
            if spatial_axis is not None:
                if mask is None:
                    count = jnp.asarray(
                        float(x.size // features), dtype=jnp.float32
                    )
                    s1 = jnp.sum(xf, axis=reduce_axes)
                    s2 = jnp.sum(jnp.square(xf), axis=reduce_axes)
                else:
                    m = mask.astype(jnp.float32)[..., None]
                    count = jnp.sum(m)
                    s1 = jnp.sum(xf * m, axis=reduce_axes)
                    s2 = jnp.sum(jnp.square(xf) * m, axis=reduce_axes)
                count = jnp.maximum(
                    jax.lax.psum(count, spatial_axis), 1.0
                )
                s1 = jax.lax.psum(s1, spatial_axis)
                s2 = jax.lax.psum(s2, spatial_axis)
                mean = s1 / count
                var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
            elif mask is None:
                count = jnp.asarray(
                    float(x.size // features), dtype=jnp.float32
                )
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            else:
                m = mask.astype(jnp.float32)[..., None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=reduce_axes) / count
                var = jnp.sum(jnp.square(xf - mean) * m, axis=reduce_axes) / count
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(x.dtype)


class MLP(nn.Module):
    """Linear (bias iff no BN) → BatchNorm → activation.

    Reference: models/common.py:26-40.
    """

    features: int
    use_bn: bool = True
    activation: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        fan_in = x.shape[-1]
        x = nn.Dense(
            self.features,
            use_bias=not self.use_bn,
            dtype=_COMPUTE["dtype"],
            kernel_init=torch_linear_kernel_init,
            bias_init=lambda k, s, d=jnp.float32: torch_linear_bias_init(
                k, s, d, fan_in
            ),
        )(x)
        if self.use_bn:
            x = MaskedBatchNorm()(x, train=train, mask=mask)
        if self.activation is not None:
            x = self.activation(x)
        return x
