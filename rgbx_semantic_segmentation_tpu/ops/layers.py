"""Shared layer primitives: initializers, DropPath, norm wrappers.

Initialization parity targets: the `_init_weights` methods repeated across the
reference (e.g. dual_segformer.py:52-65): Linear = trunc_normal(std 0.02) / zero
bias; LayerNorm = ones/zeros; Conv2d = normal(0, sqrt(2/fan_out)) with
fan_out = kh*kw*out_channels/groups, zero bias.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Linear / token-mixing weights: trunc_normal(std=.02). jax truncates at +-2 sigma
# whereas timm's trunc_normal_ truncates at the absolute interval [-2, 2] (~100
# sigma at std .02) — statistically indistinguishable at this std.
trunc_normal_init = jax.nn.initializers.truncated_normal(stddev=0.02)


def conv_kaiming_init(groups: int = 1) -> Callable:
    """torch-style fan-out kaiming-normal for conv kernels (HWIO layout).

    fan_out = kh * kw * out_channels / groups (reference dual_segformer.py:60-63).
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, _, out_ch = shape
        fan_out = kh * kw * out_ch / groups
        std = (2.0 / fan_out) ** 0.5
        return std * jax.random.normal(key, shape, dtype)

    return init


class DropPath(nn.Module):
    """Stochastic depth: drops the whole residual branch per sample
    (reference uses timm DropPath, dual_segformer.py:154)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class TorchBatchNorm(nn.Module):
    """BatchNorm over the trailing channel axis with torch-EXACT semantics.

    flax nn.BatchNorm updates the running variance with the BIASED batch
    variance; torch.nn.BatchNorm2d uses the UNBIASED one (factor N/(N-1),
    N = elements reduced per channel). At production resolutions the factor is
    negligible (N >= 2400 on MFNet crops), but it is a real semantic deviation
    — the 20-step optimizer-trajectory golden (tests/test_convergence.py)
    caught it at its tiny 32x32 geometry, where stage-4 maps are 1x1 and the
    factor is 2x. Everything else matches flax: fp32 statistics,
    E[x^2]-E[x]^2 fast variance, biased variance for the in-batch
    normalization, variable names {mean, var} in `batch_stats` and params
    {scale, bias}.

    `momentum` follows the torch convention
    (new = (1 - momentum) * old + momentum * batch).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            # Under a jitted step with the batch sharded on the mesh 'data'
            # axis these reductions are global (XLA inserts the cross-chip
            # collectives) — matches the reference's SyncBatchNorm under DDP
            # (reference train.py:64-65) with no explicit plumbing.
            mean = jnp.mean(xf, red)
            var = jnp.mean(jnp.square(xf), red) - jnp.square(mean)
            n = 1
            for d in red:
                n *= x.shape[d]
            if not self.is_initializing():
                m = self.momentum
                correction = n / max(n - 1, 1)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = ((1.0 - m) * ra_var.value
                                + m * var * correction)
        y = ((x.astype(jnp.float32) - mean)
             * jax.lax.rsqrt(var + self.epsilon) * scale + bias)
        out_dtype = self.dtype if self.dtype is not None else x.dtype
        return y.astype(out_dtype)


def batch_norm(momentum: float = 0.1, epsilon: float = 1e-5, dtype=None,
               name=None) -> "TorchBatchNorm":
    """BatchNorm over NHWC maps with torch semantics (see TorchBatchNorm;
    torch BatchNorm2d default eps is 1e-5).

    The `use_running_average` flag is threaded by the caller at __call__ time.
    """
    return TorchBatchNorm(momentum=momentum, epsilon=epsilon, dtype=dtype,
                          name=name)


def layer_norm(epsilon: float = 1e-5, dtype=None, name=None) -> nn.LayerNorm:
    """LayerNorm over the trailing channel axis; torch default eps 1e-5, the MiT
    encoders use eps 1e-6 (reference dual_segformer.py:487)."""
    return nn.LayerNorm(epsilon=epsilon, dtype=dtype, name=name)


def dense(features: int, use_bias: bool = True, dtype=None, name=None) -> nn.Dense:
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    kernel_init=trunc_normal_init,
                    bias_init=nn.initializers.zeros, name=name)


def conv(features: int, kernel_size, stride=1, padding="SAME", groups: int = 1,
         use_bias: bool = True, dtype=None, name=None) -> nn.Conv:
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(stride, int):
        stride = (stride, stride)
    return nn.Conv(features, kernel_size, strides=stride, padding=padding,
                   feature_group_count=groups, use_bias=use_bias, dtype=dtype,
                   kernel_init=conv_kaiming_init(groups),
                   bias_init=nn.initializers.zeros, name=name)


def torch_conv_padding(kernel_size: int, stride: int = 1) -> Sequence:
    """Explicit padding equal to torch's padding=k//2 convention."""
    p = kernel_size // 2
    return ((p, p), (p, p))


def tokens_to_map(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, N, C) -> (B, H, W, C)."""
    B, N, C = x.shape
    return x.reshape(B, H, W, C)


def map_to_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, C)."""
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)
