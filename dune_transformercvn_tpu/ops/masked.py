"""Mask-aware primitives: masked batch-norm and per-channel PReLU.

The reference runs its CNNs only over *packed* real prong images and its
linear blocks over packed rows (packed_data.py:60-95), so torch BatchNorm sees
exactly the real samples.  On TPU we keep static shapes — padded slots stay in
the batch — and instead weight the normalization statistics by a per-sample
mask, which is numerically identical to packing (cf. the reference's legacy
masked_batchnorm_0d.py:80-124 which encodes the same semantics).

``MaskedBatchNorm`` optionally reduces its sufficient statistics with a
``lax.psum`` over a named mesh axis (cross-replica sync-BN), keeping the
replicated ``batch_stats`` bit-identical across the data-parallel mesh; the
reference runs unsynced per-GPU BN under DDP (a documented difference,
controlled by ``Options.sync_batch_norm``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch ``nn.PReLU(num_parameters=C)``)."""

    channels: int
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", lambda _: jnp.full((self.channels,), self.init_value, jnp.float32)
        )
        alpha = alpha.astype(x.dtype)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class MaskedBatchNorm(nn.Module):
    """Batch normalization over all-but-channel axes with per-sample weights.

    Matches torch ``BatchNorm1d/2d`` semantics: biased variance for
    normalization, unbiased for the running-stat update, momentum 0.1,
    running stats used verbatim in eval mode.

    Attributes
    ----------
    channels: channel count (last axis).
    axis_name: optional mesh axis for cross-replica statistic reduction.
    """

    channels: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        """``x``: [N, ..., C]; ``mask``: None (all real), [N] per-sample, or
        [N, *spatial] per-site (the sparse-grid occupancy case)."""
        dtype = x.dtype
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.channels,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.channels,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is None:
                count = jnp.asarray(
                    jnp.prod(jnp.asarray(x.shape[:-1])), jnp.float32
                )
                total = jnp.sum(xf, axis=reduce_axes)
                total_sq = jnp.sum(jnp.square(xf), axis=reduce_axes)
            else:
                w = mask.astype(jnp.float32).reshape(
                    mask.shape + (1,) * (x.ndim - mask.ndim)
                )
                # unmasked axes between the mask's and the channel axis
                spatial = 1
                for dim in x.shape[mask.ndim:-1]:
                    spatial *= dim
                count = jnp.sum(w) * spatial
                total = jnp.sum(xf * w, axis=reduce_axes)
                total_sq = jnp.sum(jnp.square(xf) * w, axis=reduce_axes)

            if self.axis_name is not None:
                # one fused psum per BN layer instead of three tiny ones
                packed = jnp.concatenate(
                    [total, total_sq, count.reshape(1)]
                )
                packed = jax.lax.psum(packed, self.axis_name)
                total = packed[: self.channels]
                total_sq = packed[self.channels : 2 * self.channels]
                count = packed[-1]

            raw_count = count
            count = jnp.maximum(count, 1.0)
            mean = total / count
            var = jnp.maximum(total_sq / count - jnp.square(mean), 0.0)

            if not self.is_initializing():
                # skip the momentum update when the mask selected zero
                # samples (fabricated mean=0/var=0 would drag the running
                # stats; the reference packs real rows and never feeds BN
                # an empty batch)
                m = self.momentum * (raw_count > 0)
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
            y = y * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
            y = y + bias
        return y.astype(dtype)
