"""Sparse ConvNeXt pixel embedder (the 'convnext' family).

Capability variant documented by the reference's SparseConvNeXt
(layers/sparse_convnext.py:23-158, wired-but-commented in
neutrino_full_sparse_network.py:20-28): 4x4/4 patchify, stages of
ConvNeXt blocks — depthwise (channelwise) convolution, LayerNorm on
features, pointwise 4x expand / contract MLP with GELU, learned layer-scale
gamma, stochastic depth — and LayerNorm + 2x2/2 conv downsampling between
stages.  Built on the occupancy-masked sparse-grid engine; LayerNorm and the
MLP biases break the zeros at unoccupied sites, so every block re-masks
(the ME original only ever materializes occupied rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import MaskedBatchNorm, PReLU
from ..ops.sparse import SparseGrid, sparse_global_avg_pool
from .sparse_densenet import SparseConv


def _remask(features: jnp.ndarray, occupancy: jnp.ndarray) -> jnp.ndarray:
    return features * occupancy[..., None].astype(features.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference sparse_layers.py:141-177)."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return x * mask.astype(x.dtype) / keep


class ConvNeXtBlock(nn.Module):
    kernel: int = 5
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, grid: SparseGrid, train: bool = False) -> SparseGrid:
        c = grid.features.shape[-1]
        h = SparseConv(c, kernel=self.kernel, depthwise=True, dtype=self.dtype)(grid)
        occ = h.occupancy

        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32)(
            h.features
        )
        x = nn.Dense(4 * c, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(x)
        gamma = self.param(
            "layer_scale", lambda _: jnp.full((c,), self.layer_scale_init, jnp.float32)
        )
        x = x * gamma.astype(x.dtype)
        x = _remask(x, occ)
        x = DropPath(self.drop_path)(x, train)

        # residual: input features are zero at newly expanded sites (the ME
        # identity-kernel skip, sparse_convnext.py pattern), so plain add
        # under the expanded occupancy is exact.
        return SparseGrid(grid.features + x, occ)


class SparseConvNeXt(nn.Module):
    """Embedder: NHWC images -> [N, output_dim]."""

    output_dim: int
    kernel: int = 5
    hidden_features: Sequence[int] = (32, 64, 128, 256)
    hidden_depths: Sequence[int] = (1, 1, 1, 1)
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, mask=None, train: bool = False):
        occupancy = jnp.any(images != 0, axis=-1)
        if mask is not None:
            # packed-out rows don't exist in ME's sparse tensor; folding the
            # row mask into the occupancy reproduces that exactly (padded
            # slots otherwise rely on their images being all-zero)
            occupancy = occupancy & mask[:, None, None]
        grid = SparseGrid(images.astype(self.dtype), occupancy)

        # patchify stem: 4x4 stride-4 conv + LN
        grid = SparseConv(self.hidden_features[0], kernel=4, stride=4,
                          dtype=self.dtype)(grid)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32)(
            grid.features
        )
        grid = SparseGrid(_remask(x, grid.occupancy), grid.occupancy)

        # torch.linspace(0, rate, total) endpoints: denominator total-1, so
        # the deepest block trains at exactly drop_path_rate
        # (reference sparse_convnext.py:127)
        total_blocks = max(sum(self.hidden_depths) - 1, 1)
        block_index = 0
        for stage, (width, depth) in enumerate(
            zip(self.hidden_features, self.hidden_depths)
        ):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=jnp.float32)(grid.features)
                grid = SparseGrid(_remask(x, grid.occupancy), grid.occupancy)
                grid = SparseConv(width, kernel=2, stride=2, dtype=self.dtype)(grid)
            for _ in range(depth):
                rate = self.drop_path_rate * block_index / total_blocks
                grid = ConvNeXtBlock(
                    kernel=self.kernel, drop_path=rate,
                    layer_scale_init=self.layer_scale_init, dtype=self.dtype,
                )(grid, train)
                block_index += 1

        condensed = sparse_global_avg_pool(grid)
        condensed = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 param_dtype=jnp.float32)(condensed)

        x = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(condensed)
        x = MaskedBatchNorm(self.output_dim, axis_name=self.axis_name)(
            x, mask=mask, use_running_average=not train
        )
        x = PReLU(self.output_dim)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x
