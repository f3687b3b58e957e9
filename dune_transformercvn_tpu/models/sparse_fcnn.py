"""Multi-scale sparse FCNN embedder (the 'fcnn' family).

Capability variant documented by the reference's MinkowskiFCNN
(layers/sparse_cnn.py:7-158): a sparse CNN whose downsampling stages each
contribute a globally-pooled summary, concatenated into one multi-scale
descriptor (the reference's slice-concat skip connections), followed by the
shared linear output block.  Built on the occupancy-masked sparse-grid
engine, so every stage's statistics and pooling see only occupied sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import MaskedBatchNorm, PReLU
from ..ops.sparse import sparse_avg_pool, sparse_global_avg_pool, SparseGrid
from .sparse_densenet import SparseBatchNormPReLU, SparseConv


class SparseFCNN(nn.Module):
    """Embedder: NHWC images -> [N, output_dim]."""

    output_dim: int
    initial_features: int = 32
    stage_features: Sequence[int] = (32, 64, 128, 256)
    kernel: int = 3
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

        # stem: 5x5 conv + BN + PReLU
        grid = SparseConv(self.initial_features, kernel=5, dtype=self.dtype)(grid)
        grid = SparseBatchNormPReLU(self.initial_features, self.dtype,
                                    self.axis_name)(grid, train)

        # downsampling stages; each contributes a global-pooled summary
        # (the multi-scale slice-concat skip pattern)
        summaries = [sparse_global_avg_pool(grid)]
        for width in self.stage_features:
            grid = SparseConv(width, kernel=self.kernel, stride=2,
                              dtype=self.dtype)(grid)
            grid = SparseBatchNormPReLU(width, self.dtype, self.axis_name)(
                grid, train
            )
            grid = sparse_avg_pool(grid, kernel=2, stride=1)
            summaries.append(sparse_global_avg_pool(grid))

        multi_scale = jnp.concatenate(summaries, axis=-1)

        x = nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32)(multi_scale)
        x = MaskedBatchNorm(self.output_dim, axis_name=self.axis_name)(
            x, mask=mask, use_running_average=not train
        )
        x = PReLU(self.output_dim)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return x
