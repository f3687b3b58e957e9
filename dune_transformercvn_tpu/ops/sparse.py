"""Sparse-grid engine: MinkowskiEngine semantics on TPU via occupancy masking.

The reference's ``--sparse`` path runs generalized sparse convolutions over
2-D COO hit lists through MinkowskiEngine's C++/CUDA coordinate manager
(sparse_layers.py:8-138).  The TPU-native re-design rests on one observation:
on a *fixed regular grid* (3x400x280 pixel maps), every MinkowskiEngine op
the reference uses is exactly representable as a dense op plus an occupancy
mask:

* **Convolution** (bias-free, ``expand_coordinates=True``): unoccupied input
  sites hold zero features, so a dense conv already computes the sparse
  result at every site; the output coordinate set is the kernel-dilation of
  the input occupancy, and sites outside it naturally hold zeros.
* **BatchNorm**: ME normalizes over the N occupied points -> our
  MaskedBatchNorm with the per-site occupancy as the weight.
* **AvgPooling**: ME divides by the number of occupied inputs per window ->
  sum-pool of features / sum-pool of occupancy.
* **GlobalAvgPooling / SparseCondense**: per-image masked mean.
* **PReLU / GELU / dropout**: zero-preserving elementwise, nothing to do.
* **Identity-kernel skip convolution** (sparse_dense_net.py:59-68, which ME
  needs to align coordinate sets before concat): a literal no-op here —
  the dense feature array already carries zeros at expanded sites.

This is numerically exact w.r.t. ME (same adjacency, same normalization)
while keeping all FLOPs on the MXU: at these image sizes and with occupancy
dilating toward saturation inside the dense blocks, gather/scatter kernels
would underperform dense convolution on TPU.  A genuine COO gather/scatter
convolution (with a native C++ coordinate-map builder) lives in
ops/coo_conv.py for the low-occupancy regime and for parity testing.

Kernel alignment follows ME conventions: odd kernels are centered
(offsets -k//2..k//2), even kernels anchor at the site (offsets 0..k-1);
stride-s output site o sits at input coordinate o*s.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class SparseGrid:
    """Dense NHWC features + boolean occupancy over the same grid."""

    features: jnp.ndarray   # [N, H, W, C]
    occupancy: jnp.ndarray  # [N, H, W] bool

    @property
    def shape(self):
        return self.features.shape


def from_coo(
    xy: jnp.ndarray, values: jnp.ndarray, owner: jnp.ndarray,
    num_images: int, height: int, width: int,
) -> SparseGrid:
    """Build a SparseGrid from padded COO banks (drop-mode padding)."""
    # push negative indices past the bounds: ``mode="drop"`` alone would
    # numpy-wrap them to valid pixels instead of dropping (see ops/scatter.py)
    oob = jnp.int32(max(num_images, height, width))
    owner, x, y = (
        jnp.where(idx < 0, oob, idx) for idx in (owner, xy[:, 0], xy[:, 1])
    )
    features = jnp.zeros((num_images, height, width, values.shape[-1]), values.dtype)
    features = features.at[owner, x, y].add(values, mode="drop")
    occupancy = jnp.zeros((num_images, height, width), bool)
    occupancy = occupancy.at[owner, x, y].set(True, mode="drop")
    return SparseGrid(features, occupancy)


def _padding(kernel: int) -> Tuple[int, int]:
    if kernel % 2 == 1:
        return (kernel // 2, kernel // 2)
    return (0, kernel - 1)  # even kernels anchor at the output site


def _dilate_occupancy(occupancy: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """Output occupancy = sites reachable from any occupied input."""
    counts = jax.lax.reduce_window(
        occupancy.astype(jnp.float32),
        0.0, jax.lax.add,
        window_dimensions=(1, kernel, kernel),
        window_strides=(1, stride, stride),
        padding=((0, 0), _padding(kernel), _padding(kernel)),
    )
    return counts > 0


def _window_counts(occupancy: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        occupancy.astype(jnp.float32),
        0.0, jax.lax.add,
        window_dimensions=(1, kernel, kernel),
        window_strides=(1, stride, stride),
        padding=((0, 0), _padding(kernel), _padding(kernel)),
    )


def _stride_map_occupancy(occupancy: jnp.ndarray, stride: int) -> jnp.ndarray:
    """ME's floor-division coordinate map: output coords = input coords
    snapped DOWN to the stride grid — an output site is occupied iff ANY
    input in its stride x stride cell is, not only the cell's corner.
    Identity at stride 1 (the coordinate map is unchanged)."""
    if stride == 1:
        return occupancy
    _, h, w = occupancy.shape
    counts = jax.lax.reduce_window(
        occupancy.astype(jnp.float32),
        0.0, jax.lax.add,
        window_dimensions=(1, stride, stride),
        window_strides=(1, stride, stride),
        padding=((0, 0), (0, -h % stride), (0, -w % stride)),
    )
    return counts > 0


def sparse_conv(
    grid: SparseGrid,
    kernel_weights: jnp.ndarray,   # [k, k, C_in / groups, C_out]
    stride: int = 1,
    expand_coordinates: bool = True,
    feature_group_count: int = 1,  # C_in for channelwise (ME ChannelwiseConv)
) -> SparseGrid:
    """Generalized sparse convolution (ME MinkowskiConvolution, bias-free)."""
    k = kernel_weights.shape[0]
    pad = _padding(k)
    out = jax.lax.conv_general_dilated(
        grid.features, kernel_weights.astype(grid.features.dtype),
        window_strides=(stride, stride),
        padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    if expand_coordinates:
        occupancy = _dilate_occupancy(grid.occupancy, k, stride)
    else:
        occupancy = _stride_map_occupancy(grid.occupancy, stride)
    out = out * occupancy[..., None].astype(out.dtype)
    return SparseGrid(out, occupancy)


def sparse_avg_pool(grid: SparseGrid, kernel: int, stride: int) -> SparseGrid:
    """ME MinkowskiAvgPooling: mean over the *occupied* inputs per window.

    The output coordinate set is ME's stride map of the input coordinates
    (pooling never expands coordinates: sparse_layers.py:115-123 passes no
    ``expand_coordinates``), NOT the set of windows touching an input —
    for ``kernel != stride`` those differ (e.g. the DenseNet stem's 3/2
    pool and FCNN's 2/1 pool)."""
    # init must be a concrete scalar: an abstract (traced) init hides the
    # add-monoid from JAX and breaks reverse-mode autodiff under jit
    sums = jax.lax.reduce_window(
        grid.features, np.zeros((), grid.features.dtype), jax.lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), _padding(kernel), _padding(kernel), (0, 0)),
    )
    counts = _window_counts(grid.occupancy, kernel, stride)
    occupancy = _stride_map_occupancy(grid.occupancy, stride)
    out = sums / jnp.maximum(counts, 1.0).astype(sums.dtype)[..., None]
    out = out * occupancy[..., None].astype(out.dtype)
    return SparseGrid(out, occupancy)


def sparse_global_avg_pool(grid: SparseGrid) -> jnp.ndarray:
    """ME GlobalAvgPooling + SparseCondense: per-image mean over occupied
    sites, ordered by the (leading) batch axis. Returns ``[N, C]``."""
    w = grid.occupancy[..., None].astype(grid.features.dtype)
    total = jnp.sum(grid.features * w, axis=(1, 2))
    count = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1.0)
    return total / count
