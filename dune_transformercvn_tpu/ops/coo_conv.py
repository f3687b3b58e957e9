"""True COO gather/scatter sparse convolution with host-built kernel maps.

This is the literal MinkowskiEngine execution strategy (coordinate manager +
per-offset in/out maps + gather-matmul-scatter), provided for the genuinely
low-occupancy regime (e.g. a sparse stem over ~10^2-10^3 hits of 112k pixels)
and as an independent cross-check of the occupancy-masked dense engine in
ops/sparse.py — the two must agree exactly on the same weights.

Host side (:func:`build_conv_maps`): enumerate the expanded output
coordinate set and, for each of the k*k kernel offsets, the (input row,
output row) pairs it connects — ME's "kernel map".  The builder prefers the
native C++ engine (native/coo_engine.cpp via ctypes, ~30x faster than
numpy's dictionary hashing) and falls back to a pure-numpy implementation.
Maps are padded to static bucket sizes.

Device side (:func:`coo_conv_apply`): one jitted loop over kernel offsets —
``out[out_map[j]] += in[in_map[j]] @ W[j]`` with drop-mode padding; each
offset is a single [pairs, C_in] x [C_in, C_out] matmul on the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ConvMaps(NamedTuple):
    out_coords: np.ndarray   # [M, 3] (owner, x, y) of output sites
    num_out: int             # real output sites (rest is padding)
    in_maps: np.ndarray      # [k*k, L] input row per pair (pad: N_in)
    out_maps: np.ndarray     # [k*k, L] output row per pair (pad: M)


def _pack_key(owner: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    # grids are 400x280; 2^20 per axis is comfortably collision-free
    return (owner.astype(np.int64) << 40) | (x.astype(np.int64) << 20) | y.astype(np.int64)


def build_conv_maps_numpy(
    coords: np.ndarray,   # [N, 3] int (owner, x, y), unique sites
    kernel: int,
    stride: int,
    height: int,
    width: int,
    pad_to: int = 0,
) -> ConvMaps:
    """Numpy fallback kernel-map builder (ME coordinate-manager equivalent)."""
    owner, x, y = coords[:, 0], coords[:, 1], coords[:, 2]
    # Dense-engine correspondence: out[o] = sum_j in[o*s - lo + j] W[j]
    # with lo = k//2 (odd kernels, centered) or 0 (even kernels), so input i
    # feeds output i + lo - j through weight index j.
    lo = kernel // 2 if kernel % 2 == 1 else 0

    # --- output coordinate set: kernel-dilation of the input, stride-snapped
    cand_owner, cand_x, cand_y, cand_in, cand_off = [], [], [], [], []
    in_rows = np.arange(len(coords))
    for j in range(kernel * kernel):
        dx, dy = lo - j // kernel, lo - j % kernel
        ox, oy = x + dx, y + dy
        valid = (ox >= 0) & (ox < height) & (oy >= 0) & (oy < width)
        if stride > 1:
            valid &= (ox % stride == 0) & (oy % stride == 0)
        cand_owner.append(owner[valid])
        cand_x.append(ox[valid])
        cand_y.append(oy[valid])
        cand_in.append(in_rows[valid])
        cand_off.append(np.full(valid.sum(), j, np.int64))

    all_owner = np.concatenate(cand_owner)
    all_x = np.concatenate(cand_x)
    all_y = np.concatenate(cand_y)
    all_in = np.concatenate(cand_in)
    all_off = np.concatenate(cand_off)

    keys = _pack_key(all_owner, all_x, all_y)
    unique_keys, inverse = np.unique(keys, return_inverse=True)
    num_out = len(unique_keys)
    out_coords = np.stack(
        [unique_keys >> 40, (unique_keys >> 20) & 0xFFFFF, unique_keys & 0xFFFFF],
        axis=1,
    ).astype(np.int64)
    if stride > 1:
        out_coords[:, 1] //= stride
        out_coords[:, 2] //= stride

    # --- per-offset pair lists, padded to a common static length.
    # Padding out_map entries use max(num_out, pad_to): out of bounds (and
    # so dropped by mode="drop") whether the caller allocates num_out rows
    # or a pad_to-row static output.
    pair_counts = np.bincount(all_off, minlength=kernel * kernel)
    L = int(pair_counts.max()) if len(all_off) else 1
    if pad_to:
        L = max(L, pad_to)
    out_pad = max(num_out, pad_to)
    in_maps = np.full((kernel * kernel, L), len(coords), np.int32)
    out_maps = np.full((kernel * kernel, L), out_pad, np.int32)
    for j in range(kernel * kernel):
        sel = all_off == j
        n = int(sel.sum())
        in_maps[j, :n] = all_in[sel]
        out_maps[j, :n] = inverse[sel]

    return ConvMaps(out_coords, num_out, in_maps, out_maps)


def build_conv_maps(coords, kernel, stride, height, width, pad_to=0) -> ConvMaps:
    """Kernel-map builder: native C++ engine when available, numpy otherwise."""
    try:
        from ..utils.native import native_build_conv_maps

        result = native_build_conv_maps(coords, kernel, stride, height, width, pad_to)
        if result is not None:
            return ConvMaps(*result)
    except ImportError:
        pass
    return build_conv_maps_numpy(coords, kernel, stride, height, width, pad_to)


def coo_conv_apply(
    features: jnp.ndarray,        # [N, C_in] (row N used as gather pad target)
    kernel_weights: jnp.ndarray,  # [k, k, C_in, C_out]
    in_maps: jnp.ndarray,         # [k*k, L]
    out_maps: jnp.ndarray,        # [k*k, L]
    num_out: int,
) -> jnp.ndarray:
    """Gather-matmul-scatter over kernel offsets; returns [num_out, C_out]."""
    k = kernel_weights.shape[0]
    c_out = kernel_weights.shape[-1]
    w = kernel_weights.reshape(k * k, kernel_weights.shape[2], c_out)

    # pad row of zeros so padded in_map entries gather zeros
    padded = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0
    )

    def body(j, out):
        gathered = padded[jnp.clip(in_maps[j], 0, padded.shape[0] - 1)]
        contrib = gathered @ w[j].astype(gathered.dtype)
        return out.at[out_maps[j]].add(contrib, mode="drop")

    out = jnp.zeros((num_out, c_out), features.dtype)
    return jax.lax.fori_loop(0, k * k, body, out)


def coo_stem_conv(
    xy: jnp.ndarray,              # [N, 2] int hit coordinates (pad rows: any)
    values: jnp.ndarray,          # [N, C_in] preprocessed hit features
    owner: jnp.ndarray,           # [N] owning image row (pad rows: >= batch)
    kernel_weights: jnp.ndarray,  # [k, k, C_in, C_out] (HWIO, flax layout)
    bias: jnp.ndarray,            # [C_out]
    batch: int,
    height: int,
    width: int,
    stride: int = 2,
    padding: int = 3,
    starts: jnp.ndarray = None,   # [batch+1] CSR offsets (owner-sorted bank)
) -> jnp.ndarray:
    """Sparse-input strided convolution straight into a dense grid.

    When the batcher's owner-sorted CSR ``starts`` are provided and the
    geometry matches, the scatter runs through the Pallas per-image kernel
    (``ops.pallas_coo_stem`` — ~3x over the XLA scatter, flipping the
    dense-vs-COO crossover at production stem occupancy); otherwise the XLA
    drop-mode scatter below.  Both paths are bit-identical.

    The TPU-native form of MinkowskiEngine's gather-matmul-scatter for the
    *stem* case (sparse_dense_net.py:39-44: ``MinkowskiConvolution(k=7, s=2)``
    on raw hits), where the consumer is the dense block stack: instead of
    building per-offset kernel maps on the host, every (hit, kernel offset)
    pair's output pixel is pure index arithmetic, so the whole conv is

    * ONE ``[N, C_in] x [C_in, k*k*C_out]`` matmul (all offsets at once — a
      single well-shaped MXU op instead of k*k skinny ones), then
    * ONE scatter-add of the ``[N * k*k, C_out]`` contributions into the
      zero-initialised ``[batch, H_out, W_out, C_out]`` grid, with
      out-of-range pairs (image border, stride misses, COO padding rows'
      out-of-range owners) dropped by ``mode="drop"``.

    Because convolution is linear in its input, this equals dense
    ``conv(scatter_add(hits))`` exactly — FLOPs scale with *hits* instead of
    pixels (~8k hit-rows vs ~450k output sites per production batch).
    Accumulation is fp32 (matches the MXU's dense-conv accumulate; bf16
    scatter would round per contribution).
    """
    k = kernel_weights.shape[0]
    c_in, c_out = kernel_weights.shape[2], kernel_weights.shape[3]
    n = xy.shape[0]
    out_h = (height + 2 * padding - k) // stride + 1
    out_w = (width + 2 * padding - k) // stride + 1

    if starts is not None:
        from .pallas_coo_stem import coo_stem_conv_pallas, supports_pallas_coo_stem

        if supports_pallas_coo_stem(
            n, c_in, c_out, height, width, stride, padding, k
        ):
            return coo_stem_conv_pallas(
                xy, values, starts, kernel_weights, bias, batch, height, width
            )

    # [C_in, k*k*C_out]: one matmul computes every offset's contribution.
    w = kernel_weights.astype(values.dtype).transpose(2, 0, 1, 3).reshape(
        c_in, k * k * c_out
    )
    contrib = jnp.dot(values, w, preferred_element_type=jnp.float32)
    contrib = contrib.reshape(n * k * k, c_out)

    # Output pixel of (hit, offset): out = (coord + padding - offset) / stride.
    offs = jnp.arange(k)
    num_x = xy[:, 0:1] + padding - offs[None, :]            # [N, k]
    num_y = xy[:, 1:2] + padding - offs[None, :]
    ox, oy = num_x // stride, num_y // stride
    valid_x = (num_x % stride == 0) & (ox >= 0) & (ox < out_h)
    valid_y = (num_y % stride == 0) & (oy >= 0) & (oy < out_w)

    base = owner.astype(jnp.int32) * (out_h * out_w)        # [N]
    idx = (
        base[:, None, None]
        + ox[:, :, None].astype(jnp.int32) * out_w
        + oy[:, None, :].astype(jnp.int32)
    )                                                        # [N, k, k]
    # Input coordinates must themselves be in range: the dense path's densify
    # drops out-of-grid hits before the conv (drop-mode scatter), so a
    # malformed hit with x >= height must not contribute here either.
    in_grid = (
        (xy[:, 0] >= 0) & (xy[:, 0] < height)
        & (xy[:, 1] >= 0) & (xy[:, 1] < width)
    )
    valid = (
        valid_x[:, :, None]
        & valid_y[:, None, :]
        # both bounds: a negative owner would make idx negative, which the
        # drop-mode scatter numpy-wraps into the LAST image (see scatter.py)
        & (owner[:, None, None] >= 0)
        & (owner[:, None, None] < batch)
        & in_grid[:, None, None]
    )
    oob = batch * out_h * out_w
    idx = jnp.where(valid, idx, oob).reshape(n * k * k)

    grid = jnp.zeros((batch * out_h * out_w, c_out), jnp.float32)
    grid = grid.at[idx].add(contrib, mode="drop")
    grid = grid.reshape(batch, out_h, out_w, c_out) + bias.astype(jnp.float32)
    return grid.astype(values.dtype)
