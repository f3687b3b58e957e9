"""Test-only torch re-creation of MinkowskiEngine sparse-op semantics.

MinkowskiEngine itself cannot run in this sandbox (no CUDA build), so the
reference's sparse families (/root/reference/transformercvn/network/layers/
sparse_layers.py:8-138) cannot be executed directly.  This module provides an
independently-coded golden target instead — the ``tests/_diffusers_ref.py``
pattern: a from-scratch torch implementation of the documented ME semantics,
operating on explicit COO coordinate lists with per-hit dictionary
accumulation.  It shares **no code path** with the package's two sparse
engines (the occupancy-masked dense engine in ``ops/sparse.py`` and the
gather-matmul-scatter COO engine in ``ops/coo_conv.py``): those use dense XLA
convolutions / precomputed kernel maps, this walks hits one at a time in
Python.  Agreement between three implementations of the same operator is the
strongest ME-parity evidence available in this environment.

Semantics implemented (ME conventions, on the detector's fixed bounded grid):

* ``MinkowskiConvolution`` (bias-free): weight index (jx, jy) of a k x k
  kernel touches input coordinate ``o*s - lo + (jx, jy)`` for output o,
  where ``lo = k//2`` for odd kernels (centered) and ``0`` for even kernels
  (anchored at the site).  ``expand_coordinates=True`` emits every in-bounds
  stride-grid site reachable from an occupied input; ``False`` keeps the
  input coordinate set (stride 1) or ME's floor-division stride map
  (stride > 1).
* ``MinkowskiChannelwiseConvolution``: per-channel scalar taps, same
  coordinate rules.
* ``MinkowskiAvgPooling``: sum over the *occupied* inputs per window divided
  by their count (not the kernel volume).
* ``MinkowskiGlobalAvgPooling`` / ``SparseCondense``: per-image mean over
  occupied sites.

The grid is bounded ([0,H) x [0,W), outputs on [0,ceil(H/s)) x [0,ceil(W/s)))
to match the detector-pixel-map setting the reference uses these ops in.
"""

from __future__ import annotations

import math

import torch


def _as_tuples(coords):
    """[N,3] int array-like -> list of (b, x, y) tuples."""
    return [tuple(int(v) for v in row) for row in coords]


def minkowski_conv(
    coords,                 # [N, 3] int (owner, x, y), unique sites
    feats,                  # [N, C_in] torch tensor
    weight,                 # [k, k, C_in, C_out] torch tensor (HWIO)
    stride: int = 1,
    expand_coordinates: bool = True,
    height: int = None,
    width: int = None,
    channelwise: bool = False,
):
    """Generalized sparse convolution by per-hit dictionary accumulation.

    Returns ``(out_coords, out_feats)`` with out_coords sorted
    lexicographically by (owner, x, y) — a [M,3] int64 tensor and [M,C_out]
    feature tensor.  ``channelwise=True`` interprets ``weight`` as
    ``[k, k, C]`` per-channel taps (ME ChannelwiseConvolution).
    """
    k = weight.shape[0]
    lo = k // 2 if k % 2 == 1 else 0
    h_out = math.ceil(height / stride)
    w_out = math.ceil(width / stride)

    acc: dict = {}
    for (b, x, y), f in zip(_as_tuples(coords), feats):
        for jx in range(k):
            for jy in range(k):
                # input (x, y) feeds output input-coordinate (x+lo-jx, y+lo-jy)
                ox, oy = x + lo - jx, y + lo - jy
                if not (0 <= ox < height and 0 <= oy < width):
                    continue
                if ox % stride or oy % stride:
                    continue
                key = (b, ox // stride, oy // stride)
                tap = weight[jx, jy]
                contrib = f * tap if channelwise else f @ tap
                if key in acc:
                    acc[key] = acc[key] + contrib
                else:
                    acc[key] = contrib

    if expand_coordinates:
        keep = set(acc)
    elif stride == 1:
        keep = set(_as_tuples(coords))
    else:
        keep = {(b, x // stride, y // stride) for b, x, y in _as_tuples(coords)}

    c_out = weight.shape[-1]
    out = sorted(keep)
    feats_out = torch.stack(
        [acc.get(key, feats.new_zeros(c_out)) for key in out]
    ) if out else feats.new_zeros((0, c_out))
    out_coords = torch.tensor(out, dtype=torch.int64).reshape(-1, 3)
    assert (out_coords[:, 1] < h_out).all() and (out_coords[:, 2] < w_out).all()
    return out_coords, feats_out


def minkowski_avg_pool(coords, feats, kernel: int, stride: int,
                       height: int, width: int):
    """ME AvgPooling: per-window mean over occupied inputs.

    The output coordinate set is ME's floor-division stride map of the
    input coordinates (pooling never expands coordinates) — identical to
    the input set at stride 1.
    """
    lo = kernel // 2 if kernel % 2 == 1 else 0
    sums: dict = {}
    counts: dict = {}
    for (b, x, y), f in zip(_as_tuples(coords), feats):
        for jx in range(kernel):
            for jy in range(kernel):
                ox, oy = x + lo - jx, y + lo - jy
                if not (0 <= ox < height and 0 <= oy < width):
                    continue
                if ox % stride or oy % stride:
                    continue
                key = (b, ox // stride, oy // stride)
                sums[key] = sums.get(key, 0.0) + f
                counts[key] = counts.get(key, 0) + 1
    keep = {(b, x // stride, y // stride) for b, x, y in _as_tuples(coords)}
    out = sorted(keep)
    c = feats.shape[-1]
    feats_out = torch.stack(
        [sums[key] / counts[key] if key in sums else feats.new_zeros(c)
         for key in out]
    )
    return torch.tensor(out, dtype=torch.int64).reshape(-1, 3), feats_out


def minkowski_global_avg_pool(coords, feats, num_images: int):
    """ME GlobalAvgPooling / SparseCondense: per-image mean. [N_img, C]."""
    c = feats.shape[-1]
    out = feats.new_zeros((num_images, c))
    n = feats.new_zeros((num_images, 1))
    for (b, _, _), f in zip(_as_tuples(coords), feats):
        out[b] += f
        n[b] += 1
    return out / n.clamp(min=1)


# ---- per-point layer helpers (module-composition goldens) -----------------
# ME wraps plain torch layers over the sparse tensor's point-row matrix
# (sparse_layers.py:57-105: MinkowskiBatchNorm == BatchNorm1d over rows,
# SparseLayerNorm == LayerNorm over rows, activations elementwise), so the
# re-creation applies the identical torch math to the [M, C] feature rows.


def align_features(src_coords, src_feats, dst_coords):
    """Features of ``src`` re-indexed onto ``dst_coords`` (zeros where a
    destination coordinate has no source row) — ME's aligned concat/residual
    after a coordinate-expanding convolution."""
    table = {key: f for key, f in zip(_as_tuples(src_coords), src_feats)}
    c = src_feats.shape[-1]
    rows = [table.get(key, src_feats.new_zeros(c))
            for key in _as_tuples(dst_coords)]
    return (torch.stack(rows) if rows
            else src_feats.new_zeros((0, c)))


def batch_norm_rows(feats, scale, bias, mean, var, eps=1e-5, train=False):
    """torch BatchNorm1d semantics over point rows: eval uses the running
    stats verbatim; train normalizes by the biased batch variance."""
    if train:
        mean = feats.mean(0)
        var = feats.var(0, unbiased=False)
    y = (feats - mean) / torch.sqrt(var + eps)
    return y * scale + bias


def prelu_rows(feats, alpha):
    return torch.clamp(feats, min=0) + alpha * torch.clamp(feats, max=0)


def layer_norm_rows(feats, scale, bias, eps=1e-6):
    return torch.nn.functional.layer_norm(
        feats, feats.shape[-1:], weight=scale, bias=bias, eps=eps
    )
