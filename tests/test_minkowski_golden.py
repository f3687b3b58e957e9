"""Golden cross-check of the sparse engines vs an independent ME re-creation.

MinkowskiEngine cannot run in this sandbox, so `tests/_minkowski_ref.py`
re-creates its documented semantics from scratch in torch (per-hit dictionary
accumulation — no shared code with the package).  These tests assert that,
for random sparse inputs, BOTH package engines — the occupancy-masked dense
engine (`ops/sparse.py`, dense XLA convs) and the gather-matmul-scatter COO
engine (`ops/coo_conv.py`, precomputed kernel maps) — produce exactly the
re-creation's output coordinate set and matching features, across the kernel
/ stride / expand_coordinates / channelwise configurations the model families
use (reference usage: sparse_dense_net.py:20-203, sparse_convnext.py:96-158,
sparse_cnn.py).

Three algorithmically independent implementations agreeing on coordinates
and values is the strongest ME-parity evidence available without ME itself.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dune_transformercvn_tpu.ops.coo_conv import (
    build_conv_maps_numpy,
    coo_conv_apply,
)
from dune_transformercvn_tpu.ops.sparse import (
    from_coo,
    sparse_avg_pool,
    sparse_conv,
    sparse_global_avg_pool,
)

from _minkowski_ref import (  # noqa: E402  (same-dir test helper)
    minkowski_avg_pool,
    minkowski_conv,
    minkowski_global_avg_pool,
)

N_IMG, H, W, C_IN = 2, 13, 11, 3


def _random_sparse(seed, n_hits=24):
    """Unique (owner, x, y) coords + normal features."""
    rng = np.random.default_rng(seed)
    flat = rng.choice(N_IMG * H * W, size=n_hits, replace=False)
    coords = np.stack(
        [flat // (H * W), (flat // W) % H, flat % W], axis=1
    ).astype(np.int64)
    # lexicographic order by (owner, x, y) to match the engines' outputs
    coords = coords[np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))]
    feats = rng.normal(size=(n_hits, C_IN)).astype(np.float32)
    return coords, feats


def _grid_to_coo(features, occupancy):
    """Dense-engine output -> sorted (coords, feats at occupied sites)."""
    occ = np.asarray(occupancy)
    coords = np.argwhere(occ)  # already lexicographic
    feats = np.asarray(features)[occ]
    return coords, feats


# (kernel, stride, expand_coordinates, channelwise) — every configuration a
# model family uses: DenseNet stem 7/2, dense blocks 3/1, transitions 2/2,
# ConvNeXt patchify 4/4 + downsample 2/2 + depthwise 5/1, FCNN strided 3/2,
# plus the no-expand coordinate maps (stride snap) the wrappers expose.
CONFIGS = [
    (3, 1, True, False),
    (7, 2, True, False),
    (4, 4, True, False),
    (2, 2, True, False),
    (5, 1, True, True),
    (3, 2, True, True),
    (3, 1, False, False),
    (3, 2, False, False),
]


@pytest.mark.parametrize("kernel,stride,expand,channelwise", CONFIGS)
def test_dense_engine_matches_me_recreation(kernel, stride, expand, channelwise):
    coords, feats = _random_sparse(seed=kernel * 10 + stride)
    rng = np.random.default_rng(99)
    c_out = C_IN if channelwise else 5
    if channelwise:
        w_ref = rng.normal(size=(kernel, kernel, C_IN)).astype(np.float32)
        w_dense = w_ref[:, :, None, :]  # [k,k,1,C] with feature_group_count=C
    else:
        w_ref = rng.normal(size=(kernel, kernel, C_IN, c_out)).astype(np.float32)
        w_dense = w_ref

    want_coords, want_feats = minkowski_conv(
        coords, torch.from_numpy(feats), torch.from_numpy(w_ref),
        stride=stride, expand_coordinates=expand, height=H, width=W,
        channelwise=channelwise,
    )

    @jax.jit
    def run(xy, values, owner, weights):
        grid = from_coo(xy, values, owner, N_IMG, H, W)
        out = sparse_conv(
            grid, weights, stride=stride, expand_coordinates=expand,
            feature_group_count=C_IN if channelwise else 1,
        )
        return out.features, out.occupancy

    features, occupancy = run(
        jnp.asarray(coords[:, 1:]), jnp.asarray(feats),
        jnp.asarray(coords[:, 0]), jnp.asarray(w_dense),
    )
    got_coords, got_feats = _grid_to_coo(features, occupancy)

    np.testing.assert_array_equal(got_coords, want_coords.numpy())
    np.testing.assert_allclose(
        got_feats, want_feats.numpy(), rtol=1e-4, atol=1e-5
    )
    # everything outside the coordinate set is exactly zero
    dense = np.array(features)  # writable copy
    dense[tuple(got_coords.T)] = 0.0
    np.testing.assert_array_equal(dense, np.zeros_like(dense))


@pytest.mark.parametrize(
    "kernel,stride",
    [(3, 1), (7, 2), (4, 4), (2, 2)],
)
def test_coo_engine_matches_me_recreation(kernel, stride):
    coords, feats = _random_sparse(seed=kernel * 100 + stride)
    rng = np.random.default_rng(7)
    w = rng.normal(size=(kernel, kernel, C_IN, 5)).astype(np.float32)

    want_coords, want_feats = minkowski_conv(
        coords, torch.from_numpy(feats), torch.from_numpy(w),
        stride=stride, expand_coordinates=True, height=H, width=W,
    )

    maps = build_conv_maps_numpy(coords, kernel, stride, H, W)
    got = jax.jit(coo_conv_apply, static_argnames="num_out")(
        jnp.asarray(feats), jnp.asarray(w),
        jnp.asarray(maps.in_maps), jnp.asarray(maps.out_maps),
        num_out=maps.num_out,
    )

    order = np.lexsort(
        (maps.out_coords[:, 2], maps.out_coords[:, 1], maps.out_coords[:, 0])
    )
    np.testing.assert_array_equal(
        maps.out_coords[order], want_coords.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(got)[order], want_feats.numpy(), rtol=1e-4, atol=1e-5
    )


# every pooling config a model family uses: DenseNet transitions 2/2,
# DenseNet stem 3/2, FCNN stage smoothing 2/1 — the latter two have
# coordinate maps (ME's stride map) that differ from the window map
@pytest.mark.parametrize("kernel,stride", [(2, 2), (3, 2), (2, 1)])
def test_avg_pool_matches_me_recreation(kernel, stride):
    coords, feats = _random_sparse(seed=3)
    want_coords, want_feats = minkowski_avg_pool(
        coords, torch.from_numpy(feats.astype(np.float64)),
        kernel=kernel, stride=stride, height=H, width=W,
    )

    @jax.jit
    def run(xy, values, owner):
        grid = from_coo(xy, values, owner, N_IMG, H, W)
        out = sparse_avg_pool(grid, kernel=kernel, stride=stride)
        return out.features, out.occupancy

    features, occupancy = run(
        jnp.asarray(coords[:, 1:]), jnp.asarray(feats),
        jnp.asarray(coords[:, 0]),
    )
    got_coords, got_feats = _grid_to_coo(features, occupancy)
    np.testing.assert_array_equal(got_coords, want_coords.numpy())
    np.testing.assert_allclose(
        got_feats, want_feats.numpy(), rtol=1e-5, atol=1e-6
    )


def test_global_pool_matches_me_recreation():
    coords, feats = _random_sparse(seed=4)
    want = minkowski_global_avg_pool(
        coords, torch.from_numpy(feats.astype(np.float64)), N_IMG
    )

    @jax.jit
    def run(xy, values, owner):
        return sparse_global_avg_pool(from_coo(xy, values, owner, N_IMG, H, W))

    got = run(
        jnp.asarray(coords[:, 1:]), jnp.asarray(feats),
        jnp.asarray(coords[:, 0]),
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6
    )
