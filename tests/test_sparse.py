"""Sparse engine tests: ME-semantics properties, COO-vs-dense cross-checks,
and the full sparse DenseNet forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_transformercvn_tpu.ops.coo_conv import (
    build_conv_maps_numpy,
    coo_conv_apply,
)
from dune_transformercvn_tpu.ops.sparse import (
    SparseGrid,
    from_coo,
    sparse_avg_pool,
    sparse_conv,
    sparse_global_avg_pool,
)


def random_grid(rng, n=2, h=16, w=12, c=3, occupancy=0.1):
    occ = rng.uniform(size=(n, h, w)) < occupancy
    feats = rng.normal(size=(n, h, w, c)).astype(np.float32) * occ[..., None]
    return SparseGrid(jnp.asarray(feats), jnp.asarray(occ))


def test_from_coo_matches_densify():
    xy = jnp.array([[1, 2], [3, 4], [3, 4], [5, 5]], jnp.int32)
    vals = jnp.array([[1.0], [2.0], [3.0], [9.0]])
    owner = jnp.array([0, 1, 1, 2], jnp.int32)  # 2 == padding (num_images=2)
    grid = from_coo(xy, vals, owner, 2, 8, 8)
    assert grid.features[0, 1, 2, 0] == 1.0
    assert grid.features[1, 3, 4, 0] == 5.0
    assert bool(grid.occupancy[0, 1, 2]) and bool(grid.occupancy[1, 3, 4])
    assert int(grid.occupancy.sum()) == 2


def test_sparse_conv_expands_occupancy_and_keeps_zeros():
    rng = np.random.default_rng(0)
    grid = random_grid(rng, occupancy=0.05)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))
    out = jax.jit(lambda g: sparse_conv(g, w))(grid)
    # occupancy is the 3x3 dilation of the input occupancy
    occ_in = np.asarray(grid.occupancy)
    expected = np.zeros_like(occ_in)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            shifted = np.roll(np.roll(occ_in, dx, 1), dy, 2)
            if dx > 0: shifted[:, :dx] = False
            if dx < 0: shifted[:, dx:] = False
            if dy > 0: shifted[:, :, :dy] = False
            if dy < 0: shifted[:, :, dy:] = False
            expected |= shifted
    np.testing.assert_array_equal(np.asarray(out.occupancy), expected)
    # zeros outside the occupancy
    feats = np.asarray(out.features)
    assert np.abs(feats[~expected]).max() == 0.0


def test_sparse_conv_no_expand_snaps_to_stride_grid():
    """expand_coordinates=False with stride s: ME's floor-division coordinate
    map — an output site is occupied iff ANY input in its s x s cell is,
    not only the cell's corner."""
    rng = np.random.default_rng(1)
    grid = random_grid(rng, occupancy=0.0)
    occ = np.asarray(grid.occupancy).copy()
    occ[:] = False
    occ[0, 1, 1] = True          # off-grid input: cell (0, 0)
    occ[0, 2, 5] = True          # on-grid row, off-grid col: cell (1, 2)
    grid = SparseGrid(
        grid.features * 0 + occ[..., None].astype(np.float32), jnp.asarray(occ)
    )
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))
    out = jax.jit(
        lambda g: sparse_conv(g, w, stride=2, expand_coordinates=False)
    )(grid)
    out_occ = np.asarray(out.occupancy)
    assert out_occ[0, 0, 0] and out_occ[0, 1, 2]
    assert out_occ.sum() == 2
    # stride=1: coordinate map unchanged
    out1 = jax.jit(
        lambda g: sparse_conv(g, w, stride=1, expand_coordinates=False)
    )(grid)
    np.testing.assert_array_equal(np.asarray(out1.occupancy), occ)


def test_sparse_avg_pool_counts_only_occupied():
    """ME AvgPooling divides by occupied inputs, not kernel volume."""
    feats = np.zeros((1, 4, 4, 1), np.float32)
    occ = np.zeros((1, 4, 4), bool)
    feats[0, 0, 0, 0] = 2.0; occ[0, 0, 0] = True
    feats[0, 1, 1, 0] = 4.0; occ[0, 1, 1] = True
    grid = SparseGrid(jnp.asarray(feats), jnp.asarray(occ))
    out = jax.jit(lambda g: sparse_avg_pool(g, 2, 2))(grid)
    # window (0:2, 0:2) has two occupied inputs -> mean 3.0 (not 6/4)
    assert float(out.features[0, 0, 0, 0]) == 3.0
    assert int(out.occupancy.sum()) == 1


def test_sparse_global_avg_pool_per_image():
    rng = np.random.default_rng(1)
    grid = random_grid(rng, n=3, occupancy=0.2)
    pooled = jax.jit(sparse_global_avg_pool)(grid)
    feats, occ = np.asarray(grid.features), np.asarray(grid.occupancy)
    for i in range(3):
        if occ[i].sum():
            np.testing.assert_allclose(
                pooled[i], feats[i][occ[i]].mean(0), rtol=1e-5, atol=1e-6
            )


@pytest.mark.parametrize("kernel,stride", [(3, 1), (1, 1), (3, 2), (7, 2), (2, 2)])
def test_coo_conv_matches_dense_engine(kernel, stride):
    """The gather/scatter COO path and the occupancy-masked dense path are
    the same operator — exact agreement on the same weights."""
    rng = np.random.default_rng(2)
    n, h, w, cin, cout = 2, 12, 10, 3, 4
    grid = random_grid(rng, n, h, w, cin, occupancy=0.15)
    weights = jnp.asarray(rng.normal(size=(kernel, kernel, cin, cout)).astype(np.float32))

    dense_out = sparse_conv(grid, weights, stride)

    occ = np.asarray(grid.occupancy)
    coords = np.argwhere(occ)  # [(owner, x, y)]
    feats = np.asarray(grid.features)[occ]  # row order matches argwhere
    maps = build_conv_maps_numpy(coords, kernel, stride, h, w)
    out_rows = np.asarray(
        coo_conv_apply(
            jnp.asarray(feats), weights,
            jnp.asarray(maps.in_maps), jnp.asarray(maps.out_maps), maps.num_out,
        )
    )

    dense_feats = np.asarray(dense_out.features)
    dense_occ = np.asarray(dense_out.occupancy)
    # every COO output row matches the dense value at its coordinate
    for row, (owner, ox, oy) in zip(out_rows[: maps.num_out], maps.out_coords):
        np.testing.assert_allclose(
            row, dense_feats[owner, ox, oy], rtol=1e-5, atol=1e-5
        )
    # and the coordinate sets agree
    coo_occ = np.zeros_like(dense_occ)
    for owner, ox, oy in maps.out_coords[: maps.num_out]:
        coo_occ[owner, ox, oy] = True
    np.testing.assert_array_equal(coo_occ, dense_occ)


def test_sparse_densenet_remat_same_params():
    from dune_transformercvn_tpu.models.sparse_densenet import SparseDenseNet

    rng = np.random.default_rng(5)
    imgs = jnp.asarray(
        (rng.uniform(size=(2, 32, 24, 3)) < 0.1).astype(np.float32) * 0.5
    )
    kwargs = dict(output_dim=8, initial_features=8, growth_rate=4,
                  batch_norm_size=2, block_config=(1, 1))
    plain = SparseDenseNet(**kwargs)
    remat = SparseDenseNet(remat=True, **kwargs)
    v = jax.jit(plain.init)(jax.random.PRNGKey(0), imgs)

    def loss(net, v):
        return jnp.sum(net.apply(v, imgs, mutable=["batch_stats"])[0])

    g1 = jax.jit(jax.grad(lambda v: loss(plain, v)))(v)
    g2 = jax.jit(jax.grad(lambda v: loss(remat, v)))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sparse_chain_differentiable_under_jit():
    """Regression: reduce_window with an abstract init value silently breaks
    reverse-mode autodiff under jit (must stay a concrete scalar)."""
    rng = np.random.default_rng(3)
    grid = random_grid(rng, occupancy=0.2)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))

    def loss(w):
        g = sparse_avg_pool(sparse_conv(grid, w), 2, 2)
        return jnp.sum(sparse_global_avg_pool(g))

    g = jax.jit(jax.grad(loss))(w)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_sparse_densenet_forward(tmp_path):
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data import Batcher, EventDataset
    from dune_transformercvn_tpu.data.schema import make_synthetic_file
    from dune_transformercvn_tpu.models import ModelConfig, TransformerCVN

    path = str(tmp_path / "s.h5")
    make_synthetic_file(path, num_events=17, seed=4)
    ds = EventDataset(path, event_current_targets=True)
    ds.compute_statistics()

    o = Options()
    o.densenet_structure = [1, 1]
    o.densenet_growth_rate = 8
    o.initial_pixel_dim = 8
    o.pixel_embedding_dim = 16
    o.feature_embedding_dim = 8
    o.position_embedding_dim = 8
    o.hidden_dim = 32
    o.num_encoder_layers = 1
    o.num_attention_heads = 4
    o.compute_dtype = "float32"
    o.dropout = 0.1

    cfg = ModelConfig.from_options(
        o, ds.num_features, ds.num_extra, ds.pixel_features,
        ds.num_event_classes, ds.num_prong_classes, embedder="sparse",
    )
    model = TransformerCVN(cfg)
    batcher = Batcher(ds, batch_size=2, coo_granularity=512)
    batch = {k: jnp.asarray(v) for k, v in batcher.build_batch(np.arange(2)).items()}
    norm = {
        "mean": jnp.asarray(ds.mean), "std": jnp.asarray(ds.std),
        "extra_mean": jnp.asarray(ds.extra_mean), "extra_std": jnp.asarray(ds.extra_std),
    }
    variables = jax.jit(lambda r, b, n: model.init(r, b, n, train=False))(
        jax.random.PRNGKey(0), batch, norm
    )
    ev, pr = jax.jit(lambda v, b, n: model.apply(v, b, n, train=False))(
        variables, batch, norm
    )
    assert ev.shape == (2, ds.num_event_classes)
    assert np.isfinite(np.asarray(ev)).all() and np.isfinite(np.asarray(pr)).all()
    # train mode with BN updates runs too
    (ev, pr), updates = jax.jit(
        lambda v, b, n, r: model.apply(
            v, b, n, train=True, rngs=r, mutable=["batch_stats"]
        )
    )(variables, batch, norm,
      {"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(ev)).all()
