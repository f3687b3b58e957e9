"""Module-level goldens: whole sparse-family forwards vs the ME re-creation.

`tests/test_minkowski_golden.py` anchors each sparse *op*; these tests anchor
the full embedder *compositions* — SparseDenseNet (--sparse), SparseConvNeXt
(--embedder convnext), SparseFCNN (--embedder fcnn) — against an independent
torch re-creation assembled from `tests/_minkowski_ref.py` primitives on
explicit COO lists (the form MinkowskiEngine would process; reference
compositions: sparse_dense_net.py:84-203, sparse_convnext.py:96-158,
sparse_cnn.py:7-158).  The same initialized weights drive both; embeddings
must agree at the real slots.  This exercises exactly what per-op tests
cannot: occupancy propagation through deep coordinate-expanding chains,
re-masking after zero-breaking layers (LayerNorm / biases), aligned
concat/residual semantics, masked-slot folding, and BN statistics over the
occupied point set (eval AND train mode).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dune_transformercvn_tpu.models.sparse_convnext import SparseConvNeXt
from dune_transformercvn_tpu.models.sparse_densenet import SparseDenseNet
from dune_transformercvn_tpu.models.sparse_fcnn import SparseFCNN

from _minkowski_ref import (  # noqa: E402  (same-dir test helper)
    align_features,
    batch_norm_rows,
    layer_norm_rows,
    minkowski_avg_pool,
    minkowski_conv,
    minkowski_global_avg_pool,
    prelu_rows,
)

N_SLOTS, H, W, C_IN = 4, 16, 12, 2
OUT_DIM = 6
MASK = np.array([True, True, False, True])


def t(x):
    return torch.from_numpy(np.array(x))  # copy: jax buffers are read-only


def _inputs(seed=0, hits_per_slot=18):
    """Dense images for our modules + real-slot COO for the re-creation.

    The masked slot GETS hits: the modules must fold the row mask into the
    occupancy (ME never materializes packed-out rows), so those hits must
    not influence any statistic.
    """
    rng = np.random.default_rng(seed)
    images = np.zeros((N_SLOTS, H, W, C_IN), np.float32)
    coords, feats = [], []
    for b in range(N_SLOTS):
        flat = rng.choice(H * W, size=hits_per_slot, replace=False)
        vals = rng.uniform(0.5, 1.5, size=(hits_per_slot, C_IN)).astype(
            np.float32
        )
        images[b, flat // W, flat % W] = vals
        if MASK[b]:
            for p, v in zip(flat, vals):
                coords.append((b, p // W, p % W))
                feats.append(v)
    order = np.lexsort(tuple(np.array([c[i] for c in coords])
                             for i in (2, 1, 0)))
    coords = np.array(coords, np.int64)[order]
    feats = torch.from_numpy(np.stack(feats)[order])
    return images, coords, feats


def _init(model, images, seed=1):
    variables = jax.jit(lambda r, x, m: model.init(r, x, m, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(MASK)
    )
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    # randomize every BN's running stats so eval mode is a real test
    rng = np.random.default_rng(seed)

    def scramble(tree):
        for key, value in tree.items():
            if key == "mean":
                tree[key] = rng.normal(0, 0.3, value.shape).astype(np.float32)
            elif key == "var":
                tree[key] = rng.uniform(0.5, 1.5, value.shape).astype(
                    np.float32
                )
            elif isinstance(value, dict):
                scramble(value)

    scramble(stats)
    return params, stats


def _ours(model, params, stats, images, train):
    if train:
        out, _ = jax.jit(
            lambda v, x, m: model.apply(
                v, x, m, train=True, mutable=["batch_stats"]
            )
        )({"params": params, "batch_stats": stats},
          jnp.asarray(images), jnp.asarray(MASK))
    else:
        out = jax.jit(
            lambda v, x, m: model.apply(v, x, m, train=False)
        )({"params": params, "batch_stats": stats},
          jnp.asarray(images), jnp.asarray(MASK))
    return np.asarray(out)


def _bn_prelu(p, s, feats, train):
    bn_p, bn_s = p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"]
    y = batch_norm_rows(
        feats, t(bn_p["scale"]), t(bn_p["bias"]),
        t(bn_s["mean"]), t(bn_s["var"]), train=train,
    )
    return prelu_rows(y, t(p["PReLU_0"]["alpha"]))


def _tail(p, s, condensed, train):
    """Shared output block: Dense(no bias) -> masked BN -> PReLU over the
    REAL rows only (the row mask excludes padded slots from statistics)."""
    y = condensed @ t(p["Dense_0"]["kernel"])
    real = y[t(MASK).bool()]
    bn_p, bn_s = p["MaskedBatchNorm_0"], s["MaskedBatchNorm_0"]
    real = batch_norm_rows(
        real, t(bn_p["scale"]), t(bn_p["bias"]),
        t(bn_s["mean"]), t(bn_s["var"]), train=train,
    )
    return prelu_rows(real, t(p["PReLU_0"]["alpha"]))


def _assert_match(ours, want_real):
    np.testing.assert_allclose(
        ours[MASK], want_real.numpy(), rtol=2e-4, atol=2e-5
    )


# ---------------------------------------------------------------- DenseNet
DN = dict(initial_features=8, growth_rate=4, batch_norm_size=2,
          block_config=(1, 1))


def _densenet_recreation(params, stats, coords, feats, train):
    def dense_layer(p, s, coords, feats):
        h = _bn_prelu(p["SparseBatchNormPReLU_0"], s["SparseBatchNormPReLU_0"],
                      feats, train)
        _, h = minkowski_conv(coords, h, t(p["SparseConv_0"]["kernel"]),
                              height=h_w[0], width=h_w[1])
        h = _bn_prelu(p["SparseBatchNormPReLU_1"], s["SparseBatchNormPReLU_1"],
                      h, train)
        out_coords, h = minkowski_conv(
            coords, h, t(p["SparseConv_1"]["kernel"]),
            height=h_w[0], width=h_w[1],
        )
        merged = torch.cat(
            [align_features(coords, feats, out_coords), h], dim=-1
        )
        return out_coords, merged

    h_w = [H, W]
    coords, feats = minkowski_conv(
        coords, feats, t(params["SparseConv_0"]["kernel"]),
        stride=2, height=h_w[0], width=h_w[1],
    )
    h_w = [-(-h_w[0] // 2), -(-h_w[1] // 2)]
    feats = _bn_prelu(params["SparseBatchNormPReLU_0"],
                      stats["SparseBatchNormPReLU_0"], feats, train)
    coords, feats = minkowski_avg_pool(
        coords, feats, kernel=3, stride=2, height=h_w[0], width=h_w[1]
    )
    h_w = [-(-h_w[0] // 2), -(-h_w[1] // 2)]

    coords, feats = dense_layer(
        params["SparseDenseLayer_0"], stats["SparseDenseLayer_0"],
        coords, feats,
    )
    tr_p, tr_s = params["SparseTransition_0"], stats["SparseTransition_0"]
    feats = _bn_prelu(tr_p["SparseBatchNormPReLU_0"],
                      tr_s["SparseBatchNormPReLU_0"], feats, train)
    _, feats = minkowski_conv(
        coords, feats, t(tr_p["SparseConv_0"]["kernel"]),
        height=h_w[0], width=h_w[1],
    )
    coords, feats = minkowski_avg_pool(
        coords, feats, kernel=2, stride=2, height=h_w[0], width=h_w[1]
    )
    h_w = [-(-h_w[0] // 2), -(-h_w[1] // 2)]
    coords, feats = dense_layer(
        params["SparseDenseLayer_1"], stats["SparseDenseLayer_1"],
        coords, feats,
    )
    feats = _bn_prelu(params["SparseBatchNormPReLU_1"],
                      stats["SparseBatchNormPReLU_1"], feats, train)
    condensed = minkowski_global_avg_pool(coords, feats, N_SLOTS)
    return _tail(params, stats, condensed, train)


@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
def test_sparse_densenet_matches_me_composition(train):
    images, coords, feats = _inputs(seed=10)
    model = SparseDenseNet(output_dim=OUT_DIM, **DN)
    params, stats = _init(model, images)
    ours = _ours(model, params, stats, images, train)
    want = _densenet_recreation(params, stats, coords, feats, train)
    _assert_match(ours, want.float())


# -------------------------------------------------------------------- FCNN
def _fcnn_recreation(params, stats, coords, feats, train):
    h_w = [H, W]
    coords, feats = minkowski_conv(
        coords, feats, t(params["SparseConv_0"]["kernel"]),
        height=h_w[0], width=h_w[1],
    )
    feats = _bn_prelu(params["SparseBatchNormPReLU_0"],
                      stats["SparseBatchNormPReLU_0"], feats, train)
    summaries = [minkowski_global_avg_pool(coords, feats, N_SLOTS)]
    for i in range(2):
        coords, feats = minkowski_conv(
            coords, feats, t(params[f"SparseConv_{i + 1}"]["kernel"]),
            stride=2, height=h_w[0], width=h_w[1],
        )
        h_w = [-(-h_w[0] // 2), -(-h_w[1] // 2)]
        feats = _bn_prelu(params[f"SparseBatchNormPReLU_{i + 1}"],
                          stats[f"SparseBatchNormPReLU_{i + 1}"], feats, train)
        coords, feats = minkowski_avg_pool(
            coords, feats, kernel=2, stride=1, height=h_w[0], width=h_w[1]
        )
        summaries.append(minkowski_global_avg_pool(coords, feats, N_SLOTS))
    condensed = torch.cat(summaries, dim=-1)
    return _tail(params, stats, condensed, train)


@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
def test_sparse_fcnn_matches_me_composition(train):
    images, coords, feats = _inputs(seed=20)
    model = SparseFCNN(output_dim=OUT_DIM, initial_features=8,
                       stage_features=(8, 16))
    params, stats = _init(model, images)
    ours = _ours(model, params, stats, images, train)
    want = _fcnn_recreation(params, stats, coords, feats, train)
    _assert_match(ours, want.float())


# ---------------------------------------------------------------- ConvNeXt
def _gelu(x):
    return torch.nn.functional.gelu(x)  # exact erf, = nn.gelu(approximate=False)


def _convnext_recreation(params, stats, coords, feats, train):
    def block(p, coords, feats, h, w):
        out_coords, x = minkowski_conv(
            coords, feats, t(p["SparseConv_0"]["kernel"][:, :, 0, :]),
            height=h, width=w, channelwise=True,
        )
        ln = p["LayerNorm_0"]
        x = layer_norm_rows(x, t(ln["scale"]), t(ln["bias"]))
        x = x @ t(p["Dense_0"]["kernel"]) + t(p["Dense_0"]["bias"])
        x = _gelu(x)
        x = x @ t(p["Dense_1"]["kernel"]) + t(p["Dense_1"]["bias"])
        x = x * t(p["layer_scale"])
        # residual: input features are zero at newly expanded coordinates
        return out_coords, align_features(coords, feats, out_coords) + x

    h_w = [H, W]
    coords, feats = minkowski_conv(
        coords, feats, t(params["SparseConv_0"]["kernel"]),
        stride=4, height=h_w[0], width=h_w[1],
    )
    h_w = [-(-h_w[0] // 4), -(-h_w[1] // 4)]
    ln = params["LayerNorm_0"]
    feats = layer_norm_rows(feats, t(ln["scale"]), t(ln["bias"]))

    coords, feats = block(params["ConvNeXtBlock_0"], coords, feats, *h_w)

    ln = params["LayerNorm_1"]
    feats = layer_norm_rows(feats, t(ln["scale"]), t(ln["bias"]))
    coords, feats = minkowski_conv(
        coords, feats, t(params["SparseConv_1"]["kernel"]),
        stride=2, height=h_w[0], width=h_w[1],
    )
    h_w = [-(-h_w[0] // 2), -(-h_w[1] // 2)]
    coords, feats = block(params["ConvNeXtBlock_1"], coords, feats, *h_w)

    condensed = minkowski_global_avg_pool(coords, feats, N_SLOTS)
    ln = params["LayerNorm_2"]
    condensed = layer_norm_rows(condensed, t(ln["scale"]), t(ln["bias"]))
    return _tail(params, stats, condensed, train)


@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
def test_sparse_convnext_matches_me_composition(train):
    images, coords, feats = _inputs(seed=30)
    model = SparseConvNeXt(output_dim=OUT_DIM, kernel=3,
                           hidden_features=(8, 16), hidden_depths=(1, 1))
    params, stats = _init(model, images)
    ours = _ours(model, params, stats, images, train)
    want = _convnext_recreation(params, stats, coords, feats, train)
    _assert_match(ours, want.float())
