"""Model tests: shapes, mask invariance, dtype policy, parameter wiring.

Everything is wrapped in ``jax.jit`` (including ``init``): on a single-core
CPU host, eager op-by-op dispatch pays a per-op compile cost that makes
unjitted module calls pathologically slow.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
import pytest

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.data import Batcher, EventDataset
from dune_transformercvn_tpu.models import ModelConfig, TransformerCVN
from dune_transformercvn_tpu.models.densenet import DenseNet
from dune_transformercvn_tpu.models.encoder import TransformerEncoder


def tiny_options():
    o = Options()
    o.densenet_structure = [1, 1]
    o.densenet_growth_rate = 8
    o.initial_pixel_dim = 8
    o.pixel_embedding_dim = 16
    o.feature_embedding_dim = 8
    o.position_embedding_dim = 8
    o.hidden_dim = 32
    o.num_encoder_layers = 2
    o.num_prong_decoder_layers = 2
    o.num_attention_heads = 4
    o.dropout = 0.1
    o.compute_dtype = "float32"
    return o


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    path = tmp_path_factory.mktemp("model") / "tiny.h5"
    make_synthetic_file(str(path), num_events=33, seed=1)
    ds = EventDataset(str(path), event_current_targets=True)
    ds.compute_statistics()
    options = tiny_options()
    cfg = ModelConfig.from_options(
        options, ds.num_features, ds.num_extra, ds.pixel_features,
        ds.num_event_classes, ds.num_prong_classes,
    )
    batcher = Batcher(ds, batch_size=4, num_shards=1, coo_granularity=512)
    batch = batcher.build_batch(np.arange(4))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    norm = {
        "mean": jnp.asarray(ds.mean),
        "std": jnp.asarray(ds.std),
        "extra_mean": jnp.asarray(ds.extra_mean),
        "extra_std": jnp.asarray(ds.extra_std),
    }
    model = TransformerCVN(cfg)
    variables = jax.jit(partial(model.init, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        batch, norm,
    )
    eval_apply = jax.jit(partial(model.apply, train=False))
    return ds, cfg, model, variables, batch, norm, eval_apply


def test_forward_shapes_and_dtypes(tiny_setup):
    ds, cfg, model, variables, batch, norm, eval_apply = tiny_setup
    ev, pr = eval_apply(variables, batch, norm)
    assert ev.shape == (4, ds.num_event_classes)
    assert pr.shape == (4, 20, ds.num_prong_classes)
    assert ev.dtype == jnp.float32 and pr.dtype == jnp.float32
    assert np.isfinite(np.asarray(ev)).all() and np.isfinite(np.asarray(pr)).all()


def test_train_mode_mutates_batch_stats(tiny_setup):
    _, _, model, variables, batch, norm, _ = tiny_setup
    train_apply = jax.jit(partial(model.apply, train=True, mutable=["batch_stats"]))
    (ev, pr), updates = train_apply(
        variables, batch, norm,
        rngs={"dropout": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)},
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_padded_slots_do_not_affect_logits(tiny_setup):
    """Poisoning padded prong-slot COO values & features must not change output."""
    ds, cfg, model, variables, batch, norm, eval_apply = tiny_setup
    poisoned = dict(batch)
    P = batch["slot_batch"].shape[0]
    pad_hits = np.asarray(batch["prong_owner"]) >= P
    vals = np.asarray(batch["prong_vals"]).copy()
    vals[pad_hits] = 1e6
    poisoned["prong_vals"] = jnp.asarray(vals)

    feats = np.asarray(batch["features"]).copy()
    mask = np.asarray(batch["prong_mask"])
    feats[~mask] = 123.0
    poisoned["features"] = jnp.asarray(feats)

    ev0, pr0 = eval_apply(variables, batch, norm)
    ev1, pr1 = eval_apply(variables, poisoned, norm)
    np.testing.assert_allclose(np.asarray(ev0), np.asarray(ev1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pr0)[mask], np.asarray(pr1)[mask], atol=1e-5
    )


def test_param_structure(tiny_setup):
    _, cfg, model, variables, *_ = tiny_setup
    params = variables["params"]
    for name in (
        "event_pixel_embedding",
        "prong_pixel_embedding",
        "combined_embedding",
        "encoder",
        "event_decoder",
        "prong_decoder",
        "event_position_embedding",
        "prong_position_embedding",
    ):
        assert name in params, f"missing {name}"
    assert params["event_position_embedding"].shape == (1, cfg.position_embedding_dim)
    # all params fp32
    assert all(p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(params))


def test_densenet_channel_plan():
    """Production config: [3,6,12,6,3] growth 32 from stem 64 ends at 322 chans."""
    net = DenseNet(
        output_dim=16, initial_features=64, growth_rate=32,
        batch_norm_size=4, block_config=(3, 6, 12, 6, 3),
    )
    x = jnp.zeros((2, 64, 48, 3))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(variables, x)
    assert out.shape == (2, 16)
    # final BN before global pool sees 322 channels
    final_bn = variables["params"]["MaskedBatchNorm_1"]
    assert final_bn["scale"].shape == (322,)
    # 3+6+12+6+3 = 30 bottleneck layers and 4 transitions
    assert sum(1 for k in variables["params"] if k.startswith("Bottleneck")) == 30
    assert sum(1 for k in variables["params"] if k.startswith("Transition")) == 4


def test_densenet_remat_same_params_and_grads():
    """remat=True must keep the param tree identical (checkpoints stay
    compatible) and produce the same gradients."""
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 48, 40, 3)).astype(np.float32)
    )
    kwargs = dict(output_dim=8, initial_features=8, growth_rate=4,
                  batch_norm_size=2, block_config=(1, 1))
    plain = DenseNet(**kwargs)
    remat = DenseNet(remat=True, **kwargs)
    v = jax.jit(plain.init)(jax.random.PRNGKey(0), x)

    def loss(net, v):
        return jnp.sum(net.apply(v, x, mutable=["batch_stats"])[0])

    g1 = jax.jit(jax.grad(lambda v: loss(plain, v)))(v)
    g2 = jax.jit(jax.grad(lambda v: loss(remat, v)))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_embedder_same_params_and_outputs():
    """remat_embedder=True (whole-CNN nn.remat, the batch-128 memory mode)
    must keep the param tree identical to the plain build — checkpoints stay
    loadable across the toggle — and produce the same outputs/gradients."""
    from dune_transformercvn_tpu.models.network import create_pixel_embedder

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 48, 40, 3)).astype(np.float32)
    )
    cfg_kw = dict(densenet_structure=(1, 1), densenet_growth_rate=4,
                  densenet_batch_norm_size=2, initial_pixel_dim=8)

    class Host(nn.Module):
        remat_embedder: bool

        @nn.compact
        def __call__(self, x):
            cfg = ModelConfig(remat_embedder=self.remat_embedder,
                              remat_cnn=self.remat_embedder, **cfg_kw)
            return create_pixel_embedder(cfg, 8, "event_pixel_embedding")(
                x, None, False
            )

    plain, wrapped = Host(False), Host(True)
    v = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        jax.jit(wrapped.init)(jax.random.PRNGKey(0), x)
    )

    def loss(net, v):
        return jnp.sum(net.apply(v, x, mutable=["batch_stats"])[0])

    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda v: loss(plain, v))(v)),
        np.asarray(jax.jit(lambda v: loss(wrapped, v))(v)), rtol=1e-6)
    g1 = jax.jit(jax.grad(lambda v: loss(plain, v)))(v)
    g2 = jax.jit(jax.grad(lambda v: loss(wrapped, v)))(v)
    # the remat backward recomputes through different fusion boundaries, so
    # fp32 rounding differs at the last few ulps
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5)


def test_remat_embedder_coo_family_compiles_and_matches():
    """remat_embedder with the 'coo' family: nn.remat traces the COO
    tuple's Python-int num_rows into a tracer, so the stem must recover
    the static row count from the CSR starts shape (regression: this
    crashed at first jit with a traced-shape TypeError)."""
    from dune_transformercvn_tpu.models.network import create_pixel_embedder

    H, W, C, n_img, n_hits = 48, 40, 3, 2, 37
    rng = np.random.default_rng(1)
    per = n_hits // n_img
    xy = jnp.asarray(
        np.stack([rng.integers(0, H, n_hits), rng.integers(0, W, n_hits)], 1)
        .astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(n_hits, C)).astype(np.float32))
    owner = jnp.asarray(np.minimum(np.arange(n_hits) // per, n_img - 1)
                        .astype(np.int32))
    starts = jnp.asarray(
        np.searchsorted(np.asarray(owner), np.arange(n_img + 1)).astype(np.int32))
    coo = (xy, vals, owner, n_img, starts)
    cfg_kw = dict(embedder="coo", image_height=H, image_width=W,
                  densenet_structure=(1, 1), densenet_growth_rate=4,
                  densenet_batch_norm_size=2, initial_pixel_dim=8)

    class Host(nn.Module):
        remat_embedder: bool

        @nn.compact
        def __call__(self, coo):
            cfg = ModelConfig(remat_embedder=self.remat_embedder, **cfg_kw)
            return create_pixel_embedder(cfg, 8, "event_pixel_embedding")(
                coo, None, False
            )

    plain, wrapped = Host(False), Host(True)
    v = jax.jit(plain.init)(jax.random.PRNGKey(0), coo)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        jax.jit(wrapped.init)(jax.random.PRNGKey(0), coo)
    )

    def loss(net, v):
        return jnp.sum(net.apply(v, coo, mutable=["batch_stats"])[0])

    np.testing.assert_allclose(
        np.asarray(jax.jit(lambda v: loss(plain, v))(v)),
        np.asarray(jax.jit(lambda v: loss(wrapped, v))(v)), rtol=1e-6)
    g1 = jax.jit(jax.grad(lambda v: loss(plain, v)))(v)
    g2 = jax.jit(jax.grad(lambda v: loss(wrapped, v)))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-5)


def test_encoder_mask_blocks_padded_keys():
    enc = TransformerEncoder(hidden_dim=16, num_heads=4, num_layers=1)
    B, T = 2, 5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, 16)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), x, mask)
    apply = jax.jit(enc.apply)
    y0 = apply(variables, x, mask)
    # changing a padded token's content must not change real-token outputs
    x2 = x.at[0, 4].set(99.0)
    y1 = apply(variables, x2, mask)
    np.testing.assert_allclose(np.asarray(y0[0, :3]), np.asarray(y1[0, :3]), atol=1e-5)
    # padded outputs are zeroed by the sequence mask
    assert np.abs(np.asarray(y0[0, 3:])).max() == 0.0
