"""Eval-time BN folding: conv->BN absorbed into conv weights must leave
the eval logits unchanged (ops/fold.py; the serving byte-level lever from
the round-3 profiling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.data.batcher import Batcher
from dune_transformercvn_tpu.data.schema import make_synthetic_file
from dune_transformercvn_tpu.data.dataset import EventDataset
from dune_transformercvn_tpu.models import ModelConfig, TransformerCVN
from dune_transformercvn_tpu.ops.fold import fold_eval_batchnorm


def _tiny_options():
    o = Options()
    o.densenet_structure = [2, 1]
    o.densenet_growth_rate = 8
    o.initial_pixel_dim = 8
    o.pixel_embedding_dim = 16
    o.feature_embedding_dim = 8
    o.position_embedding_dim = 8
    o.hidden_dim = 32
    o.num_encoder_layers = 1
    o.num_attention_heads = 4
    o.compute_dtype = "float32"
    return o


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fold") / "data.h5")
    make_synthetic_file(path, num_events=16, seed=11)
    ds = EventDataset(path, event_current_targets=True)
    batcher = Batcher(ds, batch_size=8, coo_granularity=256)
    batch = {k: jnp.asarray(v) for k, v in batcher.build_batch(np.arange(8)).items()}
    norm = {
        "mean": jnp.zeros(ds.num_features), "std": jnp.ones(ds.num_features),
        "extra_mean": jnp.zeros(ds.num_extra), "extra_std": jnp.ones(ds.num_extra),
    }
    return ds, batch, norm


def _build(options, ds, batch, norm, embedder="dense"):
    cfg = ModelConfig.from_options(
        options, ds.num_features, ds.num_extra, ds.pixel_features,
        ds.num_event_classes, ds.num_prong_classes,
        image_shape=ds.pixel_shape, embedder=embedder,
    )
    model = TransformerCVN(cfg)
    variables = jax.jit(lambda r, b, n: model.init(r, b, n, train=False))(
        jax.random.PRNGKey(3), batch, norm
    )
    # non-trivial running stats (fresh init has mean=0/var=1, which would
    # make the fold a no-op disguise): run a few train steps' stat updates
    def warm(v, b, n, key):
        _, mutated = model.apply(
            v, b, n, train=True, mutable=["batch_stats"],
            rngs={"dropout": key, "noise": jax.random.fold_in(key, 1)},
        )
        return {"params": v["params"], "batch_stats": mutated["batch_stats"]}
    warm = jax.jit(warm)
    for i in range(3):
        variables = warm(variables, batch, norm, jax.random.PRNGKey(10 + i))
    return model, variables


@pytest.mark.parametrize("embedder", ["dense", "coo"])
def test_fold_preserves_eval_logits(tiny_setup, embedder):
    ds, batch, norm = tiny_setup
    model, variables = _build(_tiny_options(), ds, batch, norm, embedder)
    folded, n_folds = fold_eval_batchnorm(variables)
    # [2, 1] structure: 3 bottlenecks x 2 embedders, + 2 stems (dense only)
    assert n_folds == (8 if embedder == "dense" else 6)

    apply = jax.jit(lambda v, b, n: model.apply(v, b, n, train=False))
    ev0, pr0 = jax.device_get(apply(variables, batch, norm))
    ev1, pr1 = jax.device_get(apply(folded, batch, norm))
    np.testing.assert_allclose(ev1, ev0, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(pr1, pr0, atol=2e-4, rtol=1e-4)

    # the folded BNs are exact identities: their stats/params encode
    # (x - 0) * rsqrt((1 - eps) + eps) * 1 + 0 == x
    emb = folded["params"]["event_pixel_embedding"]
    bn = emb["Bottleneck_0"]["MaskedBatchNorm_1"]
    np.testing.assert_array_equal(np.asarray(bn["scale"]), 1.0)
    np.testing.assert_array_equal(np.asarray(bn["bias"]), 0.0)

    # and the original variables are untouched (pure transformation) —
    # the warmed running mean is nonzero while the folded one is zeroed
    orig = variables["batch_stats"]["event_pixel_embedding"]["Bottleneck_0"]["MaskedBatchNorm_1"]
    assert np.abs(np.asarray(orig["mean"])).max() > 0
    fold_bs = folded["batch_stats"]["event_pixel_embedding"]["Bottleneck_0"]["MaskedBatchNorm_1"]
    np.testing.assert_array_equal(np.asarray(fold_bs["mean"]), 0.0)


def test_inference_state_wiring(tmp_path):
    """Trainer._inference_state serves folded weights (and the option
    gates it): the serving path actually runs what ops/fold.py promises."""
    from dune_transformercvn_tpu.train.loop import Trainer

    path = str(tmp_path / "wire.h5")
    make_synthetic_file(path, num_events=16, seed=11)
    o = _tiny_options()
    o.training_file = path
    o.event_current_targets = True
    o.train_validation_split = 0.6
    o.num_gpu = 1
    o.batch_size = 4
    o.dropout = 0.0
    o.pixel_noise_std = 0.0
    o.fold_eval_bn = True   # capability opt-in (measured neutral on v5e)

    trainer = Trainer(o, run_dir=None, debug=True, verbose=False)
    folded = trainer._inference_state()
    raw_k = np.asarray(
        trainer.state.params["event_pixel_embedding"]["Conv_0"]["kernel"])
    fold_k = np.asarray(
        folded.params["event_pixel_embedding"]["Conv_0"]["kernel"])
    # fresh init: BN scale=1/var=1 -> a = rsqrt(1+eps) != 1, so the folded
    # stem kernel must differ, and the BN must be the canonical identity
    assert not np.array_equal(raw_k, fold_k)
    bn = folded.batch_stats["event_pixel_embedding"]["MaskedBatchNorm_0"]
    np.testing.assert_array_equal(np.asarray(bn["mean"]), 0.0)

    o.fold_eval_bn = False
    assert trainer._inference_state() is trainer.state or np.array_equal(
        np.asarray(trainer._inference_state().params
                   ["event_pixel_embedding"]["Conv_0"]["kernel"]), raw_k
    )


def test_fold_non_densenet_family_is_noop(tiny_setup):
    ds, batch, norm = tiny_setup
    o = _tiny_options()
    model, variables = _build(o, ds, batch, norm, embedder="resnet")
    folded, n_folds = fold_eval_batchnorm(variables)
    assert n_folds == 0
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
            folded, {"params": variables["params"],
                     "batch_stats": variables["batch_stats"]},
        )
    )
