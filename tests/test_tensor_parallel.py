"""Tensor parallelism (hybrid manual-DP + auto-TP mesh) correctness.

The reference has no model parallelism (DDP only, train.py:123-127); the
``model_parallel`` option is a TPU-native extension: a 2-D ``(data, model)``
mesh where the data axis stays manual (the tuned shard_map body) and the
model axis is auto — GSPMD shards parameter channel axes and inserts the
tensor-parallel collectives.  These tests pin

* the hybrid autodiff semantics the step builder relies on (cotangents of
  replicated-in_spec inputs arrive implicitly psummed over the manual axis),
* exact agreement of a dp4 x mp2 trainer with the plain dp4 trainer
  (same global batch, same per-shard RNG folds) over multiple train steps,
  validation metrics, and predictions,
* that the state really is channel-sharded over the model axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.parallel.mesh import MODEL_AXIS, state_shardings
from dune_transformercvn_tpu.train import Trainer


def test_varying_cast_grad_reduction_semantics():
    """Pin the jax behavior the step builder depends on (manual DP and
    hybrid alike): casting a replicated (P()) input to varying
    (``pcast(..., to="varying")``, formerly ``pvary``) before
    differentiating makes the cross-shard reduction explicit — the cast's
    transpose is a psum over the manual axis, so grad of (local loss / dp)
    is exactly the DDP global-mean gradient.  Also pin the trap the old
    code fell into: WITHOUT the cast, the cotangent of a replicated input
    is implicitly psummed and typed invariant, so an explicit pmean is an
    identity on the dp-times-too-large value."""
    devs = np.asarray(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    k = jax.random.PRNGKey(0)
    W = jax.random.normal(k, (16, 64), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(k, 1), (32, 16), jnp.float32)

    def loss(W, xb):
        return jnp.mean(jnp.tanh(xb @ W) ** 2)

    def body(W, xb):
        dp = jax.lax.axis_size("data")
        return jax.grad(
            lambda w: loss(jax.lax.pcast(w, ("data",), to="varying"), xb) / dp
        )(W)

    def naive_body(W, xb):
        return jax.lax.pmean(jax.grad(loss)(W, xb), "data")

    args = (
        jax.device_put(W, NamedSharding(mesh, P(None, "model"))),
        jax.device_put(x, NamedSharding(mesh, P("data"))),
    )
    g = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
        axis_names={"data"},
    ))(*args)
    g_naive = jax.jit(jax.shard_map(
        naive_body, mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
        axis_names={"data"},
    ))(*args)
    g_ref = jax.jit(jax.grad(loss))(W, x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)
    # the naive pattern yields dp x the true gradient — if a jax upgrade
    # changes this, revisit the step builder's reduction strategy
    np.testing.assert_allclose(
        np.asarray(g_naive), 4.0 * np.asarray(g_ref), atol=1e-5
    )


def _tiny_options(path, **overrides):
    o = Options(training_file=path)
    o.densenet_structure = [1, 1]
    o.densenet_growth_rate = 8
    o.initial_pixel_dim = 8
    o.pixel_embedding_dim = 16
    o.feature_embedding_dim = 8
    o.position_embedding_dim = 8
    o.hidden_dim = 32
    o.num_encoder_layers = 1
    o.num_prong_decoder_layers = 2
    o.num_attention_heads = 4
    o.dropout = 0.0
    o.pixel_noise_std = 0.0
    o.compute_dtype = "float32"
    o.event_current_targets = True
    o.loss_gamma = 1.0
    o.epochs = 2
    o.batch_size = 2            # per data shard
    o.coo_bucket_granularity = 1024
    o.train_validation_split = 0.8
    o.verbose_output = False
    for key, value in overrides.items():
        setattr(o, key, value)
    return o


@pytest.fixture(scope="module")
def train_file(tmp_path_factory):
    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    path = str(tmp_path_factory.mktemp("tp") / "train.h5")
    make_synthetic_file(path, num_events=41, seed=7)
    return path


@pytest.fixture(scope="module")
def trainers(train_file):
    """dp4 reference trainer and dp4 x mp2 hybrid trainer, identical
    hyperparameters: same global batch (4 shards x 2), same seed, same
    per-data-shard RNG folds — their steps must agree to fp32 tolerance."""
    dp = Trainer(_tiny_options(train_file, num_gpu=4), debug=True)
    tp = Trainer(
        _tiny_options(train_file, num_gpu=8, model_parallel=2), debug=True
    )
    return dp, tp


def test_state_is_model_sharded(trainers):
    _, tp = trainers
    specs = jax.tree_util.tree_map(
        lambda leaf: getattr(leaf.sharding, "spec", None), tp.state.params
    )
    flat = [s for s in jax.tree_util.tree_leaves(specs, is_leaf=lambda s: isinstance(s, P))]
    assert any(MODEL_AXIS in (s or ()) for s in flat), (
        "no parameter leaf is sharded over the model axis"
    )
    # the 2-D mesh exposes dp=4 data shards
    assert tp.num_shards == 4 and tp.global_batch == 8


def test_hybrid_matches_data_parallel_training(trainers):
    dp, tp = trainers
    assert dp.global_batch == tp.global_batch == 8
    # train_step donates its state argument; work on copies so the shared
    # fixture trainers stay usable by the other tests
    state_dp = jax.device_put(jax.device_get(dp.state), dp.state_sharding)
    state_tp = jax.device_put(jax.device_get(tp.state), tp.state_sharding)

    rng = np.random.default_rng(3)
    n_train = len(dp.training_dataset)
    for step in range(3):
        idx = rng.choice(n_train, size=8, replace=False)
        batch = dp.train_batcher.build_batch(idx)
        state_dp, m_dp = dp.train_step(state_dp, dp._device_batch(batch))
        state_tp, m_tp = tp.train_step(state_tp, tp._device_batch(batch))
        np.testing.assert_allclose(
            float(m_dp["train_loss"]), float(m_tp["train_loss"]),
            rtol=2e-5, err_msg=f"step {step} loss diverged",
        )
        np.testing.assert_allclose(
            float(m_dp["grad_norm"]), float(m_tp["grad_norm"]), rtol=2e-4,
        )

    # final parameters agree leaf-by-leaf (atol: fp32 reduction-order
    # differences between the sharded and replicated layouts, amplified by
    # Adam's rsqrt(v) over the 3 steps)
    flat_dp = jax.tree_util.tree_leaves(jax.device_get(state_dp.params))
    flat_tp = jax.tree_util.tree_leaves(jax.device_get(state_tp.params))
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(a, b, atol=3e-4)
    # BN running stats too (sync-BN over the data axis in both)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_dp.batch_stats)),
        jax.tree_util.tree_leaves(jax.device_get(state_tp.batch_stats)),
    ):
        np.testing.assert_allclose(a, b, atol=3e-4)


def test_hybrid_predict_matches(trainers):
    dp, tp = trainers
    batch = dp.train_batcher.build_batch(np.arange(8))
    ev_dp, pr_dp = dp.predict_step(dp.state, dp._device_batch(batch))
    ev_tp, pr_tp = tp.predict_step(tp.state, tp._device_batch(batch))
    np.testing.assert_allclose(
        np.asarray(ev_dp), np.asarray(ev_tp), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pr_dp), np.asarray(pr_tp), atol=1e-5
    )


def test_hybrid_fit_checkpoint_resume(train_file, tmp_path_factory):
    """Trainer.fit on the hybrid mesh end-to-end: training loop, validation,
    checkpointing of the TP-sharded state (device_get gathers it), and a
    resume that re-places the restored pytree with the sharded layout."""
    import os

    run_dir = str(tmp_path_factory.mktemp("runs") / "tp")
    o = _tiny_options(train_file, num_gpu=8, model_parallel=2)
    t = Trainer(o, run_dir=run_dir)
    result = t.fit(max_steps=4, eval_interval=4)
    assert np.isfinite(result["val_loss"])
    assert t.checkpoints.latest_step() == 4

    t2 = Trainer(
        _tiny_options(train_file, num_gpu=8, model_parallel=2), run_dir=run_dir
    )
    t2.resume()
    assert int(t2.state.step) == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(t2.state.params)),
    ):
        np.testing.assert_array_equal(a, b)
    # restored leaves carry the TP sharding again
    specs = [
        getattr(leaf.sharding, "spec", None)
        for leaf in jax.tree_util.tree_leaves(t2.state.params)
    ]
    assert any(MODEL_AXIS in (s or ()) for s in specs)


def test_model_parallel_clamps_to_available_devices(train_file):
    """Evaluating a TP-trained run's options.json on fewer devices than the
    TP group falls back to no TP (checkpoints are layout-independent)."""
    from dune_transformercvn_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(1, model_parallel=16)
    assert mesh.axis_names == ("data",) and mesh.devices.size == 1
    with pytest.raises(ValueError):
        create_mesh(8, model_parallel=3)   # non-divisible is a config error


def test_hybrid_scan_dispatch_matches_single_steps(train_file):
    """steps_per_dispatch > 1 on the hybrid mesh: one scan dispatch of K=2
    stacked batches equals 2 single hybrid steps (the TP-sharded state
    threads through the lax.scan carry)."""
    o1 = _tiny_options(train_file, num_gpu=8, model_parallel=2)
    o2 = _tiny_options(
        train_file, num_gpu=8, model_parallel=2, steps_per_dispatch=2
    )
    t1 = Trainer(o1, debug=True)
    t2 = Trainer(o2, debug=True)

    b_a = t2.train_batcher.build_batch(np.arange(8))
    b_b = t2.train_batcher.build_batch(np.arange(8) + 8)

    s1 = jax.device_put(jax.device_get(t1.state), t1.state_sharding)
    s1, m_a = t1.train_step(s1, t1._device_batch(b_a))
    s1, m_b = t1.train_step(s1, t1._device_batch(b_b))

    s2 = jax.device_put(jax.device_get(t2.state), t2.state_sharding)
    s2, m_k = t2.train_step(s2, t2._device_stacked([b_a, b_b]))

    np.testing.assert_allclose(
        np.asarray(m_k["train_loss"]),
        [float(m_a["train_loss"]), float(m_b["train_loss"])], rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(s1.params)),
        jax.tree_util.tree_leaves(jax.device_get(s2.params)),
    ):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_state_shardings_rule_shapes():
    """The shape-based rule: channel axes shard, small/1-D leaves replicate."""
    devs = np.asarray(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    tree = {
        "dense_kernel": jnp.zeros((32, 64)),
        "conv_kernel": jnp.zeros((7, 7, 3, 64)),
        "bias": jnp.zeros((64,)),
        "narrow": jnp.zeros((16, 4)),   # 4/2 = 2 < min_shard_dim
        "scalar": jnp.zeros(()),
    }
    shards = state_shardings(tree, mesh)
    assert shards["dense_kernel"].spec == P(None, MODEL_AXIS)
    assert shards["conv_kernel"].spec == P(None, None, None, MODEL_AXIS)
    assert shards["bias"].spec == P()
    assert shards["narrow"].spec == P()
    assert shards["scalar"].spec == P()
