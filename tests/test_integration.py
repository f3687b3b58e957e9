"""End-to-end integration tests on the 8-device virtual CPU mesh.

Mirrors SURVEY §4's prescription: N-step training on a synthetic file with
decreasing loss, checkpoint/resume round-trip, and data-parallel correctness
(grad-psum equivalence single-device vs 8-device, exact metric additivity).
"""

import os

import jax
import numpy as np
import pytest

from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.train import Trainer


def tiny_train_options(path, **overrides):
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
    o.learning_rate = 3e-3
    o.gradient_clip = 10.0
    o.epochs = 4
    o.train_validation_split = 0.8
    o.coo_bucket_granularity = 1024
    o.verbose_output = False
    for key, value in overrides.items():
        setattr(o, key, value)
    return o


@pytest.fixture(scope="module")
def train_file(tmp_path_factory):
    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    path = tmp_path_factory.mktemp("integration") / "train.h5"
    make_synthetic_file(str(path), num_events=129, seed=11)
    return str(path)


@pytest.fixture(scope="module")
def trainer8(train_file, tmp_path_factory):
    o = tiny_train_options(train_file, batch_size=1, num_gpu=8)
    run_dir = str(tmp_path_factory.mktemp("runs") / "t8")
    # finer-than-default log cadence: the 40-step runs below assert on
    # intermediate train_loss logs
    return Trainer(o, run_dir=run_dir, log_every_n_steps=10)


def test_training_reduces_loss_and_checkpoints(trainer8):
    t = trainer8
    assert t.num_shards == 8
    # capture initial train loss by evaluating before training
    before = t.validate()
    assert np.isfinite(before["val_loss"])
    # 40 steps ≈ 3 epochs over the tiny synthetic split.  The learning
    # assertion is on the TRAIN loss trend: 3 epochs reliably memorize the
    # 103-event split, whereas a 40-step val-loss comparison is
    # init-draw-dependent (it flipped sign when the default PRNG impl
    # changed; generalization at this scale needs ~500 steps, see README's
    # learning-sanity run).
    result = t.fit(max_steps=40, eval_interval=20)
    after = result
    assert np.isfinite(after["val_loss"])
    # checkpoints were written with the top-k index
    assert t.checkpoints.latest_step() == 40
    assert os.path.exists(os.path.join(t.run_dir, "options.json"))
    # metrics were logged with reference tag names
    from dune_transformercvn_tpu.train.logging import read_history

    history = read_history(t.run_dir)
    for tag in ("train_loss", "event_loss", "prong_loss", "val_epoch_AUC", "lr-AdamW/pg1"):
        assert tag in history, f"missing tag {tag} in {list(history)}"
    # training reduces the train loss (memorization over ~3 epochs)
    train_losses = [v for _, v in history["train_loss"]]
    assert len(train_losses) >= 3
    assert train_losses[-1] < train_losses[0], train_losses


def test_resume_round_trip(trainer8, train_file, tmp_path_factory):
    t = trainer8
    o = tiny_train_options(train_file, batch_size=1, num_gpu=8)
    t2 = Trainer(o, run_dir=t.run_dir)
    t2.resume()  # latest from run dir
    assert int(t2.state.step) == int(t.state.step)
    a = jax.tree_util.tree_leaves(jax.device_get(t.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(t2.state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("batch,gpus", [(8, 1), (1, 8)], ids=["dp1", "dp8"])
def test_split_mode_end_to_end(train_file, batch, gpus):
    """split_event_targets: train a few steps, validate on the current head,
    and predict with remapped 4-way targets (the NeutrinoSplitTrainer flow).
    dp8 exercises the shard_mapped step with the split loss + metric view."""
    o = tiny_train_options(
        train_file, batch_size=batch, num_gpu=gpus,
        event_current_targets=False,     # split derives from 10-class targets
        split_event_targets=True,
        generation_loss_proportion=0.5,
    )
    t = Trainer(o, run_dir=None, debug=True)
    assert t.model_config.num_event_classes == 4
    assert t.model_config.num_generation_classes == 4

    metrics = t.validate()
    assert np.isfinite(metrics["val_loss"])
    assert metrics["event_confusion"].shape == (4, 4)

    result = t.fit(max_steps=3, eval_interval=3)
    assert np.isfinite(result["val_loss"])

    preds = t.predict_split("validation")
    assert preds["event_probabilities"].shape[1] == 4
    np.testing.assert_allclose(preds["event_probabilities"].sum(1), 1.0, rtol=1e-4)
    assert preds["event_targets"].max() <= 3
    assert preds["event_targets"].min() >= 0


def test_split_mode_rejects_coarse_targets(train_file):
    o = tiny_train_options(
        train_file, batch_size=8, num_gpu=1,
        event_current_targets=True, split_event_targets=True,
    )
    with pytest.raises(ValueError, match="split_event_targets"):
        Trainer(o, run_dir=None, debug=True)


def test_dp8_equals_dp1(train_file, tmp_path_factory):
    """Event-only loss, no noise/dropout: 8-way DP must match single device
    (grad pmean == global gradient; sync-BN keeps statistics identical)."""
    o8 = tiny_train_options(
        train_file, batch_size=1, num_gpu=8, event_prong_loss_proportion=1.0
    )
    o1 = tiny_train_options(
        train_file, batch_size=8, num_gpu=1, event_prong_loss_proportion=1.0
    )
    t8 = Trainer(o8, run_dir=None, debug=True)
    t1 = Trainer(o1, run_dir=None, debug=True)

    # identical initial params (same seed, same model config)
    for x, y in zip(
        jax.tree_util.tree_leaves(jax.device_get(t8.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(t1.state.params)),
    ):
        np.testing.assert_array_equal(x, y)

    batch_indices = np.arange(8)
    b8 = t8.train_batcher.build_batch(batch_indices)
    b1 = t1.train_batcher.build_batch(batch_indices)

    s8, m8 = t8.train_step(t8.state, t8._device_batch(b8))
    s1, m1 = t1.train_step(t1.state, t1._device_batch(b1))

    # fp32 reduction-order differences only (oneDNN conv orderings, pmean tree)
    np.testing.assert_allclose(
        float(m8["event_loss"]), float(m1["event_loss"]), rtol=1e-3
    )
    # grad_norm must match too: this catches gradient SCALE errors that the
    # param comparison below cannot (AdamW's update is nearly invariant to
    # a constant grad scaling, which masked a dp-times-too-large reduction)
    np.testing.assert_allclose(
        float(m8["grad_norm"]), float(m1["grad_norm"]), rtol=1e-3
    )
    p8 = jax.tree_util.tree_leaves(jax.device_get(s8.params))
    p1 = jax.tree_util.tree_leaves(jax.device_get(s1.params))
    for x, y in zip(p8, p1):
        np.testing.assert_allclose(x, y, atol=1e-3)

    # metric additivity: identical state -> psum'd statistics must agree
    host_state = jax.device_get(s8)
    t8.state = jax.device_put(host_state, t8.state_sharding)
    t1.state = jax.device_put(host_state, t1.state_sharding)
    v8 = t8.validate()
    v1 = t1.validate()
    np.testing.assert_allclose(v8["val_epoch_AUC"], v1["val_epoch_AUC"], atol=1e-3)
    np.testing.assert_allclose(
        v8["val_epoch_accuracy"], v1["val_epoch_accuracy"], atol=1e-3
    )
