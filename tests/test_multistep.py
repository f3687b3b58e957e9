"""Multi-step dispatch (steps_per_dispatch): scan-of-K == K single steps.

The scanned step exists purely to amortize per-dispatch host latency; it
is mathematically identical to K sequential dispatches — same RNG folds
(state.step, device), same optimizer threading, same BN statistics.  XLA
fuses the scan body differently from the standalone step, so agreement is
up to compilation rounding (measured ~2e-5 after 3 Adam steps, which
amplifies tiny grad differences through 1/sqrt(v) early in training).
"""

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _synthetic_setup
from dune_transformercvn_tpu.config import Options
from dune_transformercvn_tpu.parallel.mesh import create_mesh
from dune_transformercvn_tpu.train import schedules
from dune_transformercvn_tpu.train.optimizer import create_optimizer
from dune_transformercvn_tpu.train.state import create_train_state
from dune_transformercvn_tpu.train.step import make_train_step


def tiny_options(**overrides):
    options = Options()
    options.densenet_structure = [1, 1]
    options.densenet_growth_rate = 8
    options.initial_pixel_dim = 8
    options.pixel_embedding_dim = 16
    options.feature_embedding_dim = 8
    options.position_embedding_dim = 8
    options.hidden_dim = 32
    options.num_encoder_layers = 1
    options.num_prong_decoder_layers = 2
    options.num_attention_heads = 4
    options.compute_dtype = "float32"
    options.event_current_targets = True
    options.batch_size = 2
    options.coo_bucket_granularity = 512
    options.static_batch_shapes = True  # stacking requires one signature
    for k, v in overrides.items():
        setattr(options, k, v)
    return options


def test_scan_of_k_matches_k_single_steps():
    K = 3
    options = tiny_options()
    dataset, batcher, cfg, model, norm = _synthetic_setup(
        options, num_events=2 * K * options.batch_size
    )
    batcher.fixed_caps = batcher._compute_fixed_caps()
    batches = [
        {k: jnp.asarray(v) for k, v in batcher.build_batch(
            np.arange(options.batch_size) + i * options.batch_size
        ).items()}
        for i in range(K)
    ]

    mesh = create_mesh(1)
    tx = create_optimizer(options, schedules.from_options(options, 10))
    state_a = create_train_state(model, tx, batches[0], norm, seed=0)
    state_b = jax.tree_util.tree_map(jnp.copy, state_a)

    single = make_train_step(model, tx, options, mesh)
    multi = make_train_step(model, tx, options, mesh, steps_per_dispatch=K)

    per_step = []
    for b in batches:
        state_a, metrics = single(state_a, b)
        per_step.append(float(metrics["train_loss"]))

    stacked = {
        k: jnp.stack([b[k] for b in batches]) for k in batches[0]
    }
    state_b, metrics_k = multi(state_b, stacked)

    # equal parameters after K steps, up to compiler-fusion rounding
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        ),
        jax.device_get(state_a.params), jax.device_get(state_b.params),
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        ),
        jax.device_get(state_a.batch_stats), jax.device_get(state_b.batch_stats),
    )
    assert int(state_b.step) == K
    # per-step metrics come back stacked [K] and match the singles
    np.testing.assert_allclose(
        np.asarray(metrics_k["train_loss"]), np.asarray(per_step), rtol=1e-4
    )


def test_trainer_fit_with_steps_per_dispatch(tmp_path):
    """End-to-end fit() with K=2 on the 8-device mesh: the dispatch iterator
    stacks full groups, falls back to single steps for the odd tail, and the
    step count comes out exact."""
    import os
    import tempfile

    from dune_transformercvn_tpu.data.schema import make_synthetic_file
    from dune_transformercvn_tpu.train import Trainer

    options = tiny_options(steps_per_dispatch=2)
    options.num_gpu = 8
    options.batch_size = 1
    options.epochs = 10
    options.eval_interval = 4
    options.train_validation_split = 0.8
    options.verbose_output = False

    path = os.path.join(tempfile.gettempdir(), "multistep_fit.h5")
    if not os.path.exists(path):
        make_synthetic_file(path, num_events=45, seed=1)
    options.training_file = path

    trainer = Trainer(options, run_dir=str(tmp_path), debug=True)
    assert trainer.steps_per_dispatch == 2
    metrics = trainer.fit(max_steps=5)  # 2 stacked dispatches + 1 single tail
    assert int(trainer.state.step) == 5
    assert np.isfinite(metrics["val_epoch_AUC"])
