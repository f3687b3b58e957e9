"""EXECUTING multi-host coverage: 2 real processes x 4 virtual CPU devices.

tests/test_multihost.py pins the pure rank->rows math; this test actually
runs the multi-process code paths — ``jax.distributed.initialize``,
``make_array_from_process_local_data`` placement (``Trainer._device_batch``),
the stacked dispatch placement (``_device_stacked``), psum'd validation
metrics, and ``predict_split``'s ``process_allgather`` — and asserts the
2-process run matches a single-process 8-device run bit-for-bit-ish
(identical mesh, identical deterministic batches; only collective op
ordering may differ).

Two topologies run: pure DP8 (the reference's DDP analog, train.py:40,
123-127) and hybrid DP4xTP2 with host-local TP groups — each process owns
two whole TP rows, so the same host-local feeding path serves both (the
multi-host tensor-parallel configuration PARITY §2.3 claims).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO_DIR = os.path.dirname(TESTS_DIR)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _options_dict(path):
    return {
        # tiny architecture (compiles fast on the 1-core host)
        "hidden_dim": 32, "densenet_structure": [1], "densenet_growth_rate": 8,
        "densenet_batch_norm_size": 4, "initial_pixel_dim": 8,
        "pixel_embedding_dim": 16, "feature_embedding_dim": 8,
        "position_embedding_dim": 8, "num_encoder_layers": 1,
        "num_attention_heads": 4, "num_prong_decoder_layers": 1,
        "dropout": 0.0, "pixel_noise_std": 0.0,
        "disable_smart_features": True,
        "compute_dtype": "float32",
        # data / training
        "training_file": path,
        "event_current_targets": True,
        "train_validation_split": 0.75,
        "batch_size": 2,               # per-device -> global batch 16 (DP8)
        "num_gpu": 8,
        "epochs": 2,
        "optimizer": "AdamW",
        "learning_rate": 1e-3,
        "gradient_clip": 1.0,
        "learning_rate_cycles": 1,
        "learning_rate_warmup_epochs": 0,
        "num_dataloader_workers": 1,
        "static_batch_shapes": 1,      # same batch shapes in both runs
        "sync_batch_norm": 1,
        "seed": 3,
    }


def _run_two_process(tmp_path, options, tag):
    """Launch the 2x4-device distributed run; return its result record."""
    options_path = str(tmp_path / f"options_{tag}.json")
    with open(options_path, "w") as f:
        json.dump(options, f)
    port = _free_port()
    coordinator = f"localhost:{port}"
    out_path = str(tmp_path / f"mh_out_{tag}.json")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # worker sets its own 4-device flag
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO_DIR + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, "_multihost_worker.py"),
             coordinator, "2", str(pid), options_path, out_path],
            env=env, cwd=REPO_DIR,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    with open(out_path) as f:
        return json.load(f), options_path


def _single_process_reference(options_path, dp_shards):
    """Run the identical trajectory on a single-process 8-device mesh."""
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.train.loop import Trainer
    import jax

    options = Options.load(options_path)
    trainer = Trainer(options, debug=True, verbose=False)
    assert not trainer.multi_process and trainer.num_shards == dp_shards

    losses = []
    state = trainer.state
    for step in range(4):
        idxs = np.arange(trainer.global_batch) + step * trainer.global_batch
        idxs = idxs % len(trainer.training_dataset)
        batch = trainer._device_batch(trainer.train_batcher.build_batch(idxs))
        state, metrics = trainer._single_step()(state, batch)
        losses.append(float(jax.device_get(metrics["train_loss"])))
    trainer.state = state
    val = trainer.validate()
    pred = trainer.predict_split("validation")
    return trainer, state, losses, val, pred


def _compare(multi, state, losses, val, pred):
    import jax

    np.testing.assert_allclose(losses, multi["losses"], rtol=1e-5, atol=1e-7)
    stats_l1 = float(
        sum(np.abs(np.asarray(x)).sum()
            for x in jax.tree_util.tree_leaves(
                jax.device_get(state.batch_stats)))
    )
    np.testing.assert_allclose(stats_l1, multi["stats_l1"], rtol=1e-3)
    # Cross-host gloo psum orders reductions differently from the
    # single-process XLA all-reduce; the ~1e-7 per-step gradient noise
    # amplifies chaotically through 4 optimizer steps (the measured growth
    # in tests/test_trajectory_parity.py), so post-training eval numbers
    # carry a few-e-4 relative drift.  Step-1's loss matching at 1e-5 above
    # is the strict placement-correctness signal.
    np.testing.assert_allclose(
        float(val["val_loss"]), multi["val_loss"], rtol=5e-3
    )
    # the histogram AUC is additionally discontinuous at bin edges: fp noise
    # can flip a score's bin, worth O(1%) on a 16-event split
    np.testing.assert_allclose(
        float(val["val_epoch_AUC"]), multi["val_epoch_AUC"], atol=0.02
    )
    params_l1 = {
        k: float(sum(np.abs(np.asarray(x)).sum()
                     for x in jax.tree_util.tree_leaves(v)))
        for k, v in jax.device_get(state.params).items()
    }
    for key, value in multi["params_l1"].items():
        np.testing.assert_allclose(
            params_l1[key], value, rtol=1e-3,
            err_msg=f"params diverged at {key}",
        )
    assert (
        list(pred["event_probabilities"].shape)
        == multi["event_scores_shape"]
    )
    np.testing.assert_allclose(
        float(pred["event_probabilities"].sum()),
        multi["event_scores_sum"], rtol=1e-3,
    )
    np.testing.assert_allclose(
        float(pred["prong_probabilities"].sum()),
        multi["prong_scores_sum"], rtol=1e-3,
    )


def test_two_process_run_matches_single_process(tmp_path):
    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    data = str(tmp_path / "mh.h5")
    make_synthetic_file(data, num_events=64, mean_hits_per_image=40.0, seed=5)
    multi, options_path = _run_two_process(
        tmp_path, _options_dict(data), tag="dp8"
    )
    _, state, losses, val, pred = _single_process_reference(
        options_path, dp_shards=8
    )
    _compare(multi, state, losses, val, pred)


def test_two_process_hybrid_tp_matches_single_process(tmp_path):
    """DP4xTP2 across 2 processes: each process hosts two whole TP rows
    (create_mesh's host-local TP grouping), so host-local feeding serves the
    hybrid mesh unchanged while GSPMD partitions the channel-sharded params
    within each host."""
    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    data = str(tmp_path / "mh_tp.h5")
    make_synthetic_file(data, num_events=64, mean_hits_per_image=40.0, seed=5)
    options = _options_dict(data)
    options["model_parallel"] = 2
    options["batch_size"] = 4      # per-shard -> global batch 16 (DP4)
    multi, options_path = _run_two_process(tmp_path, options, tag="dp4tp2")
    _, state, losses, val, pred = _single_process_reference(
        options_path, dp_shards=4
    )
    _compare(multi, state, losses, val, pred)
