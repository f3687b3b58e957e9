"""Worker process for the multi-host execution test.

Launched by tests/test_multihost_exec.py as 2 processes x 4 virtual CPU
devices each.  Builds the REAL Trainer over the 8-device global mesh, runs a
few training steps (exercising ``make_array_from_process_local_data`` /
``_device_batch`` / ``_device_stacked``) plus ``predict_split`` (exercising
the cross-process allgather), and dumps results from process 0.

Usage: python _multihost_worker.py <coordinator> <num_procs> <proc_id> \
          <options.json> <out.json>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, num_procs, proc_id, options_path, out_path = sys.argv[1:6]
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_procs),
        process_id=int(proc_id),
    )
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np

    # Establish the Gloo communicator for the full 8-device clique NOW,
    # while the two processes are still in lock-step (nothing heavy has run
    # yet).  Gloo's key-value exchange at context init has a hard 30 s
    # deadline; on this 1-core host the train-step compiles of the two
    # workers serialize, so the first *training* collective can be reached
    # >30 s apart and time out.  A trivial all-process allgather compiles in
    # ~1 s on both workers and caches the context for every later collective.
    from jax.experimental import multihost_utils

    multihost_utils.process_allgather(np.zeros((1,), np.float32))

    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.train.loop import Trainer

    options = Options.load(options_path)
    trainer = Trainer(options, debug=True, verbose=False)
    mp = max(1, int(options.model_parallel))
    assert trainer.multi_process and trainer.num_shards == 8 // mp

    # Host-local assembly (Batcher local_shards): this host's batches must
    # be BIT-equal to the local slice of a full-assembly batch — the
    # correctness contract that lets per-host work stay O(local batch).
    from dune_transformercvn_tpu.parallel.mesh import local_batch_rows

    batcher = trainer.train_batcher
    assert batcher.local_shards == sorted(trainer._local_shards)
    check_idxs = np.arange(trainer.global_batch)
    full = batcher.build_batch(check_idxs, shards=range(trainer.num_shards))
    local = batcher.build_batch(check_idxs)  # constructor local_shards
    for key in full:
        want = local_batch_rows(
            full[key], trainer.num_shards, batcher.local_shards
        )
        assert np.array_equal(local[key], want), (
            f"host-local assembly diverges from full assembly on {key}"
        )

    losses = []
    state = trainer.state
    for step in range(4):
        idxs = np.arange(trainer.global_batch) + step * trainer.global_batch
        idxs = idxs % len(trainer.training_dataset)
        batch = trainer._device_batch(batcher.build_batch(idxs))
        state, metrics = trainer._single_step()(state, batch)
        losses.append(float(jax.device_get(metrics["train_loss"])))
    trainer.state = state

    # the stacked (steps_per_dispatch) placement path
    group = [
        batcher.build_batch(
            (np.arange(trainer.global_batch) + k * trainer.global_batch)
            % len(trainer.training_dataset)
        )
        for k in (4, 5)
    ]
    stacked = trainer._device_stacked(group)
    assert stacked["features"].shape[0] == 2

    # validation (psum'd metric statistics across hosts)
    val = trainer.validate()

    # predict_split: per-event scores via cross-process allgather
    pred = trainer.predict_split("validation")
    event_scores = pred["event_probabilities"]
    prong_scores = pred["prong_probabilities"]

    if int(proc_id) == 0:
        stats_l1 = float(
            sum(np.abs(np.asarray(x)).sum()
                for x in jax.tree_util.tree_leaves(
                    jax.device_get(state.batch_stats)))
        )
        params_l1 = {
            k: float(
                sum(np.abs(np.asarray(x)).sum()
                    for x in jax.tree_util.tree_leaves(v))
            )
            for k, v in jax.device_get(state.params).items()
        }
        with open(out_path, "w") as f:
            json.dump({
                "losses": losses,
                "stats_l1": stats_l1,
                "val_epoch_AUC": float(val["val_epoch_AUC"]),
                "val_loss": float(val.get("val_loss", 0.0)),
                "params_l1": params_l1,
                "event_scores_sum": float(np.asarray(event_scores).sum()),
                "event_scores_shape": list(np.asarray(event_scores).shape),
                "prong_scores_sum": float(np.asarray(prong_scores).sum()),
            }, f)
    # all processes must stay alive until the collectives complete
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
