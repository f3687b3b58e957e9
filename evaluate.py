#!/usr/bin/env python
"""Evaluation CLI: the reference Evaluate.ipynb as a command.

    python evaluate.py <run_dir> [--checkpoint best|last|<path>]
                       [--split validation|testing] [--testing_file f.h5]
                       [--output eval_predictions.h5] [--history]

Loads the run's resolved ``options.json`` (Evaluate.ipynb cell 9 flow),
rebuilds the model/datasets, restores the requested checkpoint, runs batched
inference over the split, writes ``eval_predictions.h5``, and prints
accuracy / precision / recall / weighted-OVR ROC-AUC (overall and per class)
plus confusion matrices.  ``--history`` prints the logged training scalars
(the notebook's "Training History" half).
"""

from __future__ import annotations

import os
from argparse import ArgumentParser


def main():
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("run_dir", help="training run directory (version_N)")
    parser.add_argument("--checkpoint", default="best",
                        help="'best', 'last', or an explicit checkpoint path")
    parser.add_argument("--split", default="validation",
                        choices=["training", "validation", "testing"])
    parser.add_argument("--testing_file", default=None,
                        help="evaluate this file as the testing split")
    parser.add_argument("--output", default=None,
                        help="predictions h5 path (default <run_dir>/eval_predictions.h5)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--history", action="store_true",
                        help="print the logged training history and exit")
    parser.add_argument("--plots", action="store_true",
                        help="write ROC-curve and confusion-matrix PNGs")
    args = parser.parse_args()

    from dune_transformercvn_tpu.train.logging import read_history

    if args.history:
        history = read_history(args.run_dir)
        for tag, series in sorted(history.items()):
            last_step, last_val = series[-1]
            print(f"{tag:32} {len(series):6d} points, last @ {last_step}: {last_val:.6f}")
        return

    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data.schema import EVENT_CLASS_NAMES, PRONG_CLASS_NAMES
    from dune_transformercvn_tpu.evaluation import (
        evaluate_predictions,
        render_report,
        save_predictions_h5,
    )
    from dune_transformercvn_tpu.train import Trainer

    options = Options.load(os.path.join(args.run_dir, "options.json"))
    if args.testing_file:
        options.testing_file = args.testing_file
        args.split = "testing"
    if args.batch_size:
        options.batch_size = args.batch_size

    trainer = Trainer(options, run_dir=None, debug=True, verbose=False)

    ckpt_dir = os.path.join(args.run_dir, "checkpoints")
    if args.checkpoint in ("best", "last"):
        from dune_transformercvn_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir, top_k=options.checkpoint_top_k)
        step = mgr.best_step() if args.checkpoint == "best" else mgr.latest_step()
        if args.checkpoint == "best" and step is None:
            print(
                "WARNING: no ranked checkpoint (run never completed a "
                "validation pass?) — falling back to the LATEST checkpoint"
            )
        print(f"Restoring {args.checkpoint} checkpoint: step {step}")
        import jax

        trainer.state = jax.device_put(
            mgr.restore(jax.device_get(trainer.state), step), trainer.state_sharding
        )
    else:
        trainer.resume(args.checkpoint)

    predictions = trainer.predict_split(args.split)

    # key on the model's output width, not on which targets happen to occur
    # in this split (a detailed model evaluated on a coarse-only sample must
    # still get per-class rows for all of its columns)
    detailed = (
        predictions["event_probabilities"].shape[1] != len(EVENT_CLASS_NAMES)
    )
    event_names = (
        [f"class_{i}" for i in range(predictions["event_probabilities"].shape[1])]
        if detailed else EVENT_CLASS_NAMES
    )
    results = evaluate_predictions(
        predictions["event_probabilities"], predictions["event_targets"],
        predictions["prong_probabilities"], predictions["prong_targets"],
    )
    print(render_report(results, event_names, PRONG_CLASS_NAMES))

    # write the (expensive) predictions before any plotting can fail
    output = args.output or os.path.join(args.run_dir, "eval_predictions.h5")
    save_predictions_h5(
        output,
        predictions["event_probabilities"], predictions["event_targets"],
        predictions["prong_probabilities"], predictions["prong_targets"],
        predictions["prong_event_index"],
    )
    print(f"Predictions written to {output}")

    if args.plots:
        from dune_transformercvn_tpu.evaluation import save_plots

        written = save_plots(
            os.path.join(args.run_dir, "plots"),
            predictions["event_probabilities"], predictions["event_targets"],
            predictions["prong_probabilities"], predictions["prong_targets"],
            event_names, PRONG_CLASS_NAMES,
        )
        for path in written:
            print(f"Plot written: {path}")


if __name__ == "__main__":
    main()
