#!/usr/bin/env python
"""Quality-parity harness: train BOTH frameworks on the same file and diff
their validation metrics (the BASELINE.json north star: event+prong AUC and
confusion matrices agree to 1e-3 when trained with the same option file).

This sandbox cannot run the reference (no MinkowskiEngine/Lightning GPU
stack), so this script is the one-command recipe for a machine that can:

    python tools/parity_run.py \
        --data  /path/to/fdhd_beam_2018prod.h5 \
        --options option_files/fdhd_beam_2018prod_aiml_tutorial_2025_04_21.json \
        --steps 2000 --reference /root/reference --workdir /tmp/parity

Stages (each skippable if its artifact already exists):
  1. ours:  train.py --max_steps N  -> run dir + checkpoints
  2. ours:  evaluate.py             -> eval_predictions.h5 + metrics
  3. ref:   <reference>/train.py with the same options (subprocess; needs
            the reference's torch/Lightning/ME environment)
  4. ref:   batched torch inference over the SAME validation split using the
            reference's own network + checkpoint (mirrors Evaluate.ipynb
            cell 14), scored with OUR exact rank-statistic AUC/confusion
            (dune_transformercvn_tpu.evaluation), so both frameworks are
            measured by one yardstick.
  5. diff:  print both metric tables and the deltas; exit non-zero if
            --fail_above is exceeded.

See tools/parity_run.md for environment requirements and caveats.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

# The harness is invoked as tools/parity_run.py, so the repo root is
# neither sys.path[0] (the script's dir) nor implicitly importable; the
# subprocess stages likewise need absolute CLI paths.
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sh(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, **kw)


def version_key(name):
    # version_10 must sort after version_9 (lexical order breaks at 10+)
    tail = name.rsplit("_", 1)[-1]
    return (int(tail), name) if tail.isdigit() else (-1, name)


def train_ours(args):
    run_root = os.path.join(args.workdir, "ours")
    if not os.path.isdir(run_root):
        sh([
            sys.executable, os.path.join(REPO, "train.py"),
            "-o", args.options, "-n", "parity", "-l", run_root,
            "--max_steps", str(args.steps), "-v",
            "--training_file", args.data,
        ])
    versions = sorted(
        os.listdir(os.path.join(run_root, "parity")), key=version_key
    )
    return os.path.join(run_root, "parity", versions[-1])


def eval_ours(args, run_dir):
    out = os.path.join(run_dir, "eval_predictions.h5")
    if not os.path.exists(out):
        sh([sys.executable, os.path.join(REPO, "evaluate.py"), run_dir,
            "--checkpoint", "last"])
    import h5py

    with h5py.File(out, "r") as f:
        return {k: f[k][...] for k in f.keys()}


def train_reference(args):
    """Run the reference trainer in ITS OWN environment (torch+Lightning+ME).

    The reference CLI (reference train.py:154-202) takes the same option
    file; --name/--log_dir place the lightning_logs where we expect.
    """
    log_dir = os.path.join(args.workdir, "reference")
    if not os.path.isdir(log_dir):
        env = dict(os.environ)
        sh([
            args.reference_python, os.path.join(args.reference, "train.py"),
            "--options_file", args.options,
            "--training_file", args.data,
            "--name", "parity",
            "--log_dir", log_dir,
        ], cwd=args.reference, env=env)
    # newest version dir's newest checkpoint (numeric/mtime, not lexical:
    # version_10 sorts before version_9 lexically)
    base = os.path.join(log_dir, "parity")
    version = sorted(os.listdir(base), key=version_key)[-1]
    ckpts = os.path.join(base, version, "checkpoints")
    ckpt = max(
        os.listdir(ckpts),
        key=lambda n: os.path.getmtime(os.path.join(ckpts, n)),
    )
    return os.path.join(ckpts, ckpt)


def eval_reference(args, ckpt_path):
    """Batched torch inference over the validation split with the reference
    network (Evaluate.ipynb cells 9-14: trainer.load_from_checkpoint +
    shared_step over val_dataloader), returning the same prediction arrays
    our evaluate.py writes (reference neutrino_full_base_trainer.py:194-210
    is the masking recipe replicated here)."""
    import numpy as np
    import torch

    sys.path.insert(0, args.reference)
    from transformercvn.network.trainers.neutrino_full_dense_trainer import (
        NeutrinoFullDenseTrainer,
    )
    from transformercvn.options import Options as RefOptions

    options = RefOptions()
    options.update_options(json.load(open(args.options)))
    options.training_file = args.data
    model = NeutrinoFullDenseTrainer.load_from_checkpoint(
        ckpt_path, options=options, map_location="cpu"
    ).eval()

    ev_p, ev_t, pr_p, pr_t, pr_e = [], [], [], [], []
    seen = 0
    with torch.no_grad():
        for batch in model.val_dataloader():
            event_targets, prong_targets, event_logits, prong_logits = (
                model.shared_step(batch)
            )
            mask = (prong_targets >= 0).numpy()
            ev_p.append(torch.softmax(event_logits, -1).numpy())
            ev_t.append(event_targets.numpy())
            pr_p.append(torch.softmax(prong_logits, -1).numpy()[mask])
            pr_t.append(prong_targets.numpy()[mask])
            # one entry PER KEPT PRONG (row order matches the [mask] gathers
            # above) — nonzero over the 2-D mask yields each prong's event row
            rows = np.nonzero(mask)[0] + seen
            pr_e.append(rows)
            seen += event_logits.shape[0]
    return {
        "event_probabilities": np.concatenate(ev_p),
        "event_targets": np.concatenate(ev_t),
        "prong_probabilities": np.concatenate(pr_p),
        "prong_targets": np.concatenate(pr_t),
        "prong_event_index": np.concatenate(pr_e),
    }


def score(preds):
    from dune_transformercvn_tpu.evaluation import evaluate_predictions

    return evaluate_predictions(
        preds["event_probabilities"], preds["event_targets"],
        preds["prong_probabilities"], preds["prong_targets"],
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True, help="fdhd HDF5 file")
    ap.add_argument("--options", required=True, help="shared option file")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--reference_python", default=sys.executable,
                    help="python of the env that can run the reference "
                         "(torch + Lightning + MinkowskiEngine)")
    ap.add_argument("--workdir", default="/tmp/parity_run")
    ap.add_argument("--fail_above", type=float, default=1e-3,
                    help="max |delta AUC| tolerated (BASELINE.json bar)")
    ap.add_argument("--ours_only", action="store_true",
                    help="run stages 1-2 only (smoke mode for this sandbox)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    run_dir = train_ours(args)
    ours = score(eval_ours(args, run_dir))
    print("\n== ours ==")
    print(json.dumps({k: v for k, v in ours.items() if np.isscalar(v)}, indent=2,
                     default=float))
    if args.ours_only:
        return

    ckpt = train_reference(args)
    ref = score(eval_reference(args, ckpt))
    print("\n== reference ==")
    print(json.dumps({k: v for k, v in ref.items() if np.isscalar(v)}, indent=2,
                     default=float))

    deltas = {
        k: abs(float(ours[k]) - float(ref[k]))
        for k in ours
        if np.isscalar(ours.get(k)) and np.isscalar(ref.get(k))
    }
    print("\n== |delta| ==")
    print(json.dumps(deltas, indent=2, default=float))
    worst = max(
        (v for k, v in deltas.items() if "auc" in k.lower()), default=0.0
    )
    if worst > args.fail_above:
        print(f"FAIL: worst AUC delta {worst:.5f} > {args.fail_above}")
        sys.exit(1)
    print(f"OK: worst AUC delta {worst:.5f} <= {args.fail_above}")


if __name__ == "__main__":
    main()
