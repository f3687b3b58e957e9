#!/usr/bin/env python
"""Smoke-prove the quality-parity runbook's "ours" stages at the current HEAD.

VERDICT r3 item 8: ``tools/parity_run.py`` is the one-command recipe for the
real-data parity bar (BASELINE.md north star), but its stages bit-rot as CLI
surfaces change.  This driver re-executes stages 1-2 (train_ours, eval_ours,
score) end-to-end on a synthetic file and records the result in
``artifacts/parity_run_smoke.json`` stamped with the git HEAD, so each round
re-proves the harness still runs.  Stages 3-5 need the reference
torch/Lightning/ME environment (tools/parity_run.md).

    python tools/parity_smoke.py [--steps 12] [--events 257]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Trimmed topology: the smoke proves plumbing, not quality, and the 1-core
# sandbox pays ~3 s/op eagerly — keep the graph small so train+eval finish
# in minutes.
TINY_OVERRIDES = {
    "hidden_dim": 32,
    "initial_pixel_dim": 16,
    "pixel_embedding_dim": 32,
    "feature_embedding_dim": 16,
    "position_embedding_dim": 8,
    "final_decoder_dim": 8,
    "num_encoder_layers": 2,
    "num_prong_decoder_layers": 2,
    "num_attention_heads": 4,
    "densenet_structure": [1, 1],
    "densenet_growth_rate": 8,
    "batch_size": 4,
    "epochs": 1,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--events", type=int, default=257)
    ap.add_argument("--workdir", default="")
    args = ap.parse_args()

    workdir = args.workdir or tempfile.mkdtemp(prefix="parity_smoke_")
    shutil.rmtree(os.path.join(workdir, "ours"), ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)

    from dune_transformercvn_tpu.data.schema import make_synthetic_file

    data = os.path.join(workdir, "synthetic.h5")
    if not os.path.exists(data):
        make_synthetic_file(data, num_events=args.events, seed=7)

    with open(os.path.join(
            REPO, "option_files",
            "fdhd_beam_2018prod_aiml_tutorial_2025_04_21.json")) as f:
        opts = json.load(f)
    opts.update(TINY_OVERRIDES)
    options = os.path.join(workdir, "tiny_options.json")
    with open(options, "w") as f:
        json.dump(opts, f, indent=1)

    cmd = [
        sys.executable, os.path.join(REPO, "tools", "parity_run.py"),
        "--data", data, "--options", options,
        "--steps", str(args.steps), "--workdir", workdir, "--ours_only",
    ]
    print("+", " ".join(cmd), file=sys.stderr, flush=True)
    proc = subprocess.run(cmd, capture_output=True, text=True)
    sys.stderr.write(proc.stderr[-2000:])
    sys.stderr.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        print(f"SMOKE FAILED rc={proc.returncode}", file=sys.stderr)
        sys.exit(proc.returncode)

    m = re.search(r"== ours ==\s*(\{.*?\})", proc.stdout, re.S)
    metrics = json.loads(m.group(1)) if m else {}
    head = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True).stdout.strip()

    record = {
        "bench": "parity_run_ours_stages_smoke",
        "git_head": head,
        "command": ("python tools/parity_smoke.py "
                    f"--steps {args.steps} --events {args.events}"),
        "stages_executed": [
            f"train_ours (train.py --max_steps {args.steps})",
            "eval_ours (evaluate.py --checkpoint last)",
            "score (evaluation.evaluate_predictions)",
        ],
        "ours_metrics": {
            k: round(float(v), 4) for k, v in metrics.items()
            if isinstance(v, (int, float))
        },
        "note": ("proves the quality-parity harness plumbing at this HEAD; "
                 "stages 3-5 need the reference torch/Lightning/ME stack "
                 "(tools/parity_run.md) and remain environment-blocked — "
                 "see BASELINE.md's two unmet bars"),
    }
    out = os.path.join(REPO, "artifacts", "parity_run_smoke.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    print(f"# artifact -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
