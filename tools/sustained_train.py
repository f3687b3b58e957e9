#!/usr/bin/env python
"""Sustained end-to-end training measurement + learning demonstration.

VERDICT r2 items 3 and 10 in one protocol: run several hundred REAL
training steps at the production dense config (the BASELINE.md north-star
shape) through the full `Trainer.fit` path — host batch assembly, H2D
transfer, jitted step, periodic validation with streaming metrics and
async checkpointing — on a class-correlated synthetic set large enough
that the model measurably learns (the role the reference's
fdhd_beam_2018prod file plays in Evaluate.ipynb's training-history cells
3-5).

Records two things the step-level benchmarks cannot see:

* steady-state events/second INCLUDING the 1-core host feed (compared
  against bench.py's compute-only number — if the host cannot keep the
  chip busy, this is where it shows), from the loop's own 10-step
  `events_per_second` windows;
* the `val_epoch_AUC` curve, which must climb well above 0.5 — a guard
  against silent learning-dynamics bugs (RNG folding, BN momentum,
  schedule wiring) that single-step golden tests cannot catch.

Writes artifacts/sustained_train_v5e.json (overwriting the stale round-2
measurement taken before the fast-PRNG and Pallas-densify wins).

Usage:  python tools/sustained_train.py [--steps 400] [--events 6000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--events", type=int, default=6000)
    parser.add_argument("--eval_interval", type=int, default=80)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "sustained_train_v5e.json"))
    args = parser.parse_args()

    import jax

    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data.schema import make_synthetic_file
    from dune_transformercvn_tpu.train.loop import Trainer

    workdir = tempfile.mkdtemp(prefix="sustained_")
    data_path = os.path.join(workdir, "train.h5")
    print(f"# generating {args.events} synthetic events ...", flush=True)
    make_synthetic_file(data_path, num_events=args.events, seed=11)

    options = Options.load(os.path.join(
        REPO, "option_files", "fdhd_beam_2018prod_2023_08_07.json"))
    options.training_file = data_path
    options.batch_size = args.batch_size
    options.epochs = 1000  # bounded by max_steps
    options.eval_interval = args.eval_interval
    options.verbose_output = True

    t0 = time.time()
    trainer = Trainer(options, name="sustained", log_dir=workdir)
    build_s = time.time() - t0
    print(f"# trainer built in {build_s:.1f}s; run dir {trainer.run_dir}",
          flush=True)

    t0 = time.time()
    last = trainer.fit(max_steps=args.steps)
    wall = time.time() - t0

    # Parse the loop's own windowed throughput + the AUC curve back out of
    # the run's metrics.jsonl (exactly what TB shows a production user).
    windows, auc_curve, eval_steps = [], [], set()
    with open(os.path.join(trainer.run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "events_per_second" in rec:
                windows.append(
                    {"step": rec["step"],
                     "events_per_second": round(rec["events_per_second"], 2)})
            if "val_epoch_AUC" in rec:
                eval_steps.add(rec["step"])
                auc_curve.append(
                    {"step": rec["step"],
                     "val_epoch_AUC": round(rec["val_epoch_AUC"], 4)})

    # Steady state: the median of the CLEAN second-half windows — windows
    # whose step span contains no validation (a validation+checkpoint pause
    # lands inside the window that follows it) and that come after the
    # first-window jit compiles.
    prev = [0] + [w["step"] for w in windows[:-1]]
    clean = [
        w["events_per_second"]
        for w, p in zip(windows, prev)
        if not any(p <= e < w["step"] for e in eval_steps)
    ]
    tail = sorted(clean[len(clean) // 2:] or
                  [w["events_per_second"] for w in windows[len(windows) // 2:]])
    steady = tail[len(tail) // 2] if tail else float("nan")

    record = {
        "bench": "sustained_train",
        "device": str(jax.devices()[0]),
        "config": (
            f"production fdhd dense, batch {args.batch_size}, bf16, "
            f"Trainer.fit end-to-end (host assembly + H2D + step + "
            f"validation + async checkpoints)"),
        "steps": args.steps,
        "events": args.events,
        "wall_s": round(wall, 1),
        "window_events_per_second": windows,
        "steady_state_events_per_second": steady,
        "final_val_epoch_AUC": round(last.get("val_epoch_AUC", 0.0), 4),
        "val_auc_curve": auc_curve,
        "note": (
            "windows are the training loop's own events_per_second logs "
            "(every log_every_n_steps=50 steps, lagged device-fetch "
            "sync); steady_state is the median of validation-free "
            "second-half windows; compare against bench.py's "
            "compute-only train_b16_events_per_second"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items()
                      if k != "window_events_per_second"}, indent=1))
    print(f"# artifact -> {args.out}")


if __name__ == "__main__":
    main()
