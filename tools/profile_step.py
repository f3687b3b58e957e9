#!/usr/bin/env python
"""Profile the production train step and break device time down by op class.

Runs N steps of the jitted train step at one or more batch sizes, captures a
``jax.profiler`` trace, and aggregates the device's **XLA Ops** lane (the
per-op timeline; the ``Steps``/``XLA Modules`` lanes duplicate the same
wall-time at coarser granularity and must not be summed with it).

Used to attribute the b16-vs-b64 per-event throughput gap and to measure
byte-level experiments (VERDICT r2 items 4 and 5).  Writes
``/tmp/profile_step_b{N}.json`` per batch size and prints a summary.

Usage:  python tools/profile_step.py [--batch-sizes 16,64] [--steps 8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def classify(name: str) -> str:
    n = name.lower()
    if "conv" in n:
        return "conv-fusion"
    if n.startswith("copy") or "transpose" in n:
        return "copy/transpose"
    if "dot" in n or "matmul" in n:
        return "matmul"
    if "scatter" in n:
        return "scatter"
    if "custom-call" in n or "pallas" in n:
        return "pallas/custom"
    if "rng" in n or "threefry" in n or "rbg" in n:
        return "rng"
    if "reduce" in n:
        return "reduce"
    return "elementwise/other"


def device_op_times(tracedir: str) -> dict:
    """Per-op durations (seconds) from the device's XLA Ops lane."""
    return {k: v["dur"] for k, v in device_op_stats(tracedir).items()}


def device_op_stats(tracedir: str) -> dict:
    """Per-op stats from the device's XLA Ops lane.

    Returns ``{name: {dur (s), bytes (accessed), flops, category,
    long_name}}``.  ``hlo_category`` (from the compiler, e.g. "convolution
    fusion") is far more reliable than guessing from op names — most big
    ops are just "fusion.N"; ``bytes_accessed`` enables per-op
    achieved-bandwidth (roofline) attribution; ``flops`` is XLA's own
    ``model_flops`` cost analysis (summed over occurrences, like ``dur``);
    ``long_name`` is the HLO instruction text with operand shapes AND
    layouts/memory spaces, which conv_bw_study.py parses for physical
    byte counts.
    """
    files = sorted(glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise RuntimeError(f"no trace files under {tracedir}")
    data = json.load(gzip.open(files[-1]))
    ev = data.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in ev:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    lanes = {
        (p, t) for (p, t), n in tid_names.items()
        if n == "XLA Ops" and "TPU" in pid_names.get(p, "")
    }
    stats: dict = {}
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in lanes:
            name = e.get("name", "")
            args = e.get("args") or {}
            s = stats.setdefault(
                name,
                {"dur": 0.0, "bytes": 0, "flops": 0, "category": "",
                 "long_name": "", "occurrences": 0,
                 "long_name_truncated": False},
            )
            s["dur"] += e.get("dur", 0) / 1e6
            s["bytes"] += int(args.get("bytes_accessed", 0) or 0)
            s["flops"] += int(args.get("model_flops", 0) or 0)
            s["occurrences"] += 1
            if not s["category"]:
                s["category"] = args.get("hlo_category", "")
                full = args.get("long_name", "")
                s["long_name"] = full[:4000]
                # conv_bw_study parses operand shapes out of long_name; a
                # truncated one silently loses operands, so flag it and let
                # downstream mark the row as partially modeled.
                s["long_name_truncated"] = len(full) > 4000
    return stats


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-sizes", default="16,64")
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--events", type=int, default=192)
    parser.add_argument("--top", type=int, default=12)
    parser.add_argument("--embedder", default="dense")
    parser.add_argument("--chunk", type=int, default=0,
                        help="Options.embedder_chunk (sdxl: 16 is the only "
                             "recipe that fits training on one chip)")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from dune_transformercvn_tpu.utils.cache import (
        enable_compile_cache, enable_fast_prng,
    )
    enable_compile_cache()
    enable_fast_prng()
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data.batcher import Batcher
    from dune_transformercvn_tpu.parallel.mesh import create_mesh
    from dune_transformercvn_tpu.train import schedules
    from dune_transformercvn_tpu.train.optimizer import create_optimizer
    from dune_transformercvn_tpu.train.state import create_train_state
    from dune_transformercvn_tpu.train.step import make_train_step
    from __graft_entry__ import _synthetic_setup
    from bench import _fetch_scalar

    options = Options.load(os.path.join(
        REPO, "option_files", "fdhd_beam_2018prod_2023_08_07.json"))
    options.compute_dtype = "bfloat16"
    if args.chunk:
        options.embedder_chunk = args.chunk
    dataset, _, _, model, norm = _synthetic_setup(
        options, num_events=args.events, embedder=args.embedder)
    norm = {k: jnp.asarray(v) for k, v in norm.items()}
    mesh = create_mesh(1)
    schedule = schedules.from_options(options, steps_per_epoch=100)
    tx = create_optimizer(options, schedule)

    state0 = None
    for bsz in (int(b) for b in args.batch_sizes.split(",")):
        b = Batcher(dataset, batch_size=bsz,
                    coo_granularity=options.coo_bucket_granularity)
        batch = {k: jnp.asarray(v)
                 for k, v in b.build_batch(np.arange(bsz)).items()}
        options.batch_size = bsz
        if state0 is None:
            state0 = create_train_state(model, tx, batch, norm, seed=0)
        step = make_train_step(
            model, tx, options, mesh, steps_per_dispatch=1,
        ).lower(state0, batch).compile()
        # the step donates its state argument; keep state0 alive across sizes
        state, warm = step(jax.tree_util.tree_map(jnp.copy, state0), batch)
        _fetch_scalar(warm["train_loss"])

        tracedir = f"/tmp/prof_b{bsz}"
        shutil.rmtree(tracedir, ignore_errors=True)
        jax.profiler.start_trace(tracedir)
        m = None
        for _ in range(args.steps):
            state, m = step(state, batch)
        _fetch_scalar(m["train_loss"])
        jax.profiler.stop_trace()

        stats = device_op_stats(tracedir)
        agg = defaultdict(float)
        for k, v in stats.items():
            agg[v["category"] or classify(k)] += v["dur"]
        total = sum(v["dur"] for v in stats.values())
        n_ev = args.steps * bsz
        print(f"\n=== b{bsz}: device busy {total:.3f}s / {args.steps} steps "
              f"({total / args.steps * 1e3:.1f} ms/step, "
              f"{total / n_ev * 1e6:.1f} us/event) ===")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
            print(f"  {k:<24} {v / args.steps * 1e3:8.2f} ms/step "
                  f"{v / n_ev * 1e6:8.1f} us/ev  ({100 * v / total:4.1f}%)")
        print(f"  top-{args.top} ops (GB/s = bytes_accessed / device time):")
        ranked = sorted(stats.items(), key=lambda kv: -kv[1]["dur"])
        for k, v in ranked[:args.top]:
            bw = v["bytes"] / v["dur"] / 1e9 if v["dur"] else 0.0
            print(f"    {v['dur'] / n_ev * 1e6:8.1f} us/ev {bw:7.0f} GB/s "
                  f"[{v['category']:<22}] {k[:60]}")
            print(f"        {v['long_name'][:150]}")
        json.dump(
            {"stats": stats, "steps": args.steps, "bsz": bsz},
            open(f"/tmp/profile_step_b{bsz}.json", "w"))


if __name__ == "__main__":
    main()
