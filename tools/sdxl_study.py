#!/usr/bin/env python
"""SDXL family optimization study (VERDICT r4 item 2).

The SDXL embedder (the LArSoft production architecture, reference
sdxl_net.py:7-42) trains at 27.5 ev/s b16 / 34.5 ev/s b64 — 5.6% MFU,
a third of the dense family's — with `embedder_chunk=16` the only recipe
that fits one chip (artifacts/family_cost_v5e.json).  This tool gives it
the dense family's treatment:

  profile    trace the chunked b16 train step, break device time down by
             hlo_category, and split the remat recompute tax out of the
             step (fwd-only timing vs full step)
  sweep      chunk-size sweep over the rungs divisibility allows
             (b16: event bank 16 / prong bank 128 -> chunks {4,8,16,32+};
             chunk > bank runs the bank as ONE rematted scan step)
  inference  extend the b64 inference ladder past chunk8 (round 4
             recorded DOES NOT FIT with only chunk8 attempted, under the
             old overbroad OOM classifier)

Each measurement rung runs in its own subprocess: an OOM leaves dead
device buffers until process exit (round-4 lesson), and the axon tunnel
admits one client at a time, so the parent never initializes jax.

Usage:  python tools/sdxl_study.py [profile|sweep|inference|all] ...
Writes artifacts/sdxl_study_v5e.json (merging per stage).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "artifacts", "sdxl_study_v5e.json")


def _merge(out_path: str, patch: dict) -> None:
    record = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            record = json.load(f)
    for k, v in patch.items():
        if isinstance(v, dict) and isinstance(record.get(k), dict):
            record[k].update(v)
        else:
            record[k] = v
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)


def _setup(batch_size: int, chunk: int, save_spatial: int = 0):
    """Production SDXL model + batch + compiled pieces (device-touching)."""
    import numpy as np
    import jax.numpy as jnp

    from dune_transformercvn_tpu.utils.cache import (
        enable_compile_cache, enable_fast_prng,
    )
    enable_compile_cache()
    enable_fast_prng()
    from __graft_entry__ import _synthetic_setup
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data.batcher import Batcher

    options = Options.load(os.path.join(
        REPO, "option_files", "fdhd_beam_2018prod_2023_08_07.json"))
    options.compute_dtype = "bfloat16"
    options.batch_size = batch_size
    options.embedder_chunk = chunk
    options.embedder_chunk_save_spatial = save_spatial
    dataset, _, cfg, model, norm = _synthetic_setup(
        options, num_events=max(192, 2 * batch_size), embedder="sdxl")
    norm = {k: jnp.asarray(v) for k, v in norm.items()}
    batcher = Batcher(dataset, batch_size=batch_size,
                      coo_granularity=options.coo_bucket_granularity)
    batch = {k: jnp.asarray(v)
             for k, v in batcher.build_batch(np.arange(batch_size)).items()}
    return options, model, norm, batch


def _train_pieces(options, model, norm, batch):
    import jax
    import jax.numpy as jnp

    from dune_transformercvn_tpu.parallel.mesh import create_mesh
    from dune_transformercvn_tpu.train import schedules
    from dune_transformercvn_tpu.train.optimizer import create_optimizer
    from dune_transformercvn_tpu.train.state import create_train_state
    from dune_transformercvn_tpu.train.step import make_train_step

    mesh = create_mesh(1)
    schedule = schedules.from_options(options, steps_per_epoch=100)
    tx = create_optimizer(options, schedule)
    state0 = create_train_state(model, tx, batch, norm, seed=0)
    step = make_train_step(model, tx, options, mesh)
    compiled = step.lower(state0, batch).compile()
    state = jax.tree_util.tree_map(jnp.copy, state0)
    return compiled, state


# --------------------------------------------------------------------------
# stage: profile
# --------------------------------------------------------------------------

def stage_profile(args) -> None:
    import shutil
    from collections import defaultdict

    import jax

    from bench import _cost_flops, _fetch_scalar, _timed_best
    from tools.profile_step import device_op_stats

    bsz, chunk = args.batch, args.chunk
    options, model, norm, batch = _setup(bsz, chunk)
    compiled, state = _train_pieces(options, model, norm, batch)
    flops = _cost_flops(compiled)
    state, warm = compiled(state, batch)
    _fetch_scalar(warm["train_loss"])

    # full-step timing (sound barrier protocol)
    holder = {"state": state}

    def one_step():
        holder["state"], m = compiled(holder["state"], batch)
        return m["train_loss"]

    best = _timed_best(one_step, rounds=args.rounds)
    step_ms = best / args.rounds * 1e3

    # fwd-only at train semantics: the remat tax split.  train step ~=
    # fwd + remat-recompute(~fwd) + bwd(~2 fwd) + optimizer; fwd-only
    # isolates one fwd, so recompute tax ~= fwd_ms and bwd ~= rest.
    rngs = {"dropout": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)}

    @jax.jit
    def fwd(variables, batch):
        out, _ = model.apply(
            variables, batch, norm, train=True, rngs=rngs,
            mutable=["batch_stats"],
        )
        return out[0].sum() + out[1].sum()

    variables = {"params": holder["state"].params,
                 "batch_stats": holder["state"].batch_stats}
    _fetch_scalar(fwd(variables, batch))

    def one_fwd():
        return fwd(variables, batch)

    fwd_ms = _timed_best(one_fwd, rounds=args.rounds) / args.rounds * 1e3

    # category decomposition from a trace of the full step
    tracedir = "/tmp/sdxl_prof"
    shutil.rmtree(tracedir, ignore_errors=True)
    jax.profiler.start_trace(tracedir)
    m = None
    for _ in range(args.trace_steps):
        holder["state"], m = compiled(holder["state"], batch)
    _fetch_scalar(m["train_loss"])
    jax.profiler.stop_trace()

    stats = device_op_stats(tracedir)
    agg_ms, agg_bytes = defaultdict(float), defaultdict(int)
    for v in stats.values():
        cat = v["category"] or "uncategorized"
        agg_ms[cat] += v["dur"] / args.trace_steps * 1e3
        agg_bytes[cat] += v["bytes"] // args.trace_steps
    total_ms = sum(agg_ms.values())
    top = sorted(stats.items(), key=lambda kv: -kv[1]["dur"])[:16]

    record = {
        "train_ms_per_step": round(step_ms, 2),
        "events_per_second": round(bsz / step_ms * 1e3, 2),
        "fwd_only_ms": round(fwd_ms, 2),
        "remat_tax_estimate_ms": round(fwd_ms, 2),
        "remat_tax_pct_of_step": round(100 * fwd_ms / step_ms, 1),
        "tflops_per_step": round(flops / 1e12, 3) if flops else None,
        "device_busy_ms_per_step": round(total_ms, 2),
        "categories_ms": {k: round(v, 2) for k, v in
                          sorted(agg_ms.items(), key=lambda kv: -kv[1])},
        "categories_gb": {k: round(v / 1e9, 3) for k, v in
                          sorted(agg_bytes.items(), key=lambda kv: -kv[1])},
        "top_ops": [
            {
                "name": k[:80],
                "ms_per_step": round(v["dur"] / args.trace_steps * 1e3, 3),
                "gb_per_step": round(v["bytes"] / args.trace_steps / 1e9, 3),
                "gbps": round(v["bytes"] / v["dur"] / 1e9) if v["dur"] else 0,
                "category": v["category"],
                "occurrences_per_step": v["occurrences"] // args.trace_steps,
                "long_name": v["long_name"][:220],
            }
            for k, v in top
        ],
    }
    _merge(args.out, {f"profile_b{bsz}_chunk{chunk}": record,
                      "config": "production fdhd options, sdxl embedder, "
                                "bf16, one chip"})
    print(f"# profile b{bsz} chunk{chunk}: step {step_ms:.1f} ms, fwd-only "
          f"{fwd_ms:.1f} ms ({100 * fwd_ms / step_ms:.0f}% remat tax), "
          f"device busy {total_ms:.1f} ms", file=sys.stderr)
    for k, v in record["categories_ms"].items():
        print(f"#   {k:<28} {v:8.2f} ms/step", file=sys.stderr)


# --------------------------------------------------------------------------
# stage: roofline — per-fusion physical-bytes decomposition of the chunked
# step (the SDXL analogue of tools/conv_bw_study.py).  The `while` wrapper
# ops (the chunk scans) are EXCLUDED from the sum: their trace duration
# includes their body fusions, which appear again as separate events with
# occurrence counts — in the round-5 profile the non-while ops sum to the
# measured step time to <1%, so they are the right modeling universe.
# --------------------------------------------------------------------------

def stage_roofline(args) -> None:
    import shutil

    import jax

    from bench import _fetch_scalar, _timed_best
    from tools.conv_bw_study import (
        _BYTES, HBM_GBPS, MXU_TFLOPS, event_model, hbm_bytes, parse_operands,
    )
    from tools.profile_step import device_op_stats

    bsz, chunk = args.batch, args.chunk
    options, model, norm, batch = _setup(bsz, chunk)
    compiled, state = _train_pieces(options, model, norm, batch)
    state, warm = compiled(state, batch)
    _fetch_scalar(warm["train_loss"])

    holder = {"state": state}

    def one_step():
        holder["state"], m = compiled(holder["state"], batch)
        return m["train_loss"]

    step_ms = _timed_best(one_step, rounds=args.rounds) / args.rounds * 1e3

    tracedir = "/tmp/sdxl_roofline"
    shutil.rmtree(tracedir, ignore_errors=True)
    jax.profiler.start_trace(tracedir)
    m = None
    for _ in range(args.trace_steps):
        holder["state"], m = compiled(holder["state"], batch)
    _fetch_scalar(m["train_loss"])
    jax.profiler.stop_trace()

    stats = device_op_stats(tracedir)

    def logical_bytes(long_name: str) -> int:
        # same operand set event_model charges (S(1) VMEM rows excluded),
        # but WITHOUT tile padding — the lane-padding tax is phys - logical
        n = 0
        for dtype, dims, layout in parse_operands(long_name):
            if hbm_bytes(dtype, dims, layout) == 0:
                continue
            e = 1
            for d in dims:
                e *= d
            n += e * _BYTES[dtype]
        return n

    rows = []
    agg = {"t": 0.0, "t_model": 0.0, "t_bw": 0.0, "t_mxu": 0.0,
           "mxu_bound_t": 0.0, "sat_t": 0.0, "resid": 0.0,
           "phys_gb": 0.0, "logical_gb": 0.0, "pad_ms": 0.0}
    for name, v in sorted(stats.items(), key=lambda kv: -kv[1]["dur"]):
        if (v["category"] or "") == "while":
            continue
        row = {"name": name.lstrip("%")[:60], "category": v["category"]}
        row.update(event_model(v, args.trace_steps))
        occ = max(1, v.get("occurrences", args.trace_steps))
        logical = (logical_bytes(v["long_name"]) * occ
                   // max(1, args.trace_steps))
        row["logical_bytes"] = logical
        # what the bw term would be with zero tile padding: the lane-
        # padding tax of this op (only meaningful where hbm-bound)
        t_bw_logical = logical / (HBM_GBPS * 1e9) * 1e3
        row["lane_pad_tax_ms"] = (
            max(0.0, min(row["t_bw_model_ms"], row["t_ms_per_step"])
                - max(t_bw_logical, row["t_mxu_model_ms"]))
            if row["bound"] == "hbm" else 0.0)
        rows.append(row)
        agg["t"] += row["t_ms_per_step"]
        agg["t_model"] += row["t_model_ms"]
        agg["t_bw"] += row["t_bw_model_ms"]
        agg["t_mxu"] += row["t_mxu_model_ms"]
        agg["resid"] += max(0.0, row["residual_ms"])
        agg["phys_gb"] += row["hbm_bytes"] / 1e9
        agg["logical_gb"] += logical / 1e9
        agg["pad_ms"] += row["lane_pad_tax_ms"]
        if row["bound"] == "mxu":
            agg["mxu_bound_t"] += row["t_ms_per_step"]
        elif row["residual_frac"] < 0.10:
            agg["sat_t"] += row["t_ms_per_step"]

    for row in rows[: args.top]:
        print(f"# {row['name'][:34]:<34} {row['t_ms_per_step']:7.3f} ms "
              f"phys {row['physical_gbps']:5.0f} GB/s "
              f"model {row['t_model_ms']:6.3f} ms "
              f"resid {row['residual_ms']:+6.3f} "
              f"pad {row['lane_pad_tax_ms']:5.3f} [{row['bound']}]",
              file=sys.stderr, flush=True)

    record = {
        "train_ms_per_step": round(step_ms, 2),
        "bw_spec_gbps": HBM_GBPS, "mxu_peak_tflops": MXU_TFLOPS,
        "modeled_ops_ms": round(agg["t"], 2),
        "model_floor_ms": round(agg["t_model"], 2),
        "bw_term_ms": round(agg["t_bw"], 2),
        "mxu_term_ms": round(agg["t_mxu"], 2),
        "time_mxu_bound_ms": round(agg["mxu_bound_t"], 2),
        "time_hbm_saturated_ms": round(agg["sat_t"], 2),
        "residual_ms": round(agg["resid"], 2),
        "physical_gb_per_step": round(agg["phys_gb"], 2),
        "logical_gb_per_step": round(agg["logical_gb"], 2),
        "lane_pad_tax_ms": round(agg["pad_ms"], 2),
        "top_ops": rows[: args.top],
        "note": ("non-while ops only (while wrappers double-count their "
                 "scan bodies); t_model = max(physical bytes/BW, XLA "
                 "model_flops/MXU); lane_pad_tax_ms = bw-term excess of "
                 "tile-padded physical bytes over logical bytes on "
                 "hbm-bound ops (the C=64-on-128-lanes tax)"),
    }
    _merge(args.out, {f"roofline_b{bsz}_chunk{chunk}": record})
    print(f"# roofline b{bsz} chunk{chunk}: step {step_ms:.1f} ms, modeled "
          f"{agg['t']:.1f} ms, floor {agg['t_model']:.1f} ms, residual "
          f"{agg['resid']:.1f} ms, lane-pad tax {agg['pad_ms']:.1f} ms "
          f"({agg['phys_gb']:.1f} GB phys vs {agg['logical_gb']:.1f} GB "
          f"logical)", file=sys.stderr)


# --------------------------------------------------------------------------
# stage: one train-sweep rung (subprocess target)
# --------------------------------------------------------------------------

def stage_train_rung(args) -> None:
    from bench import _cost_flops, _fetch_scalar, _timed_best

    bsz, chunk, save = args.batch, args.chunk, args.save_spatial
    key = f"train_b{bsz}_chunk{chunk}" + (f"_save{save}" if save else "")
    try:
        options, model, norm, batch = _setup(bsz, chunk, save)
        compiled, state = _train_pieces(options, model, norm, batch)
        mem = {}
        try:
            ma = compiled.memory_analysis()
            mem["temp_gib"] = round(ma.temp_size_in_bytes / 2**30, 2)
        except Exception:
            pass
        flops = _cost_flops(compiled)
        state, warm = compiled(state, batch)
        _fetch_scalar(warm["train_loss"])
    except Exception as e:
        from tools.family_bench import _classify

        verdict = _classify(e)
        if verdict is None:
            raise
        _merge(args.out, {key: {"verdict": verdict}})
        print(f"# {key}: {verdict}", file=sys.stderr)
        return

    holder = {"state": state}

    def one_step():
        holder["state"], m = compiled(holder["state"], batch)
        return m["train_loss"]

    best = _timed_best(one_step, rounds=args.rounds)
    step_ms = best / args.rounds * 1e3
    rec = {
        "ms_per_step": round(step_ms, 2),
        "events_per_second": round(bsz / step_ms * 1e3, 2),
        "tflops_per_step": round(flops / 1e12, 3) if flops else None,
        **mem,
    }
    _merge(args.out, {key: rec})
    print(f"# {key}: {step_ms:.1f} ms/step = {bsz / step_ms * 1e3:.1f} ev/s "
          f"(temps {mem.get('temp_gib', '?')} GiB)", file=sys.stderr)


# --------------------------------------------------------------------------
# stage: one inference rung (subprocess target)
# --------------------------------------------------------------------------

def stage_inference_rung(args) -> None:
    import jax

    from bench import _inference_eps

    bsz, chunk = args.batch, args.chunk
    key = f"inference_b{bsz}_chunk{chunk}"
    try:
        options, model, norm, batch = _setup(bsz, chunk)
        import jax.numpy as jnp
        from dune_transformercvn_tpu.train.state import create_train_state
        from dune_transformercvn_tpu.train import schedules
        from dune_transformercvn_tpu.train.optimizer import create_optimizer

        schedule = schedules.from_options(options, steps_per_epoch=100)
        tx = create_optimizer(options, schedule)
        state0 = create_train_state(model, tx, batch, norm, seed=0)
        variables = {"params": state0.params,
                     "batch_stats": state0.batch_stats}
        from dune_transformercvn_tpu.ops.fold import (
            count_foldable, fold_eval_batchnorm,
        )
        if count_foldable(state0.params):
            variables = jax.jit(lambda v: fold_eval_batchnorm(v)[0])(variables)
        del state0

        @jax.jit
        def predict(variables, batch, norm):
            ev, pr = model.apply(variables, batch, norm, train=False)
            return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

        eps = _inference_eps(
            lambda b: predict(variables, b, norm), [batch],
            bsz, rounds=max(4, 192 // bsz),
        )
    except Exception as e:
        from tools.family_bench import _classify

        verdict = _classify(e)
        if verdict is None:
            raise
        _merge(args.out, {key: {"verdict": verdict}})
        print(f"# {key}: {verdict}", file=sys.stderr)
        return
    _merge(args.out, {key: {"events_per_second": round(eps, 1)}})
    print(f"# {key}: {eps:.1f} ev/s", file=sys.stderr)


# --------------------------------------------------------------------------
# orchestrator (never touches the device: one-client tunnel)
# --------------------------------------------------------------------------

def _spawn(stage: str, batch: int, chunk: int, rounds: int, out: str,
           save_spatial: int = 0) -> int:
    cmd = [sys.executable, os.path.abspath(__file__), stage,
           "--batch", str(batch), "--chunk", str(chunk),
           "--rounds", str(rounds), "--out", out,
           "--save-spatial", str(save_spatial)]
    print("+", " ".join(cmd), file=sys.stderr, flush=True)
    return subprocess.call(cmd)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("stage", nargs="?", default="all",
                        choices=["all", "profile", "sweep", "inference",
                                 "roofline", "_profile", "_train_rung",
                                 "_inference_rung", "_roofline"])
    parser.add_argument("--top", type=int, default=14)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--chunk", type=int, default=16)
    parser.add_argument("--rounds", type=int, default=6)
    parser.add_argument("--trace-steps", type=int, default=4)
    parser.add_argument("--save-spatial", type=int, default=0)
    parser.add_argument("--out", default=OUT)
    # sweep rungs: chunk must divide BOTH banks (event bank = batch, prong
    # bank = multiple of 128); chunk >= bank size runs the bank as one
    # rematted scan step, so larger rungs stay meaningful.
    parser.add_argument("--sweep-b16", default="4,8,16,32")
    parser.add_argument("--sweep-b64", default="8,16,32,64")
    # selective-remat rungs (VERDICT r4 item 2 experiment b): save tagged
    # conv outputs with H*W <= threshold across the chunk scan.  1750 =
    # blocks at 50x35 and deeper; 7000 adds the 100x70 block.  Registered
    # kill criterion: keep default 0 unless >=3% faster AND fits.
    parser.add_argument("--save-spatial-rungs", default="1750,7000")
    parser.add_argument("--inference-chunks", default="32,16,8")
    args = parser.parse_args()

    if args.stage == "_profile":
        return stage_profile(args)
    if args.stage == "_train_rung":
        return stage_train_rung(args)
    if args.stage == "_inference_rung":
        return stage_inference_rung(args)
    if args.stage == "_roofline":
        return stage_roofline(args)

    if args.stage in ("all", "profile"):
        rc = _spawn("_profile", args.batch, args.chunk, args.rounds, args.out)
        if rc:
            print(f"# profile stage rc={rc}", file=sys.stderr)
    if args.stage in ("all", "sweep"):
        for bsz, rungs in ((16, args.sweep_b16), (64, args.sweep_b64)):
            for chunk in (int(c) for c in rungs.split(",") if c):
                _spawn("_train_rung", bsz, chunk, args.rounds, args.out)
        for save in (int(s) for s in args.save_spatial_rungs.split(",") if s):
            _spawn("_train_rung", 16, args.chunk, args.rounds, args.out,
                   save_spatial=save)
    if args.stage in ("all", "inference"):
        for chunk in (int(c) for c in args.inference_chunks.split(",") if c):
            _spawn("_inference_rung", 64, chunk, args.rounds, args.out)
    if args.stage in ("all", "roofline"):
        _spawn("_roofline", args.batch, args.chunk, args.rounds, args.out)
    print(f"# artifact -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
