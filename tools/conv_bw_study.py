#!/usr/bin/env python
"""Quantify the conv-fusion bandwidth gap (VERDICT r3 item 6).

Round-3 profiling showed the convolution fusions — ~50% of device time —
averaging ~702 GB/s *analytic* (bytes_accessed / time), ~14% under the
819 GB/s HBM spec, with the residual asserted rather than demonstrated.
This tool decomposes it per fusion from the profiler trace alone, which
carries the compiler's own ground truth for both terms:

  t_model = max(hbm_bytes / BW_spec, model_flops / MXU_peak)

* ``hbm_bytes``: every top-level operand and the output of the fusion,
  read from the event's ``long_name`` **with its actual layout** — the
  printed tile (e.g. ``T(8,128)(2,1)``) gives the physical padded size,
  and operands annotated ``S(1)`` (alternate memory / VMEM-resident by
  memory-space assignment) are skipped because they never touch HBM.
  This is the byte count ``bytes_accessed`` (logical) under- and
  over-counts: it misses tile padding but also charges VMEM operands.
* ``model_flops``: XLA's own per-op cost analysis from the trace —
  correct for the rewritten backward convs (input-grad / weight-grad
  forms), where re-deriving flops from textual dim_labels is a trap.

Per fusion the residual = t_actual - t_model is what remains unexplained
after tile padding and MXU occupancy; the summary aggregates over ALL
convolution fusions into the saturated / mxu-bound / residual
decomposition PARITY.md's roofline section needs.

    python tools/conv_bw_study.py [--batch 16] [--steps 8] [--top 12]

Writes artifacts/conv_bw_study_v5e.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HBM_GBPS = 819.0
MXU_TFLOPS = 197.0  # bf16 peak, v5e

_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1, "s64": 8, "u64": 8, "s16": 2, "u16": 2}

# dtype[dims]{minor_to_major:T(tile)(tile)...  S(space)}
_SHAPE_RE = re.compile(
    r"(f32|bf16|f16|s32|u32|s8|u8|pred|s64|u64|s16|u16)"
    r"\[([0-9,]*)\]"
    r"(?:\{([^}]*)\})?")


def parse_operands(long_name: str):
    """All (dtype, dims, layout_body) from a trace event's ``long_name``.

    The first shape is the op's output; the rest are its operands (the
    long_name is the HLO instruction text: ``%f = SHAPE fusion(SHAPE %a,
    SHAPE %b, ...)``).  Tuple outputs contribute one entry per element.
    """
    return [(m.group(1), [int(d) for d in m.group(2).split(",") if d],
             m.group(3) or "") for m in _SHAPE_RE.finditer(long_name)]


def hbm_bytes(dtype, dims, layout_body):
    """Physical HBM bytes of one buffer, honoring the printed layout.

    * ``S(n)`` with n>0: alternate memory (VMEM) — returns 0.
    * ``T(a,b)``: the two minormost dims (per the printed minor-to-major
      order) pad to multiples of a and b; a trailing ``(p,1)`` packing
      group multiplies the sublane quantum by p (bf16 packs 2 sublanes
      per 32-bit word, so bf16 tiles are physically (16,128) elements).
    * 1-D tiles ``T(x)``: pad to a multiple of x.
    Un-annotated buffers fall back to logical bytes.
    """
    sp = re.search(r"S\((\d+)\)", layout_body)
    if sp and int(sp.group(1)) != 0:
        return 0
    n_logical = 1
    for d in dims:
        n_logical *= d
    if not dims:
        return _BYTES[dtype]
    m = re.search(r"T((?:\([0-9,]+\))+)", layout_body)
    if not m:
        return n_logical * _BYTES[dtype]
    groups = [
        [int(x) for x in g.split(",")]
        for g in re.findall(r"\(([0-9,]+)\)", m.group(1))
    ]
    tile = groups[0]
    pack = 1
    for g in groups[1:]:
        if len(g) == 2 and g[1] == 1 and g[0] in (2, 4):
            pack = g[0]          # sub-byte/word packing, e.g. bf16 (2,1)
    # minor-to-major permutation prefix of the layout body
    perm = [int(x) for x in
            re.match(r"([0-9,]*)", layout_body).group(1).split(",") if x != ""]
    if len(perm) != len(dims):
        perm = list(range(len(dims)))[::-1]
    padded = list(dims)
    if len(tile) == 1:
        d = perm[0] if perm else len(dims) - 1
        q = tile[0]
        padded[d] = -(-padded[d] // q) * q
    else:
        # tile maps onto the len(tile) minormost dims, last tile entry on
        # the minormost; the second-minor quantum scales by the packing
        for i, q in enumerate(reversed(tile)):
            if i >= len(perm):
                break
            if i == 1:
                q *= pack
            d = perm[i]
            padded[d] = -(-padded[d] // q) * q
    n = 1
    for d in padded:
        n *= d
    return n * _BYTES[dtype]


def event_model(v, steps, bw_gbps=HBM_GBPS, mxu_tflops=MXU_TFLOPS):
    """Roofline decomposition of one aggregated trace op."""
    shapes = parse_operands(v["long_name"])
    # long_name describes ONE occurrence; dur/flops aggregate ALL
    # occurrences of this op name across the trace (an op inside a scan or
    # called twice executes occurrences/steps times per step), so scale the
    # per-occurrence physical bytes to per-step.
    occurrences = max(1, v.get("occurrences", steps))
    phys = sum(hbm_bytes(*s) for s in shapes) * occurrences // max(1, steps)
    flops = v.get("flops", 0) // max(1, steps)
    t = v["dur"] / steps
    t_bw = phys / (bw_gbps * 1e9)
    t_mxu = flops / (mxu_tflops * 1e12)
    t_model = max(t_bw, t_mxu)
    return {
        "occurrences_per_step": occurrences / max(1, steps),
        # a truncated long_name loses operands -> bw term is a lower bound
        "partially_modeled": bool(v.get("long_name_truncated", False)),
        "t_ms_per_step": t * 1e3,
        "analytic_gbps": (v["bytes"] / v["dur"] / 1e9) if v["dur"] else 0,
        "hbm_bytes": phys,
        "physical_gbps": phys / t / 1e9 if t else 0,
        "model_flops": flops,
        "t_bw_model_ms": t_bw * 1e3,
        "t_mxu_model_ms": t_mxu * 1e3,
        "t_model_ms": t_model * 1e3,
        "residual_ms": (t - t_model) * 1e3,
        "residual_frac": (t - t_model) / t if t else 0,
        "bound": "mxu" if t_mxu > t_bw else "hbm",
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--top", type=int, default=12)
    parser.add_argument("--events", type=int, default=192)
    parser.add_argument(
        "--s2d", action="store_true",
        help="enable stem_space_to_depth (the targeted experiment for the "
             "stem fusions' residual); writes conv_bw_study_s2d_v5e.json",
    )
    parser.add_argument(
        "--pool-first", action="store_true",
        help="enable transition_pool_first (pool commutes ahead of each "
             "transition's 1x1 conv: 4x fewer conv FLOPs, one less full-"
             "res HBM pass); writes conv_bw_study_poolfirst_v5e.json",
    )
    parser.add_argument(
        "--tracedir", default="",
        help="re-analyze an existing trace instead of running the chip "
             "(the trace must be from the same --batch/--steps run)",
    )
    args = parser.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if args.tracedir:
        analyze(args.tracedir, args, device="TPU v5 lite0 (reused trace)")
        return

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
    options.batch_size = args.batch
    options.stem_space_to_depth = bool(args.s2d)
    options.transition_pool_first = bool(args.pool_first)
    dataset, _, _, model, norm = _synthetic_setup(
        options, num_events=args.events)
    norm = {k: jnp.asarray(v) for k, v in norm.items()}
    mesh = create_mesh(1)
    schedule = schedules.from_options(options, steps_per_epoch=100)
    tx = create_optimizer(options, schedule)

    b = Batcher(dataset, batch_size=args.batch,
                coo_granularity=options.coo_bucket_granularity)
    batch = {k: jnp.asarray(v)
             for k, v in b.build_batch(np.arange(args.batch)).items()}
    state0 = create_train_state(model, tx, batch, norm, seed=0)
    compiled = make_train_step(
        model, tx, options, mesh).lower(state0, batch).compile()

    state, warm = compiled(jax.tree_util.tree_map(jnp.copy, state0), batch)
    _fetch_scalar(warm["train_loss"])

    # Whole-step wall time (device-fetch barrier, best of 3 windows) so the
    # artifact carries an end-to-end number next to the per-fusion model.
    import time
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        m = None
        for _ in range(max(8, args.steps)):
            state, m = compiled(state, batch)
        _fetch_scalar(m["train_loss"])
        best = min(best, (time.perf_counter() - t0) / max(8, args.steps))
    step_ms = best * 1e3

    tracedir = "/tmp/conv_bw_trace"
    shutil.rmtree(tracedir, ignore_errors=True)
    jax.profiler.start_trace(tracedir)
    m = None
    for _ in range(args.steps):
        state, m = compiled(state, batch)
    _fetch_scalar(m["train_loss"])
    jax.profiler.stop_trace()

    analyze(tracedir, args, device=str(jax.devices()[0]), step_ms=step_ms)


def analyze(tracedir, args, device, step_ms=None):
    from profile_step import device_op_stats

    stats = device_op_stats(tracedir)
    convs = sorted(
        ((k, v) for k, v in stats.items()
         if "convolution" in (v["category"] or "")),
        key=lambda kv: -kv[1]["dur"],
    )

    rows, agg = [], {"t": 0.0, "t_model": 0.0, "t_bw": 0.0, "t_mxu": 0.0,
                     "mxu_bound_t": 0.0, "sat_t": 0.0, "resid": 0.0}
    for name, v in convs:
        row = {"name": name.lstrip("%")}
        row.update(event_model(v, args.steps))
        rows.append(row)
        agg["t"] += row["t_ms_per_step"]
        agg["t_model"] += row["t_model_ms"]
        agg["t_bw"] += row["t_bw_model_ms"]
        agg["t_mxu"] += row["t_mxu_model_ms"]
        agg["resid"] += max(0.0, row["residual_ms"])
        if row["bound"] == "mxu":
            agg["mxu_bound_t"] += row["t_ms_per_step"]
        elif row["residual_frac"] < 0.10:
            agg["sat_t"] += row["t_ms_per_step"]

    for row in rows[: args.top]:
        print(f"# {row['name'][:32]:<32} {row['t_ms_per_step']:7.3f} ms "
              f"analytic {row['analytic_gbps']:5.0f} GB/s "
              f"physical {row['physical_gbps']:5.0f} GB/s "
              f"model {row['t_model_ms']:6.3f} ms "
              f"residual {row['residual_ms']:+6.3f} ms "
              f"[{row['bound']}]", file=sys.stderr, flush=True)

    record = {
        "bench": "conv_bw_study", "device": device,
        "batch": args.batch, "steps": args.steps,
        "stem_space_to_depth": bool(getattr(args, "s2d", False)),
        "transition_pool_first": bool(getattr(args, "pool_first", False)),
        "train_step_ms": round(step_ms, 3) if step_ms else None,
        "bw_spec_gbps": HBM_GBPS, "mxu_peak_tflops": MXU_TFLOPS,
        "conv_total_ms_per_step": agg["t"],
        "conv_model_ms_per_step": agg["t_model"],
        "conv_bw_term_ms": agg["t_bw"],
        "conv_mxu_term_ms": agg["t_mxu"],
        "conv_time_mxu_bound_ms": agg["mxu_bound_t"],
        "conv_time_hbm_saturated_ms": agg["sat_t"],
        "conv_residual_ms": agg["resid"],
        "conv_residual_frac": agg["resid"] / agg["t"] if agg["t"] else 0,
        "top_fusions": rows[: args.top],
        "note": ("t_model = max(physical HBM bytes (layout tiles, S(1) "
                 "VMEM operands excluded) / HBM spec, XLA model_flops / "
                 "MXU bf16 peak) per conv fusion, aggregated over ALL "
                 "conv fusions; residual sums only positive per-fusion "
                 "residuals (the unexplained slice)"),
    }
    suffix = "_s2d" if getattr(args, "s2d", False) else ""
    if getattr(args, "pool_first", False):
        suffix += "_poolfirst"
    out = os.path.join(REPO, "artifacts", f"conv_bw_study{suffix}_v5e.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "top_fusions"}))
    print(f"# artifact -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
