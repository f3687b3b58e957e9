#!/usr/bin/env python
"""Quantify the conv-fusion bandwidth gap (VERDICT r3 item 6).

Round-3 profiling showed the convolution fusions — ~50% of device time —
averaging ~702 GB/s *analytic* (bytes_accessed / time), ~14% under the
819 GB/s HBM spec, with the residual asserted rather than demonstrated.
This tool decomposes it per fusion:

  t_model = max(physical_bytes / BW_spec, mxu_flops / MXU_peak)

* ``physical_bytes``: every operand/output shape of the fusion, padded to
  the TPU tiled layout ((8,128) fp32 / (16,128) bf16 on the two
  minormost layout dims) — the bytes the HBM actually moves, which
  ``bytes_accessed`` (logical) undercounts for narrow/odd dims.
* ``mxu_flops``: 2 * output_elems * kh * kw * cin for each convolution
  inside the fusion — time the MXU is busy regardless of bytes.

Per fusion the residual = t_actual - t_model is what remains unexplained
after tile padding and MXU occupancy; the summary aggregates the top
fusions into the saturated / algorithmic / residual decomposition
PARITY.md's roofline section needs.

    python tools/conv_bw_study.py [--batch 16] [--steps 8] [--top 8]

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

HBM_GBPS = {"TPU v5e": 819.0, "TPU v5 lite": 819.0}
MXU_TFLOPS = {"TPU v5e": 197.0, "TPU v5 lite": 197.0}

_SHAPE_RE = re.compile(
    r"(f32|bf16|f16|s32|u32|s8|u8|pred|s64)\[([0-9,]*)\](?:\{([0-9,]+)\})?")
_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1, "s64": 8}
_SUBLANE = {"f32": 8, "s32": 8, "u32": 8, "s64": 8, "bf16": 16, "f16": 16,
            "s8": 32, "u8": 32, "pred": 32}


def parse_shape(text):
    """First 'dtype[dims]{layout' in ``text`` -> (dtype, dims, minor_to_major).
    Returns None for layout-less (scalar) or unparseable text."""
    m = _SHAPE_RE.search(text)
    if not m:
        return None
    dtype = m.group(1)
    dims = [int(d) for d in m.group(2).split(",") if d != ""]
    layout = (
        [int(d) for d in m.group(3).split(",")] if m.group(3) else
        list(range(len(dims)))[::-1]
    )
    return dtype, dims, layout


def all_shapes(text):
    out = []
    for m in _SHAPE_RE.finditer(text):
        dtype = m.group(1)
        dims = [int(d) for d in m.group(2).split(",") if d != ""]
        layout = (
            [int(d) for d in m.group(3).split(",")] if m.group(3) else
            list(range(len(dims)))[::-1]
        )
        out.append((dtype, dims, layout))
    return out


def physical_bytes(dtype, dims, layout):
    """Bytes of the tiled TPU layout: minormost dim -> 128 lanes, second
    minormost -> the dtype's sublane quantum.  Scalars/1-D pad to one tile."""
    if not dims:
        return 512  # scalar: one (8,128) f32-equivalent tile at worst
    padded = list(dims)
    minor = layout[0]
    padded[minor] = -(-padded[minor] // 128) * 128
    if len(dims) >= 2:
        second = layout[1]
        q = _SUBLANE[dtype]
        padded[second] = -(-padded[second] // q) * q
    else:
        # 1-D: lives as (1, N) -> lane padding only
        pass
    n = 1
    for d in padded:
        n *= d
    return n * _BYTES[dtype]


def logical_bytes(dtype, dims, layout):
    n = 1
    for d in dims:
        n *= d
    return n * _BYTES[dtype]


def fusion_computations(hlo_text):
    """{computation_name: its full text} for every fused computation."""
    comps = {}
    current, buf = None, []
    for line in hlo_text.splitlines():
        if line and not line[0].isspace():
            if current:
                comps[current] = "\n".join(buf)
            current, buf = None, []
            m = re.match(r"%?([\w.\-]*fused_computation[\w.\-]*)\s*\(",
                         line.strip())
            if m:
                current = m.group(1)
                buf = [line]
        elif current:
            buf.append(line)
    if current:
        comps[current] = "\n".join(buf)
    return comps


def conv_flops_in(comp_text):
    """Sum MXU flops of convolution instructions inside a fused computation.

    flops = 2 * output_elems * kh * kw * cin, with cin read from the kernel
    operand's shape via dim_labels (the i position).  HLO text does not
    inline operand shapes, so resolve operand names against the
    computation's own instruction declarations."""
    decls = {}
    for line in comp_text.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\S+)", line)
        if m:
            shape = parse_shape(m.group(2))
            if shape:
                decls[m.group(1)] = shape
    flops = 0
    for line in comp_text.splitlines():
        if "convolution(" not in line:
            continue
        out = parse_shape(line.split("=", 1)[1] if "=" in line else line)
        ops = re.search(r"convolution\(([^)]*)\)", line)
        if out is None or ops is None:
            continue
        names = [o.strip().lstrip("%") for o in ops.group(1).split(",")]
        if len(names) < 2 or names[1] not in decls:
            continue
        k_dims = decls[names[1]][1]
        m = re.search(r"dim_labels=\S*?_([\w?]+)->", line)
        rhs_labels = m.group(1) if m else "01io"
        try:
            cin = k_dims[rhs_labels.index("i")]
            spatial = [
                k_dims[rhs_labels.index(c)]
                for c in "0123456789"[: len(k_dims) - 2]
            ]
        except (ValueError, IndexError):
            continue
        out_elems = 1
        for d in out[1]:
            out_elems *= d
        k_spatial = 1
        for s in spatial:
            k_spatial *= s
        flops += 2 * out_elems * k_spatial * cin
    return flops


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--top", type=int, default=10)
    parser.add_argument("--events", type=int, default=192)
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
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import device_op_stats

    options = Options.load(os.path.join(
        REPO, "option_files", "fdhd_beam_2018prod_2023_08_07.json"))
    options.compute_dtype = "bfloat16"
    options.batch_size = args.batch
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
    hlo_text = compiled.as_text()
    comps = fusion_computations(hlo_text)
    print(f"# HLO: {len(hlo_text)} chars, {len(comps)} fused computations",
          file=sys.stderr, flush=True)

    # call-site index: fusion name -> (instruction line, called computation)
    call_sites = {}
    for line in hlo_text.splitlines():
        m = re.search(r"%?([\w.\-]+fusion[\w.\-]*)\s*=.*calls=%?([\w.\-]+)",
                      line)
        if m:
            call_sites[m.group(1)] = (line, m.group(2))

    state, warm = compiled(jax.tree_util.tree_map(jnp.copy, state0), batch)
    _fetch_scalar(warm["train_loss"])
    tracedir = "/tmp/conv_bw_trace"
    shutil.rmtree(tracedir, ignore_errors=True)
    jax.profiler.start_trace(tracedir)
    m = None
    for _ in range(args.steps):
        state, m = compiled(state, batch)
    _fetch_scalar(m["train_loss"])
    jax.profiler.stop_trace()

    stats = device_op_stats(tracedir)
    convs = sorted(
        ((k, v) for k, v in stats.items()
         if "convolution" in (v["category"] or "")),
        key=lambda kv: -kv[1]["dur"],
    )
    dev = jax.devices()[0].device_kind
    bw_spec = HBM_GBPS.get(dev, 819.0)
    mxu_peak = MXU_TFLOPS.get(dev, 197.0)

    rows = []
    total_conv_t = sum(v["dur"] for _, v in convs)
    for name, v in convs[: args.top]:
        key = name.lstrip("%")
        site = call_sites.get(key)
        if site is None:
            # trace names sometimes drop/add suffixes; try a prefix match
            cands = [k for k in call_sites if k.startswith(key) or
                     key.startswith(k)]
            site = call_sites[cands[0]] if cands else None
        row = {"name": key, "t_ms_per_step": v["dur"] / args.steps * 1e3,
               "analytic_gbps": (v["bytes"] / v["dur"] / 1e9) if v["dur"] else 0}
        if site:
            line, comp_name = site
            comp = comps.get(comp_name, "")
            shapes = []
            sig = re.search(r"\((.*?)\)\s*->\s*(.*)", comp.splitlines()[0]
                            if comp else "")
            if sig:
                shapes = all_shapes(sig.group(1)) + all_shapes(sig.group(2))
            phys = sum(physical_bytes(*s) for s in shapes)
            logical = sum(logical_bytes(*s) for s in shapes)
            flops = conv_flops_in(comp)
            t = v["dur"] / args.steps
            t_bw = phys / (bw_spec * 1e9)
            t_mxu = flops / (mxu_peak * 1e12)
            row.update({
                "physical_bytes": phys, "logical_bytes": logical,
                "traced_bytes": v["bytes"] // args.steps,
                "physical_gbps": phys / t / 1e9 if t else 0,
                "mxu_flops": flops,
                "t_bw_model_ms": t_bw * 1e3, "t_mxu_model_ms": t_mxu * 1e3,
                "t_model_ms": max(t_bw, t_mxu) * 1e3,
                "residual_ms": (t - max(t_bw, t_mxu)) * 1e3,
                "bound": "mxu" if t_mxu > t_bw else "hbm",
            })
        rows.append(row)
        print(f"# {row['name'][:40]:<40} {row['t_ms_per_step']:7.3f} ms "
              f"analytic {row['analytic_gbps']:5.0f} GB/s "
              + (f"physical {row.get('physical_gbps', 0):5.0f} GB/s "
                 f"model {row.get('t_model_ms', 0):6.3f} ms "
                 f"residual {row.get('residual_ms', 0):+6.3f} ms "
                 f"[{row.get('bound', '?')}]" if site else "(no HLO match)"),
              file=sys.stderr, flush=True)

    explained = [r for r in rows if "t_model_ms" in r]
    t_actual = sum(r["t_ms_per_step"] for r in explained)
    t_model = sum(r["t_model_ms"] for r in explained)
    record = {
        "bench": "conv_bw_study", "device": str(jax.devices()[0]),
        "batch": args.batch, "steps": args.steps,
        "conv_total_ms_per_step": total_conv_t / args.steps * 1e3,
        "top_fusions": rows,
        "top_t_actual_ms": t_actual,
        "top_t_model_ms": t_model,
        "top_residual_ms": t_actual - t_model,
        "top_residual_frac": (t_actual - t_model) / t_actual if t_actual else 0,
        "note": "t_model = max(physical(tile-padded) bytes / HBM spec, "
                "conv flops / MXU peak) per fusion; residual is the "
                "unexplained slice",
    }
    out = os.path.join(REPO, "artifacts", "conv_bw_study_v5e.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "top_fusions"}))
    print(f"# artifact -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
