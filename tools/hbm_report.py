#!/usr/bin/env python
"""Peak-HBM report: XLA memory analysis of the compiled train step per
batch/remat configuration.

Turns the qualitative memory story ("batch 64 is the per-chip max without
rematerialization; batch 128 needs remat_cnn+remat_embedder" — CLAUDE.md,
artifacts/batch128_v5e.json) into numbers a capacity planner can use:
argument + output + temp ("generated code") bytes for the full jitted
fwd+bwd+AdamW step on the production dense config, straight from
``compiled.memory_analysis()`` (compile-only; nothing is executed).

    python tools/hbm_report.py                       # b16, b64, b128+remat
    python tools/hbm_report.py --configs 16:,64:cnn  # custom batch:remat list

Writes artifacts/hbm_report_v5e.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--configs", default="16:,64:,128:cnn+embedder",
        help="comma list of batch:remat where remat is '', 'cnn', "
             "'embedder', or 'cnn+embedder'",
    )
    parser.add_argument("--events", type=int, default=192)
    parser.add_argument(
        "--out", default=os.path.join(REPO, "artifacts", "hbm_report_v5e.json")
    )
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
    from dune_transformercvn_tpu.models.network import ModelConfig, TransformerCVN
    from dune_transformercvn_tpu.parallel.mesh import create_mesh
    from dune_transformercvn_tpu.train import schedules
    from dune_transformercvn_tpu.train.optimizer import create_optimizer
    from dune_transformercvn_tpu.train.state import create_train_state
    from dune_transformercvn_tpu.train.step import make_train_step
    from __graft_entry__ import _synthetic_setup

    base = Options.load(os.path.join(
        REPO, "option_files", "fdhd_beam_2018prod_2023_08_07.json"))
    base.compute_dtype = "bfloat16"
    dataset, _, _, _, norm = _synthetic_setup(base, num_events=args.events)
    norm = {k: jnp.asarray(v) for k, v in norm.items()}
    mesh = create_mesh(1)

    record = {
        "bench": "hbm_report",
        "device": str(jax.devices()[0]),
        "config": "production fdhd dense, bf16, full train step "
                  "(fwd+bwd+AdamW), compile-only memory analysis",
    }
    for token in args.configs.split(","):
        bsz_s, _, remat = token.partition(":")
        bsz = int(bsz_s)
        options = Options.load(os.path.join(
            REPO, "option_files", "fdhd_beam_2018prod_2023_08_07.json"))
        options.compute_dtype = "bfloat16"
        options.batch_size = bsz
        options.remat_cnn = "cnn" in remat
        options.remat_embedder = "embedder" in remat

        cfg = ModelConfig.from_options(
            options, dataset.num_features, dataset.num_extra,
            dataset.pixel_features, dataset.num_event_classes,
            dataset.num_prong_classes, image_shape=dataset.pixel_shape,
        )
        model = TransformerCVN(cfg)
        batcher = Batcher(dataset, batch_size=bsz,
                          coo_granularity=options.coo_bucket_granularity)
        batch = {k: jnp.asarray(v)
                 for k, v in batcher.build_batch(np.arange(bsz)).items()}
        schedule = schedules.from_options(options, steps_per_epoch=100)
        tx = create_optimizer(options, schedule)
        state = create_train_state(model, tx, batch, norm, seed=0)
        compiled = make_train_step(
            model, tx, options, mesh, steps_per_dispatch=1,
        ).lower(state, batch).compile()
        mem = compiled.memory_analysis()
        key = f"b{bsz}" + (f"_remat_{remat.replace('+', '_')}" if remat else "")
        row = {
            "arguments_gib": round(mem.argument_size_in_bytes / 2**30, 3),
            "outputs_gib": round(mem.output_size_in_bytes / 2**30, 3),
            "temps_gib": round(mem.temp_size_in_bytes / 2**30, 3),
            "aliased_gib": round(mem.alias_size_in_bytes / 2**30, 3),
            "code_gib": round(
                mem.generated_code_size_in_bytes / 2**30, 3
            ),
        }
        # peak live = temps + (arguments - donated/aliased) + outputs;
        # donated state buffers alias outputs, so count them once
        row["peak_estimate_gib"] = round(
            row["temps_gib"] + row["arguments_gib"]
            + row["outputs_gib"] - row["aliased_gib"] + row["code_gib"], 3
        )
        row["note"] = (
            "peak_estimate_gib is a compile-time heuristic (sum of XLA "
            "memory_analysis components), not a measured peak; it can "
            "overcount buffer reuse (the b64 config executes in practice)"
        )
        record[key] = row
        print(f"# {key}: {row}", file=sys.stderr, flush=True)
        del state, compiled

    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    print(f"# artifact -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
