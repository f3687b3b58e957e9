#!/usr/bin/env python
"""On-chip cost sheet for the non-dense embedder families.

BENCH and the HBM report cover the dense flagship; this tool gives the
other families real numbers on the chip — train b16/b64 step time and
events/s (full fwd+bwd+AdamW), inference events/s, compile-time HBM temp
usage, and (when a config cannot fit) the remat recipe that makes it fit.
The SDXL family is the LArSoft production architecture (SURVEY §2.1,
reference sdxl_net.py:7-42), so "complete" includes knowing what it costs
on this hardware.

    python tools/family_bench.py                       # sdxl + sparse
    python tools/family_bench.py --families sdxl,convnext,fcnn
    python tools/family_bench.py --batches 16          # quick pass

Writes artifacts/family_cost_v5e.json (merging with existing entries, so
families can be measured incrementally).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REMAT_LADDER = ("", "cnn", "cnn+embedder")   # escalation until it fits


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--families", default="sdxl,sparse")
    parser.add_argument("--batches", default="16,64")
    parser.add_argument("--rounds", type=int, default=8)
    parser.add_argument(
        "--out", default=os.path.join(REPO, "artifacts", "family_cost_v5e.json")
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

    from bench import _cost_flops, _fetch_scalar, _inference_eps, _timed_best
    from __graft_entry__ import _synthetic_setup
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data.batcher import Batcher
    from dune_transformercvn_tpu.parallel.mesh import create_mesh
    from dune_transformercvn_tpu.train import schedules
    from dune_transformercvn_tpu.train.optimizer import create_optimizer
    from dune_transformercvn_tpu.train.state import create_train_state
    from dune_transformercvn_tpu.train.step import make_train_step

    batch_sizes = [int(b) for b in args.batches.split(",")]
    mesh = create_mesh(1)

    record = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            record = json.load(f)
    record.update({
        "bench": "family_cost",
        "device": str(jax.devices()[0]),
        "config": "production fdhd options, bf16, one chip; train = full "
                  "fwd+bwd+AdamW step; remat escalated until the step fits",
    })

    for family in args.families.split(","):
        family = family.strip()
        fam_rec = record.setdefault(family, {})
        print(f"## family {family}", file=sys.stderr, flush=True)

        options = Options.load(os.path.join(
            REPO, "option_files", "fdhd_beam_2018prod_2023_08_07.json"))
        options.compute_dtype = "bfloat16"
        options.coo_bucket_granularity = 8192
        options.batch_size = max(batch_sizes)
        options.embedder = family

        dataset, _, cfg, model, norm = _synthetic_setup(
            options, num_events=max(192, 2 * max(batch_sizes)),
            embedder=family,
        )
        norm = {k: jnp.asarray(v) for k, v in norm.items()}
        batches = {}
        for bsz in batch_sizes:
            batcher = Batcher(
                dataset, batch_size=bsz,
                coo_granularity=options.coo_bucket_granularity,
            )
            batches[bsz] = {
                k: jnp.asarray(v)
                for k, v in batcher.build_batch(np.arange(bsz)).items()
            }

        schedule = schedules.from_options(options, steps_per_epoch=100)
        tx = create_optimizer(options, schedule)
        state0 = create_train_state(
            model, tx, batches[batch_sizes[0]], norm, seed=0)

        # ---- inference (smallest batch = reference protocol shape) --------
        variables = {"params": state0.params, "batch_stats": state0.batch_stats}
        from dune_transformercvn_tpu.ops.fold import (
            count_foldable, fold_eval_batchnorm,
        )
        if count_foldable(state0.params):
            variables = jax.jit(lambda v: fold_eval_batchnorm(v)[0])(variables)

        @jax.jit
        def predict(variables, batch, norm):
            ev, pr = model.apply(variables, batch, norm, train=False)
            return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

        for bsz in batch_sizes:
            eps = _inference_eps(
                lambda b: predict(variables, b, norm), [batches[bsz]],
                bsz, rounds=max(4, 192 // bsz),
            )
            fam_rec[f"inference_b{bsz}_events_per_second"] = round(eps, 1)
            print(f"#   inference b{bsz}: {eps:.0f} ev/s",
                  file=sys.stderr, flush=True)

        # ---- train steps with remat escalation ----------------------------
        for bsz in batch_sizes:
            options.batch_size = bsz
            done = False
            for remat in REMAT_LADDER:
                options.remat_cnn = "cnn" in remat
                options.remat_embedder = "embedder" in remat
                try:
                    step = make_train_step(model, tx, options, mesh)
                    compiled = step.lower(
                        state0, batches[bsz]).compile()
                except Exception as e:  # OOM at compile: escalate remat
                    msg = str(e)
                    if "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower():
                        print(f"#   train b{bsz} remat='{remat}': does not "
                              f"fit ({msg[:100]})", file=sys.stderr, flush=True)
                        continue
                    raise
                mem = {}
                try:
                    ma = compiled.memory_analysis()
                    mem = {"temp_gib": round(
                        ma.temp_size_in_bytes / 2**30, 2)}
                except Exception:
                    pass
                flops = _cost_flops(compiled)
                state = jax.tree_util.tree_map(jnp.copy, state0)
                state, warm = compiled(state, batches[bsz])
                _fetch_scalar(warm["train_loss"])
                holder = {"state": state}

                def one_call():
                    holder["state"], metrics = compiled(
                        holder["state"], batches[bsz])
                    return metrics["train_loss"]

                best = _timed_best(one_call, rounds=args.rounds)
                step_time = best / args.rounds
                fam_rec[f"train_b{bsz}_events_per_second"] = round(
                    bsz / step_time, 2)
                fam_rec[f"train_b{bsz}_ms_per_step"] = round(
                    step_time * 1e3, 2)
                fam_rec[f"train_b{bsz}_remat"] = remat
                if flops:
                    fam_rec[f"train_b{bsz}_tflops_per_step"] = round(
                        flops / 1e12, 3)
                fam_rec.update(
                    {f"train_b{bsz}_{k}": v for k, v in mem.items()})
                print(f"#   train b{bsz} remat='{remat}': "
                      f"{step_time * 1e3:.1f} ms/step, "
                      f"{bsz / step_time:.1f} ev/s",
                      file=sys.stderr, flush=True)
                done = True
                break
            if not done:
                fam_rec[f"train_b{bsz}_remat"] = "DOES NOT FIT (all recipes)"
                print(f"#   train b{bsz}: does not fit under any remat recipe",
                      file=sys.stderr, flush=True)

        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)

    print(json.dumps({k: v for k, v in record.items()
                      if k in args.families.split(",") or k == "device"}))
    print(f"# artifact -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()


