#!/usr/bin/env python
"""On-chip cost sheet for the non-dense embedder families.

BENCH and the HBM report cover the dense flagship; this tool gives the
other families real numbers on the chip — train step time and events/s
(full fwd+bwd+AdamW), inference events/s, compile-time HBM temp usage,
and (when a config cannot fit) the remat recipe that makes it fit.
The SDXL family is the LArSoft production architecture (SURVEY §2.1,
reference sdxl_net.py:7-42), so "complete" includes knowing what it costs
on this hardware.

    python tools/family_bench.py                       # sdxl + sparse
    python tools/family_bench.py --families sdxl --batches 4,8,16,64
    python tools/family_bench.py --families convnext,fcnn

Writes artifacts/family_cost_v5e.json (merging with existing entries, so
families can be measured incrementally).

When more than one family is requested, each runs in its own subprocess:
a family that OOMs the chip leaves dead buffers behind (the axon backend
frees them only at process exit), which round-4 measurement showed will
poison every subsequent family in the same process.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REMAT_LADDER = ("", "cnn", "cnn+embedder")   # escalation until it fits
# The SDXL family's VAE-encoder backward does not fit even fully rematted
# (round-4 measurement: every REMAT_LADDER rung OOMs at b4); its ladder
# continues into chunked embedder application (Options.embedder_chunk:
# nn.scan over bank slices + per-chunk remat, exact for SDXL's per-sample
# GroupNorm).  Chunk sizes must divide both banks: the prong bank is a
# multiple of 128 slots and the event bank equals the batch size.
SDXL_LADDER = REMAT_LADDER + ("chunk16", "chunk8", "chunk4", "chunk2")


def _apply_recipe(options, remat: str) -> None:
    """Set the option fields a remat-ladder rung names ('cnn+chunk8'...)."""
    options.remat_cnn = "cnn" in remat
    options.remat_embedder = "embedder" in remat
    m = re.search(r"chunk(\d+)", remat)
    options.embedder_chunk = int(m.group(1)) if m else 0


def _classify(e) -> str | None:
    """Map an exception to a fits/doesn't-fit verdict, or None = real error.

    The sandbox's remote-compile helper can die host-side (HTTP 500) on
    very large programs — that is a harness limit, not chip HBM, and must
    not be recorded as "does not fit".
    """
    msg = str(e)
    if "RESOURCE_EXHAUSTED" in msg:
        return "DOES NOT FIT (HBM)"
    if "remote_compile" in msg or "tpu_compile_helper" in msg:
        return "COMPILE FAILED (sandbox remote-compile host limit)"
    # Narrow OOM patterns only — a bare "memory" substring also matches
    # unrelated errors ("shared memory", tracebacks) and would silently
    # record a real bug as OOM.  Everything else re-raises to the caller.
    low = msg.lower()
    if "out of memory" in low or "exceeds the hbm" in low or "oom" in low:
        return f"DOES NOT FIT (HBM): {msg[:200]}"
    return None


def run_family(family: str, batch_sizes: list[int], rounds: int,
               out_path: str, ladder: tuple[str, ...] | None = None,
               train_only: bool = False) -> None:
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
    from dune_transformercvn_tpu.models.network import (
        ModelConfig, TransformerCVN,
    )
    from dune_transformercvn_tpu.parallel.mesh import create_mesh
    from dune_transformercvn_tpu.train import schedules
    from dune_transformercvn_tpu.train.optimizer import create_optimizer
    from dune_transformercvn_tpu.train.state import create_train_state
    from dune_transformercvn_tpu.train.step import make_train_step

    mesh = create_mesh(1)

    record = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            record = json.load(f)
    record.update({
        "bench": "family_cost",
        "device": str(jax.devices()[0]),
        "config": "production fdhd options, bf16, one chip; train = full "
                  "fwd+bwd+AdamW step; remat escalated until the step fits",
    })
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
    # Batches stay on the host; each measurement device_puts its own copy
    # and drops it afterwards so a big batch can't crowd out a small one.
    host_batches = {}
    for bsz in batch_sizes:
        batcher = Batcher(
            dataset, batch_size=bsz,
            coo_granularity=options.coo_bucket_granularity,
        )
        host_batches[bsz] = batcher.build_batch(np.arange(bsz))

    def device_batch(bsz):
        return {k: jnp.asarray(v) for k, v in host_batches[bsz].items()}

    schedule = schedules.from_options(options, steps_per_epoch=100)
    tx = create_optimizer(options, schedule)
    state0 = create_train_state(
        model, tx, device_batch(batch_sizes[0]), norm, seed=0)

    def flush(note=""):
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)

    # ---- inference (reference serving protocol shape) ---------------------
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

    def chunked_predict(chunk):
        """SDXL OOM fallback: same variables (tree is chunk-invariant),
        embedders applied in `chunk`-row slices (exact for GroupNorm)."""
        options.embedder_chunk = chunk
        cfg_c = ModelConfig.from_options(
            options, dataset.num_features, dataset.num_extra,
            dataset.pixel_features, dataset.num_event_classes,
            dataset.num_prong_classes, image_shape=dataset.pixel_shape,
            embedder=family,
        )
        options.embedder_chunk = 0
        model_c = TransformerCVN(cfg_c)

        @jax.jit
        def predict_c(variables, batch, norm):
            ev, pr = model_c.apply(variables, batch, norm, train=False)
            return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

        return predict_c

    # --train_only skips re-measuring inference (keeps existing rows).
    # SDXL's OOM fallback ladder descends through chunk sizes (round 4
    # stopped at chunk8 and recorded b64 DOES NOT FIT under the old
    # overbroad OOM classifier; smaller chunks cap live activations
    # further, so each rung is a real additional chance to fit).
    for bsz in ([] if train_only else batch_sizes):
        attempts = ["full"]
        if family == "sdxl":
            # every rung divides both banks at the measured batch sizes
            # (event bank = bsz in {16, 64}; prong slots are multiples of
            # 128); apply_embedder clamps chunk > bank to one scan step
            attempts += [32, 16, 8, 4]
        key, fn = f"inference_b{bsz}_events_per_second", predict
        for attempt in attempts:
            if attempt != "full":
                key = f"inference_b{bsz}_chunk{attempt}_events_per_second"
                fn = chunked_predict(attempt)
            batch = device_batch(bsz)
            try:
                eps = _inference_eps(
                    lambda b: fn(variables, b, norm), [batch],
                    bsz, rounds=max(4, 192 // bsz),
                )
            except Exception as e:  # axon raises runtime RESOURCE_EXHAUSTED
                verdict = _classify(e)
                if verdict is None:
                    raise
                fam_rec[key] = verdict
                print(f"#   inference b{bsz} [{attempt}]: {verdict}",
                      file=sys.stderr, flush=True)
                del batch
                continue
            del batch
            fam_rec[key] = round(eps, 1)
            print(f"#   inference b{bsz} [{attempt}]: {eps:.0f} ev/s",
                  file=sys.stderr, flush=True)
            break
    flush()

    # Drop the folded-weights copy before training: for the big families
    # (SDXL) a duplicate param tree is real HBM headroom.
    del variables
    predict = None

    # ---- train steps with remat escalation ---------------------------------
    if ladder is None:
        ladder = SDXL_LADDER if family == "sdxl" else REMAT_LADDER
    for bsz in batch_sizes:
        options.batch_size = bsz
        done = False
        for remat in ladder:
            _apply_recipe(options, remat)
            # Remat flags are baked into ModelConfig at construction —
            # rebuild the module per rung (param-tree names are stable
            # across remat toggles, so state0 is reusable as-is).
            rung_cfg = ModelConfig.from_options(
                options,
                dataset.num_features,
                dataset.num_extra,
                dataset.pixel_features,
                dataset.num_event_classes,
                dataset.num_prong_classes,
                image_shape=dataset.pixel_shape,
                embedder=family,
            )
            rung_model = TransformerCVN(rung_cfg)
            batch = state = compiled = None
            try:
                batch = device_batch(bsz)
                step = make_train_step(rung_model, tx, options, mesh)
                compiled = step.lower(state0, batch).compile()
                mem = {}
                try:
                    ma = compiled.memory_analysis()
                    mem = {"temp_gib": round(
                        ma.temp_size_in_bytes / 2**30, 2)}
                except Exception:
                    pass
                flops = _cost_flops(compiled)
                state = jax.tree_util.tree_map(jnp.copy, state0)
                # axon defers OOM to execution; the warm call is part of
                # the fits/does-not-fit probe, not just warmup.
                state, warm = compiled(state, batch)
                _fetch_scalar(warm["train_loss"])
            except Exception as e:  # OOM -> escalate remat
                verdict = _classify(e)
                if verdict is None:
                    raise
                fam_rec[f"train_b{bsz}_remat_{remat or 'none'}"] = verdict
                print(f"#   train b{bsz} remat='{remat}': {verdict} "
                      f"({str(e)[:100]})", file=sys.stderr, flush=True)
                del batch, state, compiled
                continue
            holder = {"state": state}

            def one_call():
                holder["state"], metrics = compiled(holder["state"], batch)
                return metrics["train_loss"]

            best = _timed_best(one_call, rounds=rounds)
            step_time = best / rounds
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
            del holder, state, batch, compiled
            done = True
            break
        if not done:
            fam_rec[f"train_b{bsz}_remat"] = "DOES NOT FIT (all recipes)"
            print(f"#   train b{bsz}: does not fit under any remat recipe",
                  file=sys.stderr, flush=True)
        flush()

    print(json.dumps({family: fam_rec, "device": record["device"]}))
    print(f"# artifact -> {out_path}", file=sys.stderr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--families", default="sdxl,sparse")
    parser.add_argument("--batches", default="16,64")
    parser.add_argument("--rounds", type=int, default=8)
    parser.add_argument(
        "--out", default=os.path.join(REPO, "artifacts", "family_cost_v5e.json")
    )
    parser.add_argument(
        "--ladder", default=None,
        help="comma-separated remat rungs to try (default: per-family "
             "ladder); e.g. 'chunk8,chunk4' to skip known-OOM rungs",
    )
    parser.add_argument(
        "--train_only", action="store_true",
        help="skip the inference measurements (existing rows are kept)",
    )
    args = parser.parse_args()
    families = [f.strip() for f in args.families.split(",") if f.strip()]
    ladder = (tuple(r.strip() for r in args.ladder.split(","))
              if args.ladder is not None else None)

    if len(families) == 1:
        run_family(families[0], [int(b) for b in args.batches.split(",")],
                   args.rounds, args.out, ladder, args.train_only)
        return

    # One subprocess per family: a family that OOMs the chip leaves dead
    # device buffers behind until process exit, poisoning later families.
    for family in families:
        rc = subprocess.call([
            sys.executable, os.path.abspath(__file__),
            "--families", family, "--batches", args.batches,
            "--rounds", str(args.rounds), "--out", args.out,
        ] + (["--ladder", args.ladder] if args.ladder is not None else [])
          + (["--train_only"] if args.train_only else []))
        if rc != 0:
            print(f"# family {family}: subprocess rc={rc}",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
