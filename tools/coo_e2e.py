#!/usr/bin/env python
"""End-to-end production train/inference: `--embedder coo` vs `--embedder dense`.

The stem-level crossover (`tools/coo_crossover.py`) showed the Pallas COO
stem beating the dense conv at 0.1% occupancy (1.16 vs 1.23 ms) — and the
COO family also skips the full-resolution densify entirely (the stem
consumes the raw hit banks).  This tool answers the production question:
does that stem win survive a FULL train step (fwd+bwd+AdamW, bf16,
production config) and the inference loop, at the detector's occupancy
regime (~0.1% event images, ~0.05% prong images — the synthetic file
matches it)?

Structure mirrors bench.py's train_bench (one shared init at the smallest
batch; per-size AOT compiles; stage-scoped buffers) — a per-size jitted
init at b64 plus live inference executables trips the sandbox's
remote-compile helper.

    python tools/coo_e2e.py        # table on stderr + one JSON line
"""

from __future__ import annotations

import gc
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cost_flops, _fetch_scalar, _timed_best  # noqa: E402


def measure_family(embedder, batch_sizes=(16, 64)):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_setup
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data.batcher import Batcher
    from dune_transformercvn_tpu.parallel.mesh import create_mesh
    from dune_transformercvn_tpu.train import schedules
    from dune_transformercvn_tpu.train.optimizer import create_optimizer
    from dune_transformercvn_tpu.train.state import create_train_state
    from dune_transformercvn_tpu.train.step import make_train_step

    options = Options.load(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "option_files", "fdhd_beam_2018prod_2023_08_07.json")
    )
    options.batch_size = max(batch_sizes)
    options.compute_dtype = "bfloat16"

    dataset, _, cfg, model, norm = _synthetic_setup(
        options, num_events=192, embedder=embedder
    )
    norm = {k: jnp.asarray(v) for k, v in norm.items()}

    batches = {}
    for bsz in batch_sizes:
        batcher = Batcher(dataset, batch_size=bsz,
                          coo_granularity=options.coo_bucket_granularity)
        batches[bsz] = {
            k: jnp.asarray(v)
            for k, v in batcher.build_batch(np.arange(bsz)).items()
        }

    out = {}

    # ---- full train step (shared init at the smallest batch) --------------
    mesh = create_mesh(1)
    schedule = schedules.from_options(options, steps_per_epoch=100)
    tx = create_optimizer(options, schedule)
    state0 = create_train_state(model, tx, batches[batch_sizes[0]], norm, seed=0)

    for bsz in batch_sizes:
        options.batch_size = bsz
        batch = batches[bsz]
        state = jax.tree_util.tree_map(jnp.copy, state0)
        try:
            step = make_train_step(model, tx, options, mesh).lower(
                state, batch
            ).compile()
        except Exception as exc:  # HBM OOM at compile (coo b64)
            out[f"train_b{bsz}_error"] = type(exc).__name__
            print(f"# {embedder} b{bsz}: FAILED ({type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:120]})",
                  file=sys.stderr, flush=True)
            del state
            gc.collect()
            continue
        flops = _cost_flops(step)
        state, warm = step(state, batch)
        _fetch_scalar(warm["train_loss"])
        holder = {"state": state}

        def one_call():
            holder["state"], metrics = step(holder["state"], batch)
            return metrics["train_loss"]

        rounds = 24 if bsz <= 16 else 8
        best = _timed_best(one_call, rounds=rounds)
        step_time = best / rounds
        out[f"train_b{bsz}_ms_per_step"] = round(step_time * 1e3, 2)
        out[f"train_b{bsz}_events_per_second"] = round(bsz / step_time, 2)
        if flops:
            out[f"train_b{bsz}_tflops_per_step"] = round(flops / 1e12, 3)
        print(
            f"# {embedder} b{bsz}: {step_time*1e3:.2f} ms/step = "
            f"{bsz/step_time:.1f} ev/s"
            + (f", {flops/1e12:.3f} TFLOP/step" if flops else ""),
            file=sys.stderr, flush=True,
        )
        del step, state, holder, warm
        gc.collect()
    del state0, tx, schedule
    gc.collect()

    # ---- inference, batch 16 (the BASELINE protocol) -----------------------
    options.batch_size = 16
    batcher16 = Batcher(dataset, batch_size=16,
                        coo_granularity=options.coo_bucket_granularity)
    infer_batches = [
        {k: jnp.asarray(v) for k, v in batcher16.build_batch(idx).items()}
        for idx in (np.arange(16) + 16 * i for i in range(8))
    ]
    variables = jax.jit(lambda r, b, n: model.init(r, b, n, train=False))(
        jax.random.PRNGKey(0), infer_batches[0], norm
    )

    @jax.jit
    def predict(variables, batch, norm):
        ev, pr = model.apply(variables, batch, norm, train=False)
        return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

    for b in infer_batches:
        _fetch_scalar(predict(variables, b, norm))

    def all_batches():
        res = None
        for b in infer_batches:
            res = predict(variables, b, norm)
        return res

    rounds = 8
    elapsed = _timed_best(all_batches, rounds=rounds)
    out["infer_b16_events_per_second"] = round(
        rounds * len(infer_batches) * 16 / elapsed, 2
    )
    print(f"# {embedder} inference b16: "
          f"{out['infer_b16_events_per_second']} ev/s",
          file=sys.stderr, flush=True)
    return out


def main():
    import jax

    from dune_transformercvn_tpu.utils.cache import (
        enable_compile_cache, enable_fast_prng,
    )

    enable_compile_cache()
    enable_fast_prng()

    record = {
        "bench": "coo_vs_dense_end_to_end",
        "device": str(jax.devices()[0]),
        "config": "production fdhd dense config, bf16, synthetic occupancy "
                  "~0.14% event / ~0.05% prong images",
    }
    for embedder in ("dense", "coo"):
        record[embedder] = measure_family(embedder)
        gc.collect()
    d, c = record["dense"], record["coo"]
    for key in ("train_b16", "train_b64", "infer_b16"):
        k = f"{key}_events_per_second"
        if k in d and k in c:
            record[f"coo_vs_dense_{key}"] = round(c[k] / d[k], 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
