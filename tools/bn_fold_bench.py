#!/usr/bin/env python
"""Measure the eval-time BN-fold serving uplift (ops/fold.py) on the chip.

Round-3 profiling showed the deployed (inference) step is HBM-bound in the
BN/PReLU elementwise chains (artifacts/int8_drift_v5e.json analysis); at
eval, masked BN is a pure per-channel affine, so folding it into the
adjacent conv weights removes those whole read/write passes.  This tool
times the production dense config at batch 16 (the reference-protocol
shape) and batch 64 (the serving shape) with raw vs folded variables,
checks probability drift, and writes artifacts/bn_fold_v5e.json.

    python tools/bn_fold_bench.py     # stderr table + one JSON line
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = 3
ROUNDS = {16: 12, 64: 6}


def main():
    import jax
    import jax.numpy as jnp

    from bench import _inference_eps
    from __graft_entry__ import _synthetic_setup
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data.batcher import Batcher
    from dune_transformercvn_tpu.ops.fold import fold_eval_batchnorm
    from dune_transformercvn_tpu.utils.cache import (
        enable_compile_cache, enable_fast_prng,
    )

    enable_compile_cache()
    enable_fast_prng()

    options = Options.load(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "option_files", "fdhd_beam_2018prod_2023_08_07.json")
    )
    options.batch_size = 64
    options.compute_dtype = "bfloat16"
    options.coo_bucket_granularity = 8192

    dataset, batcher64, cfg, model, norm = _synthetic_setup(
        options, num_events=BATCHES * 64
    )
    norm = {k: jnp.asarray(v) for k, v in norm.items()}

    def batches_for(batcher, size):
        return [
            {k: jnp.asarray(v) for k, v in batcher.build_batch(
                (np.arange(size) + size * i) % len(dataset)).items()}
            for i in range(BATCHES)
        ]

    batcher16 = Batcher(
        dataset, batch_size=16, coo_granularity=options.coo_bucket_granularity
    )
    per_batch = {16: batches_for(batcher16, 16), 64: batches_for(batcher64, 64)}

    variables = jax.jit(lambda r, b, n: model.init(r, b, n, train=False))(
        jax.random.PRNGKey(0), per_batch[64][0], norm
    )
    count = []

    def _fold(v):
        folded, n = fold_eval_batchnorm(v)
        count.append(n)
        return folded

    folded = jax.jit(_fold)(variables)

    @jax.jit
    def predict(variables, batch, norm):
        ev, pr = model.apply(variables, batch, norm, train=False)
        return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

    record = {"bench": "bn_fold", "device": str(jax.devices()[0]),
              "config": "production fdhd (hidden 128, [3,6,12,6,3], 6 layers)",
              "num_folds": count[0] if count else None,
              "note": "measured NEUTRAL: per-op profiling of the eval step "
                      "shows XLA already fuses the eval BN affine + PReLU "
                      "into the convolution fusions (loop fusions = 0.3% of "
                      "the b64 inference step), so folding removes no pass; "
                      "the train-step BN statistics chains do not exist in "
                      "eval graphs"}

    # ---- drift (bf16 compute: fold reassociation ~ bf16 rounding) ----------
    ev_r, pr_r = jax.device_get(predict(variables, per_batch[64][0], norm))
    ev_f, pr_f = jax.device_get(predict(folded, per_batch[64][0], norm))
    mask = np.asarray(
        jax.device_get(per_batch[64][0]["prong_targets"])) >= 0
    for name, a, b in (
        ("event", np.asarray(ev_r, np.float64), np.asarray(ev_f, np.float64)),
        ("prong", np.asarray(pr_r, np.float64)[mask],
         np.asarray(pr_f, np.float64)[mask]),
    ):
        abs_d = np.abs(a - b)
        record[f"{name}_max_prob_delta"] = round(float(abs_d.max()), 6)
        record[f"{name}_argmax_agreement"] = round(
            float(np.mean(np.argmax(a, -1) == np.argmax(b, -1))), 6)
        print(f"# {name}: max|dp|={abs_d.max():.5f} argmax agree="
              f"{record[f'{name}_argmax_agreement']:.4f}",
              file=sys.stderr, flush=True)

    # ---- throughput raw vs folded at both serving shapes -------------------
    for size, batches in per_batch.items():
        eps_raw = _inference_eps(
            lambda b: predict(variables, b, norm), batches,
            len(batches) * size, rounds=ROUNDS[size],
        )
        eps_fold = _inference_eps(
            lambda b: predict(folded, b, norm), batches,
            len(batches) * size, rounds=ROUNDS[size],
        )
        record[f"b{size}_raw_events_per_second"] = round(eps_raw, 1)
        record[f"b{size}_folded_events_per_second"] = round(eps_fold, 1)
        record[f"b{size}_fold_speedup"] = round(eps_fold / eps_raw, 4)
        print(f"# b{size}: raw {eps_raw:.0f} ev/s -> folded {eps_fold:.0f} "
              f"ev/s ({eps_fold / eps_raw:.2f}x)", file=sys.stderr, flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "bn_fold_v5e.json",
    )
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    print(f"# artifact -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
