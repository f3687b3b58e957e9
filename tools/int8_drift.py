#!/usr/bin/env python
"""Measure the int8 PTQ inference path (ops/quant.py) at production scale
on the chip: probability drift vs the bf16 deployment path, argmax
agreement, and serving throughput for both.

Protocol mirrors bench.py's inference measurement (sound device-fetch
timing, best-of-N windows) on the production dense config (DenseNet
[3,6,12,6,3] growth 32, hidden 128, 6 encoder layers).  Activation scales
are calibrated on batches disjoint from the measured ones.

The reference has no quantized path (CreateCompiled.ipynb exports fp32
TorchScript); this tool decides whether int8 is a real serving lever on
this hardware or an honest negative for PARITY.md.

    python tools/int8_drift.py      # stderr table + one JSON line
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 64          # serving shape (lane-aligned ladder, amortized dispatch)
CALIB_BATCHES = 2   # calibration batches, disjoint from the timed ones
TIMED_BATCHES = 3
ROUNDS = 6


def main():
    import jax
    import jax.numpy as jnp

    from bench import _inference_eps
    from __graft_entry__ import _synthetic_setup
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.ops.quant import (
        calibrate_activation_scales, quantized_convs,
    )
    from dune_transformercvn_tpu.utils.cache import (
        enable_compile_cache, enable_fast_prng,
    )

    enable_compile_cache()
    enable_fast_prng()

    options = Options.load(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "option_files", "fdhd_beam_2018prod_2023_08_07.json")
    )
    options.batch_size = BATCH
    options.compute_dtype = "bfloat16"
    options.coo_bucket_granularity = 8192

    dataset, batcher, cfg, model, norm = _synthetic_setup(
        options, num_events=(CALIB_BATCHES + TIMED_BATCHES) * BATCH
    )
    norm = {k: jnp.asarray(v) for k, v in norm.items()}

    def batch_at(i):
        idx = (np.arange(BATCH) + BATCH * i) % len(dataset)
        return {k: jnp.asarray(v) for k, v in batcher.build_batch(idx).items()}

    calib = [batch_at(i) for i in range(CALIB_BATCHES)]
    timed = [batch_at(CALIB_BATCHES + i) for i in range(TIMED_BATCHES)]

    variables = jax.jit(lambda r, b, n: model.init(r, b, n, train=False))(
        jax.random.PRNGKey(0), calib[0], norm
    )
    fold = "--fold" in sys.argv
    if fold:
        # Re-judge int8 on the BN-folded serving graph (ops/fold.py): once
        # the BN elementwise bytes are gone, the conv MXU time int8 halves
        # becomes the binding term — the round-3 analysis predicted the
        # int8 verdict flips only in this regime.
        from dune_transformercvn_tpu.ops.fold import fold_eval_batchnorm

        variables = jax.jit(lambda v: fold_eval_batchnorm(v)[0])(variables)
        print("# measuring on the BN-FOLDED graph", file=sys.stderr, flush=True)

    scales = calibrate_activation_scales(model, variables, calib, norm)
    print(f"# calibrated {len(scales)} conv activation scales on "
          f"{CALIB_BATCHES} batches", file=sys.stderr, flush=True)

    @jax.jit
    def predict(variables, batch, norm):
        ev, pr = model.apply(variables, batch, norm, train=False)
        return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

    @jax.jit
    def predict_q(variables, batch, norm):
        with quantized_convs(variables["params"], scales):
            ev, pr = model.apply(variables, batch, norm, train=False)
        return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

    # ---- drift on the timed (held-out) batches -----------------------------
    record = {"bench": "int8_drift_folded" if fold else "int8_drift",
              "device": str(jax.devices()[0]),
              "config": "production fdhd (hidden 128, [3,6,12,6,3], 6 layers)",
              "batch": BATCH, "num_conv_scales": len(scales),
              "bn_folded": fold}
    ev_all, pr_all, evq_all, prq_all, w_all = [], [], [], [], []
    for b in timed:
        ev, pr = jax.device_get(predict(variables, b, norm))
        evq, prq = jax.device_get(predict_q(variables, b, norm))
        ev_all.append(np.asarray(ev, np.float64))
        pr_all.append(np.asarray(pr, np.float64))
        evq_all.append(np.asarray(evq, np.float64))
        prq_all.append(np.asarray(prq, np.float64))
        w_all.append(np.asarray(jax.device_get(b["prong_mask"]), bool))
    for name, a, b, mask in (
        ("event", np.concatenate(ev_all), np.concatenate(evq_all), None),
        ("prong", np.concatenate(pr_all), np.concatenate(prq_all),
         np.concatenate(w_all)),
    ):
        if mask is not None:   # drop padded prong rows from the statistics
            a, b = a[mask], b[mask]
        abs_d = np.abs(a - b)
        agree = float(np.mean(np.argmax(a, -1) == np.argmax(b, -1)))
        record[f"{name}_max_prob_delta"] = round(float(abs_d.max()), 6)
        record[f"{name}_mean_prob_delta"] = round(float(abs_d.mean()), 6)
        record[f"{name}_argmax_agreement"] = round(agree, 6)
        print(f"# {name}: max|dp|={abs_d.max():.5f} mean|dp|={abs_d.mean():.6f}"
              f" argmax agree={agree:.4f}", file=sys.stderr, flush=True)

    # ---- serving throughput: bf16 vs int8 ----------------------------------
    eps_bf16 = _inference_eps(
        lambda b: predict(variables, b, norm), timed,
        len(timed) * BATCH, rounds=ROUNDS,
    )
    eps_int8 = _inference_eps(
        lambda b: predict_q(variables, b, norm), timed,
        len(timed) * BATCH, rounds=ROUNDS,
    )
    record["bf16_events_per_second"] = round(eps_bf16, 1)
    record["int8_events_per_second"] = round(eps_int8, 1)
    record["int8_speedup"] = round(eps_int8 / eps_bf16, 4)
    print(f"# throughput b{BATCH}: bf16 {eps_bf16:.0f} ev/s, int8 "
          f"{eps_int8:.0f} ev/s ({eps_int8 / eps_bf16:.2f}x)",
          file=sys.stderr, flush=True)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        "int8_drift_folded_v5e.json" if fold else "int8_drift_v5e.json",
    )
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    print(f"# artifact -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
