#!/usr/bin/env python
"""Online-serving latency: per-request wall time at small batch sizes.

The throughput benches (bench.py, tools/serving_sweep.py) measure offline
scoring, the only mode the reference exercises (Evaluate.ipynb cell 14).
Production serving also cares about single-request latency, so this measures
the full dispatch -> execute -> fetch round trip per request at batch 1/4/16
on the production dense config.

Honesty notes (same grounds as PARITY.md "Timing methodology"):

* ``jax.block_until_ready`` returns early on this tunneled backend, so each
  request is closed by a device->host scalar fetch — exactly what a serving
  caller that needs the probabilities would do anyway.
* The tunnel adds a measured RPC floor (~27-37 ms, run-to-run variance)
  that a production host-attached v5e does not pay; the artifact records
  the floor beside the raw round trips.  Floor subtraction is left to the
  reader: both quantities swing ±25%, so the difference is noise — the
  offline per-batch time (batch_size / serving_sweep throughput) is the
  sound per-request compute reference.

    python tools/latency_bench.py        # stderr table + one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (1, 4, 16)
REQUESTS = 240


def _percentiles(samples):
    # no p99: even at 240 samples it is defined by the worst 2-3 requests,
    # which on the ±25%-variance tunnel record hiccups, not serving latency;
    # max_ms is reported explicitly AS the worst observed hiccup instead
    return {
        "p50_ms": round(float(np.percentile(samples, 50)) * 1e3, 2),
        "p95_ms": round(float(np.percentile(samples, 95)) * 1e3, 2),
        "max_ms": round(float(np.max(samples)) * 1e3, 2),
    }


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_setup
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.data.batcher import Batcher
    from dune_transformercvn_tpu.utils.cache import (
        enable_compile_cache, enable_fast_prng,
    )

    enable_compile_cache()
    enable_fast_prng()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    options = Options.load(os.path.join(
        root, "option_files", "fdhd_beam_2018prod_2023_08_07.json"))
    options.compute_dtype = "bfloat16"
    options.coo_bucket_granularity = 8192

    dataset, batcher, cfg, model, norm = _synthetic_setup(
        options, num_events=192
    )
    norm = {k: jnp.asarray(v) for k, v in norm.items()}
    variables = jax.jit(lambda r, b, n: model.init(r, b, n, train=False))(
        jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in batcher.build_batch(
            np.arange(options.batch_size)).items()},
        norm,
    )

    @jax.jit
    def predict(variables, batch, norm):
        ev, pr = model.apply(variables, batch, norm, train=False)
        return jax.nn.softmax(ev, -1), jax.nn.softmax(pr, -1)

    # RPC floor: dispatch + fetch of a FRESHLY computed device scalar (a
    # ready/committed array short-circuits to a host-side copy and measures
    # ~0 ms; a new result buffer forces the real tunnel round trip)
    bump = jax.jit(lambda v: v + 1.0)
    acc = bump(jnp.zeros(()))
    jax.device_get(acc)
    floor = []
    for _ in range(40):
        t0 = time.perf_counter()
        acc = bump(acc)
        jax.device_get(acc)
        floor.append(time.perf_counter() - t0)
    floor_p50 = float(np.percentile(floor, 50))

    record = {
        "bench": "serving_latency",
        "device": str(jax.devices()[0]),
        "config": "production fdhd dense, bf16, request = dispatch+execute+"
                  "fetch(event probs)",
        "rpc_floor_p50_ms": round(floor_p50 * 1e3, 2),
        "note": "raw percentiles INCLUDE the tunnel's RPC floor (a "
                "host-attached chip does not pay it); subtracting the floor "
                "is noise-dominated (both quantities swing ±25% run to "
                "run), so per-request device compute is better read from "
                "the offline per-batch time: batch_size / serving_sweep "
                "throughput, e.g. 13.9 ms at b16",
    }
    for bsz in BATCHES:
        b = Batcher(dataset, batch_size=bsz,
                    coo_granularity=options.coo_bucket_granularity)
        batches = [
            {k: jnp.asarray(v) for k, v in b.build_batch(
                (np.arange(bsz) + bsz * i) % len(dataset)).items()}
            for i in range(4)
        ]
        for bb in batches:  # warm every bucket signature
            jax.device_get(predict(variables, bb, norm)[0])
        samples = []
        for i in range(REQUESTS):
            bb = batches[i % len(batches)]
            t0 = time.perf_counter()
            ev, _ = predict(variables, bb, norm)
            jax.device_get(ev[0, 0])
            samples.append(time.perf_counter() - t0)
        stats = _percentiles(samples)
        record[f"b{bsz}"] = stats
        print(f"# b{bsz}: {stats}", file=sys.stderr, flush=True)

    out = os.path.join(root, "artifacts", "serving_latency_v5e.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    print(f"# artifact -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
