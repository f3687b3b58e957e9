#!/usr/bin/env python
"""Measure bf16-vs-fp32 logits drift at production scale on the chip.

The golden parity tests pin the fp32 math against the reference
(tests/test_reference_parity.py, incl. production width); this tool closes
the remaining question — how far the deployed bf16 compute path drifts
from that pinned fp32 path at the production depth (DenseNet [3,6,12,6,3]
growth 32, hidden 128, 6 encoder layers), where bf16 accumulation and the
long BN chain have the most room to wander.

Same fp32 parameters, same batch, two compute dtypes; reports max |delta|,
max relative delta over the event and prong logits, and argmax agreement
(the number a physicist cares about: do the class decisions change?).

    python tools/bf16_drift.py      # prints a table + one JSON line
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 16


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_setup
    from dune_transformercvn_tpu.config import Options
    from dune_transformercvn_tpu.models.network import ModelConfig, TransformerCVN

    options = Options.load(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "option_files", "fdhd_beam_2018prod_2023_08_07.json")
    )
    options.batch_size = BATCH
    options.coo_bucket_granularity = 8192

    options.compute_dtype = "float32"
    dataset, batcher, cfg32, model32, norm = _synthetic_setup(
        options, num_events=2 * BATCH
    )
    batch = {k: jnp.asarray(v) for k, v in batcher.build_batch(
        np.arange(BATCH)).items()}
    norm = {k: jnp.asarray(v) for k, v in norm.items()}

    variables = jax.jit(lambda r, b, n: model32.init(r, b, n, train=False))(
        jax.random.PRNGKey(0), batch, norm
    )

    # same fp32 params, bf16 compute path (params stay fp32 by design)
    import dataclasses

    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    model16 = TransformerCVN(cfg16)

    ev32, pr32 = jax.jit(
        lambda v, b, n: model32.apply(v, b, n, train=False)
    )(variables, batch, norm)
    ev16, pr16 = jax.jit(
        lambda v, b, n: model16.apply(v, b, n, train=False)
    )(variables, batch, norm)

    record = {"bench": "bf16_drift", "device": str(jax.devices()[0]),
              "config": "production fdhd (hidden 128, [3,6,12,6,3], 6 layers)",
              "batch": BATCH}
    for name, a, b in (("event", ev32, ev16), ("prong", pr32, pr16)):
        a = np.asarray(jax.device_get(a), np.float64)
        b = np.asarray(jax.device_get(b), np.float64).astype(np.float64)
        abs_d = np.abs(a - b)
        rel_d = abs_d / np.maximum(np.abs(a), 1e-3)
        agree = float(np.mean(np.argmax(a, -1) == np.argmax(b, -1)))
        record[f"{name}_max_abs"] = round(float(abs_d.max()), 6)
        record[f"{name}_max_rel"] = round(float(rel_d.max()), 6)
        record[f"{name}_argmax_agreement"] = agree
        print(
            f"# {name}: max|d|={abs_d.max():.5f} max rel={rel_d.max():.5f} "
            f"argmax agree={agree:.4f}",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
