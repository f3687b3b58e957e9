"""StableHLO export: the compiled-inference hook for the C++ LArSoft module.

The reference exports three TorchScript graphs (CreateCompiled.ipynb cells
6-14), each taking ONE tensor ``[(1+Npng), 3, 400, 280]`` of raw pixel
counts, with dummy features/extra/masks synthesized inside the graph and the
10-class event output folded to 4 via ``[sum 0:4, sum 4:8, 8, 9]``:

* ``pid``       -> (event softmax [4], prong softmax [Npng, 8])
* ``embeddings``-> (event vector [128], prong vectors [Npng, 128])
* ``combined``  -> all four

The TPU-native replacement serializes the same three graphs through
``jax.export`` (StableHLO).  TPUs want static shapes, so the exported graphs
take the padded maximum ``[1 + max_prongs, C, H, W]`` plus a scalar
``num_prongs``; rows past ``num_prongs`` are masked inside the graph and the
caller reads the first ``num_prongs`` output rows.  The C++ side loads the
artifact through the PJRT C API (native/pjrt_loader.cc); Python can round-
trip it with ``jax.export.deserialize`` (used by the tests).
"""

from __future__ import annotations

import json
import os
from dataclasses import replace
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.network import ModelConfig, TransformerCVN

VARIANTS = ("pid", "embeddings", "combined")

# Default prong-capacity ladder for bucketed exports.  The reference's
# TorchScript graphs take a *dynamic* Npng (CreateCompiled.ipynb cell 6:
# `pixel_maps.shape[0] - 1` drives the graph), so a 3-prong event pays 4
# CNN passes in LArSoft; a static max_prongs graph pays 21.  Exporting a
# small ladder of static capacities recovers the serving cost scaling with
# zero dynamic shapes: the caller picks a bucket >= Npng.
# Rung cost is NOT monotone in capacity: XLA's conv-strategy choice flips
# between compilations of nearby shapes (artifacts/export_buckets_v5e.json:
# P=8 measured 1.43 ms/event in round 4 but 2.6 ms at round-5 HEAD, while
# P=4 reproduced at 1.55 both times).  The ladder therefore keeps the
# small rung and dispatch is COST-AWARE: `export_model(bench_buckets=True)`
# measures each rung on the serving backend and records `bucket_ms` in the
# export meta; `select_bucket` and the C++ loader pick the cheapest
# eligible rung, falling back to smallest-capacity when no costs exist.
DEFAULT_PRONG_BUCKETS = (4, 8, 12)


def _normalize_buckets(
    prong_buckets: Sequence[int] | None, max_prongs: int
) -> Tuple[int, ...]:
    """Sorted unique capacities clipped to [1, max_prongs]; the full
    capacity is always present so every event has a bucket."""
    buckets = set(int(p) for p in (prong_buckets or ()))
    buckets = {p for p in buckets if 1 <= p < max_prongs}
    buckets.add(max_prongs)
    return tuple(sorted(buckets))


def select_bucket(prong_buckets: Sequence[int], num_prongs: int,
                  bucket_ms: Dict[int, float] | None = None) -> int:
    """Serving-side dispatch rule (mirrored in C++ by
    native/pjrt_loader.cc): among exported capacities >= ``num_prongs``,
    pick the *cheapest* by measured per-event cost when every eligible
    rung has one (``bucket_ms`` from the export meta's ``bench_buckets``
    pass; ties break to the smaller capacity), else the smallest
    capacity.  Cost-aware selection exists because rung cost is not
    monotone in capacity — see DEFAULT_PRONG_BUCKETS."""
    eligible = [p for p in prong_buckets if p >= num_prongs]
    if not eligible:
        return max(prong_buckets)
    if bucket_ms and all(p in bucket_ms for p in eligible):
        return min(eligible, key=lambda p: (bucket_ms[p], p))
    return min(eligible)


def _time_bucket_ms(fn, example_pixels, example_n, *,
                    rounds: int = 96, repeats: int = 4) -> float:
    """Per-event device ms of one rung's pid graph, best-of-``repeats``
    windows of ``rounds`` back-to-back calls.  Completion barrier is a
    fresh device->host scalar fetch and the measured fetch floor is
    subtracted — ``jax.block_until_ready`` returns early on the axon
    backend (see bench.py ``_timed_best``, the canonical protocol)."""
    import time

    jfn = jax.jit(fn)

    def fetch(out):
        return float(jax.device_get(jax.tree_util.tree_leaves(out)[0]
                                    .ravel()[0]))

    out = jfn(example_pixels, example_n)
    fetch(out)
    floor = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        fetch(out)
        floor = min(floor, time.perf_counter() - start)
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        for _ in range(rounds):
            out = jfn(example_pixels, example_n)
        fetch(out)
        best = min(best, time.perf_counter() - start)
    return round(max(best - floor, 1e-9) / rounds * 1e3, 4)


def _fold_event_probs(probs: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Fold detailed 10-class softmax onto the 4 current classes
    (CreateCompiled.ipynb cell 6: [sum 0:4, sum 4:8, 8, 9])."""
    if num_classes != 10:
        return probs
    return jnp.stack(
        [
            probs[..., 0:4].sum(-1),
            probs[..., 4:8].sum(-1),
            probs[..., 8],
            probs[..., 9],
        ],
        axis=-1,
    )


def build_inference_fn(model: TransformerCVN, variant: str):
    """One-event inference graph over raw pixel maps.

    Signature: (variables, norm, pixel_maps [1+P, C, H, W] raw counts,
    num_prongs scalar int32) -> variant-dependent tuple.
    """
    cfg = model.cfg
    max_prongs = cfg.max_prongs
    if cfg.one_hot_pixels:
        # The reference exporter also hardcodes /255-or-log1p preprocessing
        # (CreateCompiled.ipynb cell 6); one-hot models need a bespoke graph.
        raise NotImplementedError(
            "export of one_hot_pixels models is not supported (the raw-count "
            "input convention assumes /255 or log1p preprocessing)"
        )

    def fn(variables, norm, pixel_maps, num_prongs):
        # NCHW (the LArSoft convention) -> NHWC, preprocess without noise
        images = jnp.transpose(pixel_maps, (0, 2, 3, 1)).astype(jnp.float32)
        images = jnp.log1p(images) if cfg.log_pixels else images / 255.0
        images = images.astype(cfg.dtype)

        event_images = images[:1]
        prong_images = images[1:]

        prong_ids = jnp.arange(max_prongs, dtype=jnp.int32)
        real = prong_ids < num_prongs
        # zero out padding rows so BatchNorm masking has nothing to leak
        prong_images = prong_images * real[:, None, None, None].astype(images.dtype)

        # dummy reco features/extra (cell 6 synthesizes zeros + ones masks)
        features = jnp.zeros((1, max_prongs, cfg.features_dim), jnp.float32)
        extra = jnp.zeros((1, cfg.extra_dim), jnp.float32)
        prong_mask = real[None, :]
        slot_batch = jnp.where(real, 0, 1).astype(jnp.int32)   # 1 == OOB pad
        slot_pos = prong_ids
        slot_mask = real

        event_logits, prong_logits, event_hidden, prong_hidden = model.apply(
            variables,
            event_images, prong_images, features, extra, prong_mask,
            slot_batch, slot_pos, slot_mask, norm, False,
            method=TransformerCVN.forward_from_images,
        )

        # split-mode models carry generation logits after the first
        # num_event_classes columns; the exported PID is the current head
        event_probs = jax.nn.softmax(event_logits[0][: cfg.num_event_classes], axis=-1)
        event_probs = _fold_event_probs(event_probs, cfg.num_event_classes)
        prong_probs = jax.nn.softmax(prong_logits[0], axis=-1)

        if variant == "pid":
            return event_probs, prong_probs
        if variant == "embeddings":
            return event_hidden[0], prong_hidden[0]
        return event_probs, prong_probs, event_hidden[0], prong_hidden[0]

    return fn


def export_model(
    model: TransformerCVN,
    variables,
    norm,
    output_dir: str,
    prefix: str = "transformercvn",
    platforms: Tuple[str, ...] | None = None,
    prong_buckets: Sequence[int] | None = None,
    bench_buckets: bool = False,
) -> Dict[str, str]:
    """Serialize the three inference graphs; returns {variant[_pP]: path}.

    Two artifacts per variant (and per prong-capacity bucket):

    * ``{prefix}_{variant}[_pP].stablehlo`` — the full ``jax.export``
      envelope (calling convention + shapes + platform checks); Python
      round-trips it with ``jax.export.deserialize``.
    * ``…stablehlo.mlirbc`` — the inner StableHLO portable artifact
      (``exported.mlir_module_serialized``), the bytes the C++ side feeds
      to ``PJRT_Client_Compile`` as format ``"mlir"``
      (native/pjrt_loader.cc). PJRT wants this inner module, not the
      envelope.

    ``prong_buckets`` exports a ladder of static prong capacities sharing
    the one checkpoint (the full capacity is always included and keeps the
    unsuffixed legacy filename).  A caller serving an Npng-prong event
    picks the smallest bucket >= Npng so CNN cost scales with the real
    prong count instead of max_prongs — the static-shape answer to the
    reference's dynamic-Npng TorchScript graphs (CreateCompiled.ipynb
    cell 6).  No parameter shape depends on max_prongs (position
    embeddings are per-type), so every bucket reuses ``variables``.

    ``platforms`` lowers for specific backends (e.g. ``("tpu",)`` when
    exporting from a CPU host for the LArSoft TPU hook); ``None`` uses
    the current default backend.

    ``bench_buckets`` additionally times each rung's pid graph on the
    CURRENT backend and records per-event ``bucket_ms`` in the export
    meta; serving-side dispatch (``select_bucket`` / the C++ loader)
    then picks the cheapest eligible rung instead of the smallest —
    rung cost is not monotone in capacity (see DEFAULT_PRONG_BUCKETS).
    Run it on the serving backend for the costs to be meaningful.
    """
    cfg = model.cfg
    os.makedirs(output_dir, exist_ok=True)

    buckets = _normalize_buckets(prong_buckets, cfg.max_prongs)
    pixel_shape = (1 + cfg.max_prongs, cfg.pixel_channels,
                   cfg.image_height, cfg.image_width)
    example_n = jnp.asarray(3, jnp.int32)
    norm = {k: jnp.asarray(v) for k, v in norm.items()}

    paths = {}
    exported_platforms = None
    output_avals: Dict[str, list] = {}
    bucket_files: Dict[str, Dict[str, str]] = {v: {} for v in VARIANTS}
    bucket_ms: Dict[str, float] = {}
    for bucket in buckets:
        bucket_model = (
            model if bucket == cfg.max_prongs
            else TransformerCVN(replace(cfg, max_prongs=bucket))
        )
        example_pixels = jnp.zeros(
            (1 + bucket,) + pixel_shape[1:], jnp.float32)
        suffix = "" if bucket == cfg.max_prongs else f"_p{bucket}"
        for variant in VARIANTS:
            fn = build_inference_fn(bucket_model, variant)
            closed = lambda pixels, n, _fn=fn: _fn(variables, norm, pixels, n)
            export_kwargs = {} if platforms is None else {"platforms": platforms}
            exported = jax.export.export(jax.jit(closed), **export_kwargs)(
                example_pixels, example_n)
            exported_platforms = list(exported.platforms)
            if bucket == cfg.max_prongs:
                output_avals[variant] = [
                    {"shape": list(a.shape), "dtype": str(a.dtype)}
                    for a in exported.out_avals
                ]
            name = f"{prefix}_{variant}{suffix}.stablehlo"
            path = os.path.join(output_dir, name)
            with open(path, "wb") as f:
                f.write(exported.serialize())
            with open(path + ".mlirbc", "wb") as f:
                f.write(exported.mlir_module_serialized)
            paths[variant + suffix] = path
            bucket_files[variant][str(bucket)] = name
            if bench_buckets and variant == "pid":
                bucket_ms[str(bucket)] = _time_bucket_ms(
                    closed, example_pixels, example_n)

    with open(os.path.join(output_dir, f"{prefix}_export_meta.json"), "w") as f:
        json.dump(
            {
                "input_shape": list(pixel_shape),
                "input_dtypes": ["f32", "i32"],
                "platforms": exported_platforms,
                "outputs": output_avals,
                "max_prongs": cfg.max_prongs,
                "prong_buckets": list(buckets),
                "bucket_files": bucket_files,
                **({"bucket_ms": bucket_ms,
                    "bucket_ms_platform": jax.default_backend()}
                   if bucket_ms else {}),
                "num_event_classes_folded": 4,
                "num_prong_classes": cfg.num_prong_classes,
                "hidden_dim": cfg.hidden_dim,
                "variants": {
                    "pid": "event softmax [4], prong softmax [max_prongs, Kpr]",
                    "embeddings": "event vector [D], prong vectors [max_prongs, D]",
                    "combined": "pid outputs + embeddings outputs",
                },
                "calling_convention": (
                    "pick a bucket P >= num_prongs from prong_buckets — the "
                    "cheapest per bucket_ms when present, else the smallest "
                    "(select_bucket / the C++ loader); pad prong maps to P "
                    "rows ([1+P, C, H, W] input), pass the real count as "
                    "num_prongs; read the first num_prongs output rows"
                ),
            },
            f, indent=2,
        )
    return paths


def load_exported(path: str):
    """Round-trip loader (Python side): returns a callable (pixels, n)."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(f.read())
    return exported.call


def export_run_dir(run_dir: str, output_dir=None, checkpoint: str = "best",
                   embedder: str = None,
                   prong_buckets: Sequence[int] | None = DEFAULT_PRONG_BUCKETS,
                   bench_buckets: bool = False,
                   ) -> Dict[str, str]:
    """The CreateCompiled flow: run dir -> three serialized graphs."""
    from .config import Options
    from .train import Trainer
    from .train.checkpoint import CheckpointManager

    options = Options.load(os.path.join(run_dir, "options.json"))
    trainer = Trainer(options, embedder=embedder, run_dir=None, debug=True,
                      verbose=False)

    mgr = CheckpointManager(os.path.join(run_dir, "checkpoints"),
                            top_k=options.checkpoint_top_k)
    step = mgr.best_step() if checkpoint == "best" else mgr.latest_step()
    if checkpoint == "best" and step is None:
        import warnings

        warnings.warn(
            "no ranked checkpoint in this run (never completed a validation "
            "pass?) — exporting the LATEST checkpoint instead of 'best'",
            stacklevel=2,
        )
    state = mgr.restore(jax.device_get(trainer.state), step)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if getattr(options, "fold_eval_bn", False):
        # Serving graphs skip the conv->BN normalize passes entirely
        # (ops/fold.py; values-only, logits preserved to rounding)
        from .ops.fold import count_foldable, fold_eval_batchnorm

        if count_foldable(variables["params"]):
            variables = jax.jit(lambda v: fold_eval_batchnorm(v)[0])(variables)
    output_dir = output_dir or os.path.join(run_dir, "export")
    return export_model(trainer.model, variables, state.norm, output_dir,
                        prong_buckets=prong_buckets,
                        bench_buckets=bench_buckets)


def check_exported(path: str, max_prongs: int, channels: int,
                   height: int, width: int, num_prongs: int = 3,
                   seed: int = 0) -> None:
    """Sanity-run an exported artifact (CreateCompiled.ipynb cells 10-13:
    'Check to make sure the traced models work')."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pixels = (rng.uniform(size=(1 + max_prongs, channels, height, width)) < 0.01)
    pixels = (pixels * rng.uniform(16, 255, pixels.shape)).astype(np.float32)
    fn = load_exported(path)
    outputs = fn(jnp.asarray(pixels), jnp.asarray(num_prongs, jnp.int32))
    for i, out in enumerate(outputs):
        value = np.asarray(out)
        assert np.isfinite(value).all(), f"non-finite output {i} from {path}"
        print(f"  output {i}: shape {value.shape}, "
              f"range [{value.min():.4f}, {value.max():.4f}]")


def main():  # pragma: no cover
    from argparse import ArgumentParser

    parser = ArgumentParser(description=__doc__)
    parser.add_argument("run_dir")
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--checkpoint", default="best", choices=["best", "last"])
    parser.add_argument("--sdxl", action="store_true")
    parser.add_argument("--sparse", action="store_true")
    parser.add_argument("--embedder", default=None,
                        help="Override the embedder family (default: the "
                             "run's recorded options.json value)")
    parser.add_argument("--check", action="store_true",
                        help="sanity-run each exported artifact")
    parser.add_argument("--buckets", default=None,
                        help="comma list of prong-capacity buckets (the full "
                             "capacity is always added), or 'none' for the "
                             f"single max_prongs graph; default "
                             f"{','.join(map(str, DEFAULT_PRONG_BUCKETS))}")
    parser.add_argument("--bench_buckets", action="store_true",
                        help="time each rung's pid graph on the current "
                             "backend and record per-event bucket_ms in the "
                             "export meta; the loader then dispatches to the "
                             "cheapest eligible rung (run on the serving "
                             "backend)")
    args = parser.parse_args()
    embedder = (
        "sparse" if args.sparse else "sdxl" if args.sdxl else args.embedder
    )  # None -> the run dir's recorded family
    if args.buckets is None:
        buckets = DEFAULT_PRONG_BUCKETS
    elif args.buckets.strip().lower() == "none":
        buckets = ()
    else:
        buckets = tuple(int(p) for p in args.buckets.split(","))
    paths = export_run_dir(args.run_dir, args.output_dir, args.checkpoint,
                           embedder, prong_buckets=buckets,
                           bench_buckets=args.bench_buckets)
    for variant, path in paths.items():
        print(f"{variant}: {path}")

    if args.check:
        import json as _json

        export_dir = os.path.dirname(next(iter(paths.values())))
        meta_path = os.path.join(export_dir, "transformercvn_export_meta.json")
        if not os.path.exists(meta_path):
            raise SystemExit(f"export metadata missing: {meta_path}")
        with open(meta_path) as f:
            meta = _json.load(f)
        shape = meta["input_shape"]
        for key, path in paths.items():
            # bucketed artifacts expect [1+P, C, H, W]; parse P off the key
            capacity = (
                int(key.rsplit("_p", 1)[1]) if "_p" in key
                else meta["max_prongs"]
            )
            print(f"checking {key}:")
            check_exported(
                path, capacity, shape[1], shape[2], shape[3],
                num_prongs=min(3, capacity),
            )


if __name__ == "__main__":  # pragma: no cover
    main()
