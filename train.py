#!/usr/bin/env python
"""Training CLI for the TPU-native TransformerCVN framework.

Flag-compatible with the reference entry point (/root/reference/train.py:154-202):

    python train.py -o <options.json> -n <name> [-c ckpt] [--sparse|--sdxl]
                    [-b N] [--gpus N] [-e eval_steps] [-v] [-d]

Differences are TPU-native by design: ``--gpus`` sizes the data-parallel
device mesh, ``-fp16`` selects bfloat16 compute (the TPU-native mixed
precision; fp32 params/optimizer), and ``-d`` runs the debug smoke path
(no logger, small batch).
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from typing import Optional


def main(
    training_file: Optional[str],
    options_file: Optional[str],
    checkpoint: Optional[str],
    name: str,
    log_dir: Optional[str],
    fp16: bool,
    fp32: bool,
    graph: bool,
    verbose: bool,
    batch_size: Optional[int],
    eval: int,
    gpus: Optional[int],
    threads: Optional[int],
    debug: bool,
    sparse: bool,
    sdxl: bool,
    max_steps: Optional[int] = None,
    steps_per_dispatch: Optional[int] = None,
    model_parallel: Optional[int] = None,
    embedder: Optional[str] = None,
    profile: bool = False,
    debug_nans: bool = False,
    auto_resume: bool = False,
    log_compiles: bool = False,
    **kwargs,
):
    from dune_transformercvn_tpu.config import Options

    if sparse:
        embedder_name = "sparse"
    elif sdxl:
        embedder_name = "sdxl"
    elif embedder:
        embedder_name = embedder
    else:
        embedder_name = "dense"

    options = Options()
    if options_file is not None:
        with open(options_file) as f:
            options.update_options(json.load(f))

    options.verbose_output = verbose
    if training_file is not None:
        options.training_file = training_file
    if gpus is not None:
        print(f"Overriding device count: {gpus}")
        options.num_gpu = gpus
    if batch_size is not None:
        print(f"Overriding Batch Size: {batch_size}")
        options.batch_size = batch_size
    if steps_per_dispatch is not None:
        options.steps_per_dispatch = steps_per_dispatch
    if model_parallel is not None:
        options.model_parallel = model_parallel
    if threads is not None:
        os.environ["OMP_NUM_THREADS"] = str(threads)
    if fp16:
        options.compute_dtype = "bfloat16"
    if fp32:
        options.compute_dtype = "float32"
    if eval is not None:  # -e overrides; else keep the option-file value
        options.eval_interval = eval

    if debug:
        print("Debug Mode: small batch, no logger")
        options.batch_size = min(options.batch_size, 32)
        options.num_dataloader_workers = 0

    if not options.training_file:
        raise SystemExit(
            "No training file configured: pass -o <options.json> with a "
            "training_file entry, or -t <file.h5>."
        )

    import jax

    if debug_nans:
        # NaN-trapping debug mode (SURVEY §5 sanitizer equivalent):
        # aborts with a traceback at the first NaN-producing op.
        jax.config.update("jax_debug_nans", True)
    if log_compiles:
        jax.config.update("jax_log_compiles", True)

    if jax.process_index() == 0:
        options.display()

    from dune_transformercvn_tpu.train import Trainer

    run_dir = None
    if auto_resume:
        # Preemption recovery: continue the newest version dir that already
        # has checkpoints instead of starting version_N+1.
        from dune_transformercvn_tpu.utils.rundir import find_resumable

        run_dir = find_resumable(log_dir or os.getcwd(), name)
        if run_dir is not None:
            print(f"Auto-resuming in {run_dir}")

    trainer = Trainer(
        options,
        embedder=embedder_name,
        name=name,
        log_dir=log_dir,
        run_dir=run_dir,
        debug=debug,
        verbose=verbose,  # options.verbose_output was clobbered to this above
                          # (reference-parity CLI override, train.py:59)
        log_graph=graph,
    )
    if checkpoint is not None:
        trainer.resume(checkpoint)
    elif auto_resume and run_dir is not None:
        trainer.resume()

    if trainer.run_dir is not None and jax.process_index() == 0:
        print(f"Run directory: {trainer.run_dir}")

    trainer.fit(max_steps=max_steps, profile=profile)


if __name__ == "__main__":
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("-t", "--training_file", type=str, default=None,
                        help="Input file containing training data.")
    parser.add_argument("-o", "--options_file", type=str, default=None,
                        help="JSON file with option overloads.")
    parser.add_argument("-c", "--checkpoint", type=str, default=None,
                        help="Optional checkpoint to resume from.")
    parser.add_argument("-n", "--name", type=str, default="lightning_logs",
                        help="The sub-directory to create for this run.")
    parser.add_argument("-l", "--log_dir", type=str, default=None,
                        help="Output directory for checkpoints and logs.")
    parser.add_argument("-fp16", action="store_true",
                        help="bfloat16 compute (TPU mixed precision).")
    parser.add_argument("-fp32", action="store_true",
                        help="Force float32 compute.")
    parser.add_argument("-g", "--graph", action="store_true",
                        help="Dump the lowered train-step StableHLO into the "
                             "run dir (train_step.stablehlo.txt).")
    parser.add_argument("-v", "--verbose", action="store_true",
                        help="Output additional information.")
    parser.add_argument("-b", "--batch_size", type=int, default=None,
                        help="Override per-device batch size.")
    parser.add_argument("-e", "--eval", type=int, default=None,
                        help="Number of steps between validations.")
    parser.add_argument("--gpus", type=int, default=None,
                        help="Override device count (data-parallel mesh size).")
    parser.add_argument("--threads", type=int, default=None,
                        help="Override host CPU thread count.")
    parser.add_argument("-d", "--debug", action="store_true",
                        help="Debug smoke-path super-switch.")
    parser.add_argument("--sparse", action="store_true",
                        help="Use the sparse-convolution network.")
    parser.add_argument("--sdxl", action="store_true",
                        help="Use the SDXL-style attention CNN network.")
    parser.add_argument("--embedder", type=str, default=None,
                        choices=["dense", "coo", "sdxl", "sparse", "mobilenet",
                                 "resnet", "convnext", "fcnn"],
                        help="Pixel-embedder family (generalizes "
                             "--sparse/--sdxl).")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="Stop after N optimizer steps (smoke runs).")
    parser.add_argument("--steps_per_dispatch", type=int, default=None,
                        help="Train K steps per device dispatch (lax.scan "
                             "over K stacked batches; implies static batch "
                             "shapes).")
    parser.add_argument("--model_parallel", type=int, default=None,
                        help="Tensor-parallel group size (shards parameter "
                             "channel axes over a second mesh axis; must "
                             "divide --gpus).")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler device trace of steps 11-15.")
    parser.add_argument("--debug_nans", action="store_true",
                        help="Abort at the first NaN-producing op.")
    parser.add_argument("--log_compiles", action="store_true",
                        help="Log every XLA compilation (diagnose batch-shape "
                             "recompiles; see static_batch_shapes).")
    parser.add_argument("--auto_resume", action="store_true",
                        help="Continue the latest version dir from its last "
                             "checkpoint (preemption recovery).")
    main(**parser.parse_args().__dict__)
