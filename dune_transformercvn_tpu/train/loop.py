"""The training orchestrator: the TPU-native replacement for Lightning's
``Trainer`` + the reference's LightningModule wiring.

Covers (see SURVEY §1 L3/L4): dataset creation and statistic sharing
(neutrino_base.py:20-49), per-step LR scheduling, data-parallel execution
over a device mesh, periodic validation with psum-reduced streaming metrics,
TensorBoard logging with reference tag names, top-k checkpointing keyed on
``val_epoch_AUC`` and resume, and run-dir versioning with the resolved
``options.json`` dumped beside the logs (train.py:145-149).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Options
from ..data.batcher import Batcher
from ..data.dataset import create_datasets
from ..models.network import ModelConfig, TransformerCVN
from ..parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    data_axis_size,
    is_hybrid,
    local_batch_rows,
    local_shard_ids,
    replicated_sharding,
    stacked_batch_sharding,
    state_shardings,
    tp_rows_process_local,
)
from ..utils.cache import enable_compile_cache, enable_fast_prng
from ..utils.rundir import create_run_dir
from . import schedules
from .checkpoint import CheckpointManager, restore_from_path
from .logging import MetricLogger
from .metrics import finalize_metrics, init_metric_state
from .optimizer import create_optimizer
from .state import create_train_state, param_count
from .step import make_eval_step, make_predict_step, make_train_step


class Trainer:
    def __init__(
        self,
        options: Options,
        embedder: Optional[str] = None,
        name: str = "lightning_logs",
        log_dir: Optional[str] = None,
        run_dir: Optional[str] = None,
        debug: bool = False,
        verbose: Optional[bool] = None,
        callbacks=None,
        log_graph: bool = False,
        log_every_n_steps: int = 50,
    ):
        self.options = options
        # Resolve the embedder family: explicit argument wins, else the
        # options value (evaluate/export reload it from the run dir's
        # options.json); record the resolution so options.json carries it.
        options.embedder = embedder or options.embedder or "dense"
        embedder = options.embedder
        self.debug = debug
        self.verbose = options.verbose_output if verbose is None else verbose
        # Validation callbacks fn(step, metrics) — the HPO reporting hook
        # (reference SHERPA pattern: send the epoch objective per validation,
        # network/sherpa/*.py); any tuner can subscribe here.
        self.callbacks = list(callbacks or [])
        # -g/--graph: dump the lowered train-step StableHLO beside the logs
        # (the TensorBoard log_graph equivalent, train.py:105)
        self.log_graph = log_graph
        # On-disk XLA executable cache: every Trainer surface (train /
        # evaluate / export) skips 30-90 s production-size recompiles.
        enable_compile_cache()
        # TPU-native RNG for dropout/noise masks (18% step-time win at
        # production scale; no parity requirement on random streams).
        enable_fast_prng()

        # ---- mesh ------------------------------------------------------------
        # model_parallel > 1 adds an auto "model" axis (tensor parallelism,
        # mesh.py); batches shard over the remaining data axis only, so
        # num_shards (per-shard batch layout, step accounting) is dp.
        self.mesh = create_mesh(
            options.num_gpu, model_parallel=options.model_parallel
        )
        self.num_shards = data_axis_size(self.mesh)
        self.batch_sharding = batch_sharding(self.mesh)
        self.stacked_sharding = stacked_batch_sharding(self.mesh)
        self.replicated_sharding = replicated_sharding(self.mesh)
        # state_sharding becomes a per-leaf tree on a hybrid mesh (see below)
        self.state_sharding = self.replicated_sharding
        # Multi-host: every host assembles the identical (deterministic)
        # global batch and feeds only its own shards; process 0 owns IO —
        # the TPU equivalents of the DDP per-rank sampler and NODE_RANK
        # master guards (train.py:40, SURVEY §2.3).
        self.process_index = jax.process_index()
        self.multi_process = jax.process_count() > 1
        if self.multi_process and not tp_rows_process_local(self.mesh):
            # Host-local feeding (local_batch_rows) assumes shard s lives
            # wholly on one process's devices.  create_mesh keeps TP groups
            # host-local whenever model_parallel divides the per-host device
            # count; a layout where a TP row spans hosts would put per-layer
            # TP collectives on DCN — reject it rather than run it badly.
            raise ValueError(
                f"model_parallel={options.model_parallel} does not divide "
                f"the per-host device count ({jax.local_device_count()}): a "
                "TP group would span hosts. Use a model_parallel that fits "
                "within one host; data parallelism spans hosts."
            )
        self._local_shards = local_shard_ids(self.mesh)

        # ---- data ------------------------------------------------------------
        self.training_dataset, self.validation_dataset, self.testing_dataset = (
            create_datasets(options)
        )
        if options.normalize_features:
            stats = self.training_dataset.compute_statistics()
            self.validation_dataset.compute_statistics(*stats)
            if self.testing_dataset is not None:
                self.testing_dataset.compute_statistics(*stats)
            mean, std, extra_mean, extra_std = stats
        else:
            f = self.training_dataset.num_features
            mean, std = np.zeros(f, np.float32), np.ones(f, np.float32)
            extra_mean, extra_std = np.float32(0.0), np.float32(1.0)
        self.norm = {
            "mean": mean, "std": std,
            "extra_mean": extra_mean, "extra_std": extra_std,
        }

        # Reference step accounting (neutrino_base.py:47-49): batch_size is
        # per-device; the global batch is batch_size * mesh size.
        self.global_batch = options.batch_size * self.num_shards
        self.steps_per_epoch = len(self.training_dataset) // self.global_batch
        if self.steps_per_epoch == 0:
            raise ValueError(
                f"dataset of {len(self.training_dataset)} events is smaller than "
                f"the global batch {self.global_batch}"
            )
        self.total_steps = self.steps_per_epoch * options.epochs

        # Multi-step dispatch (lax.scan over K stacked batches per device
        # call) amortizes per-step host dispatch latency; stacking requires
        # one static batch signature.
        self.steps_per_dispatch = max(1, int(options.steps_per_dispatch))
        batcher_kwargs = dict(
            batch_size=self.global_batch,
            num_shards=self.num_shards,
            prong_bucket_multipliers=options.prong_bucket_multipliers,
            coo_granularity=options.coo_bucket_granularity,
            seed=options.seed,
            # multi-host REQUIRES shape agreement across hosts without
            # communication; otherwise opt-in to bound recompilation
            fixed_shape=(
                options.static_batch_shapes
                or self.multi_process
                or self.steps_per_dispatch > 1
            ),
            # Host-local assembly: each host gathers + packs only its own
            # shards' events (O(local batch) host work per step — the DDP
            # per-rank sampler equivalent, SURVEY §2.3), with bucket sizes
            # still derived from the global index metadata so shapes agree.
            local_shards=self._local_shards if self.multi_process else None,
        )
        self.train_batcher = Batcher(self.training_dataset, shuffle=True, **batcher_kwargs)
        # drop_last=False: validation splits smaller than the global batch
        # still validate (the wrap-padded tail rows carry target -1 and are
        # excluded from losses and metric statistics)
        self.val_batcher = Batcher(
            self.validation_dataset, shuffle=False, drop_last=False, **batcher_kwargs
        )
        if len(self.validation_dataset) == 0:
            raise ValueError("validation split is empty; adjust train_validation_split")
        self.num_workers = max(
            1, min(options.num_dataloader_workers, os.cpu_count() or 1)
        )
        # Scalar-log cadence (Lightning's log_every_n_steps, default 50 —
        # what the reference trainer runs with).  Each flush costs one
        # lagged device->host metrics fetch — a full tunnel round trip on
        # this backend — so logging every 10 steps taxed sustained
        # throughput ~4%.
        self.log_every_n_steps = max(1, int(log_every_n_steps))

        # ---- model + optimizer ----------------------------------------------
        self.model_config = ModelConfig.from_options(
            options,
            self.training_dataset.num_features,
            self.training_dataset.num_extra,
            self.training_dataset.pixel_features,
            self.training_dataset.num_event_classes,
            self.training_dataset.num_prong_classes,
            image_shape=self.training_dataset.pixel_shape,
            embedder=embedder,
            # a 1-device mesh needs no BN sync; skipping it removes ~70
            # per-layer collectives from the step
            axis_name=(
                DATA_AXIS
                if options.sync_batch_norm and self.num_shards > 1
                else None
            ),
        )
        self.model = TransformerCVN(self.model_config)
        self.schedule = schedules.from_options(options, self.steps_per_epoch)
        self.tx = create_optimizer(options, self.schedule)

        # ---- state -----------------------------------------------------------
        example = self._device_batch(
            self.train_batcher.build_batch(np.arange(self.global_batch))
        )
        self.state = create_train_state(
            self.model, self.tx, example, self.norm, options.seed
        )
        if is_hybrid(self.mesh):
            # Tensor parallelism: channel-shard params + optimizer moments
            # over the model axis; GSPMD propagates the layout through the
            # step and inserts the TP collectives.
            self.state_sharding = state_shardings(self.state, self.mesh)
        self.state = jax.device_put(self.state, self.state_sharding)
        if self.verbose:
            from ..utils.summary import summarize_params

            print(summarize_params(self.state.params, max_depth=2))
            print(f"Parameters: {param_count(self.state.params):,}")
            print(f"Mesh: {self.num_shards} device(s); global batch {self.global_batch}")

        # ---- step functions --------------------------------------------------
        self.train_step = make_train_step(
            self.model, self.tx, options, self.mesh,
            steps_per_dispatch=self.steps_per_dispatch,
        )
        self._single_train_step = (
            self.train_step if self.steps_per_dispatch == 1 else None
        )
        self.eval_step = make_eval_step(self.model, options, self.mesh)
        self.predict_step = make_predict_step(self.model, self.mesh)

        # ---- run dir / logging / checkpoints (process-0 IO) ------------------
        is_master = self.process_index == 0
        if run_dir is None and not debug and is_master:
            run_dir = create_run_dir(log_dir or os.getcwd(), name)
        self.run_dir = run_dir
        self.logger = MetricLogger(
            run_dir, enabled=run_dir is not None and is_master
        )
        self.checkpoints = (
            CheckpointManager(
                os.path.join(run_dir, "checkpoints"), top_k=options.checkpoint_top_k
            )
            if run_dir is not None
            else None
        )
        if run_dir is not None and is_master:
            options.save(os.path.join(run_dir, "options.json"))

    # -------------------------------------------------------------------------

    def _device_prefetch(self, host_iterator):
        """Move batches to device one step ahead so the H2D transfer (which
        costs ~40% of a step over a tunneled device) overlaps with compute."""
        pending = None
        for batch in host_iterator:
            ready, pending = pending, self._device_batch(batch)
            if ready is not None:
                yield ready
        if pending is not None:
            yield pending

    def _single_step(self):
        """The K=1 train step (lazy: only compiled when a run with
        steps_per_dispatch > 1 actually hits a partial tail group)."""
        if self._single_train_step is None:
            self._single_train_step = make_train_step(
                self.model, self.tx, self.options, self.mesh
            )
        return self._single_train_step

    def _device_stacked(self, group):
        """Stack K host batches into [K, ...] leaves and place them with the
        scan-axis-replicated, data-sharded layout.  Train batches are
        assembled host-locally (Batcher ``local_shards``), so the rows are
        already exactly this process's slice."""
        stacked = {k: np.stack([b[k] for b in group]) for k in group[0]}
        if not self.multi_process:
            return jax.device_put(stacked, self.stacked_sharding)
        return {
            k: jax.make_array_from_process_local_data(self.stacked_sharding, v)
            for k, v in stacked.items()
        }

    def _train_dispatch_iter(self, host_iterator, max_batches: int):
        """Yield ``(took, device_batch, step_fn)`` ready to execute, placed
        on device one item ahead (H2D overlaps compute).

        With steps_per_dispatch K > 1, full K-groups are stacked for the
        scanned step; the tail (epoch end or max_batches cutoff) falls back
        to single-step dispatches so limits are respected exactly.
        """
        K = self.steps_per_dispatch

        def prepared():
            group, taken = [], 0
            for batch in host_iterator:
                if taken >= max_batches:
                    break
                group.append(batch)
                taken += 1
                if K > 1 and len(group) == K:
                    yield (K, self._device_stacked(group), self.train_step)
                    group = []
                elif K == 1:
                    yield (1, self._device_batch(group.pop()), self.train_step)
            for batch in group:  # partial tail group -> single steps
                yield (1, self._device_batch(batch), self._single_step())

        pending = None
        for item in prepared():
            ready, pending = pending, item
            if ready is not None:
                yield ready
        if pending is not None:
            yield pending

    def _device_batch(self, batch, assembled_local: bool = True):
        """Place one host batch.  ``assembled_local`` says the rows are
        already this process's shards (the train/val batchers assemble
        host-locally); ``False`` takes a full global batch and slices the
        local rows out (predict_split's full-assembly batcher)."""
        if not self.multi_process:
            return jax.device_put(batch, self.batch_sharding)

        def place(array):
            local = array if assembled_local else local_batch_rows(
                array, self.num_shards, self._local_shards
            )
            return jax.make_array_from_process_local_data(
                self.batch_sharding, local
            )

        return {k: place(v) for k, v in batch.items()}

    def resume(self, checkpoint_path: Optional[str] = None):
        """Restore full train state from a checkpoint path or the run dir's
        latest (the `-c` / auto-resume flow)."""
        template = jax.device_get(self.state)
        if checkpoint_path is not None:
            restored = restore_from_path(checkpoint_path, template)
        else:
            if self.checkpoints is None:
                raise FileNotFoundError(
                    "resume() without a checkpoint_path needs a run_dir-backed "
                    "trainer (this one has no CheckpointManager)"
                )
            restored = self.checkpoints.restore(template)
        self.state = jax.device_put(restored, self.state_sharding)
        if self.verbose:
            print(f"Resumed from step {int(self.state.step)}")

    # -------------------------------------------------------------------------

    def validate(self) -> Dict[str, float]:
        # model_config.num_event_classes == the metric head's class count (the
        # 4-way current head when split_event_targets, else the dataset's)
        totals = jax.device_put(
            init_metric_state(
                self.model_config.num_event_classes,
                self.training_dataset.num_prong_classes,
                self.options.auc_bins,
            ),
            self.replicated_sharding,
        )
        for batch in self._device_prefetch(
            self.val_batcher.prefetch_epoch(0, num_workers=self.num_workers)
        ):
            totals = self.eval_step(self.state, batch, totals)
        return finalize_metrics(jax.device_get(totals))

    def _inference_state(self):
        """State for pure-inference paths: eval-time BN folding applied once
        (``options.fold_eval_bn``, ops/fold.py).  Values-only — the pytree
        and shapes are unchanged, so the jitted predict step re-uses its
        compiled executable.  Training/validation keep the raw state (their
        BN statistics must keep updating / match the reference trajectory).
        """
        if not getattr(self.options, "fold_eval_bn", False):
            return self.state
        from ..ops.fold import count_foldable, fold_eval_batchnorm

        if count_foldable(self.state.params) == 0:
            return self.state
        folded = jax.jit(lambda v: fold_eval_batchnorm(v)[0])(
            {"params": self.state.params, "batch_stats": self.state.batch_stats}
        )
        state = self.state.replace(
            params=folded["params"], batch_stats=folded["batch_stats"]
        )
        return jax.device_put(state, self.state_sharding)

    def predict_split(self, split: str = "validation"):
        """Batched inference over a split (the Evaluate.ipynb cell-14 loop).

        Returns event probabilities/targets for every event and prong
        probabilities/targets for every *real* prong, plus each prong's
        owning event index.
        """
        dataset = {
            "training": self.training_dataset,
            "validation": self.validation_dataset,
            "testing": self.testing_dataset,
        }[split]
        if dataset is None:
            raise ValueError(f"no {split} dataset configured")

        batcher = Batcher(
            dataset,
            batch_size=self.global_batch,
            num_shards=self.num_shards,
            prong_bucket_multipliers=self.options.prong_bucket_multipliers,
            coo_granularity=self.options.coo_bucket_granularity,
            drop_last=False,  # wrap-padded final batch, trimmed below
            fixed_shape=self.options.static_batch_shapes or self.multi_process,
        )
        def fetch(outputs):
            if not self.multi_process:
                return jax.device_get(outputs)
            # sharded outputs are not fully addressable from one process;
            # tiled=True concatenates the per-process shards along axis 0
            # (stacking would add a process axis)
            from jax.experimental import multihost_utils

            return jax.device_get(
                multihost_utils.process_allgather(outputs, tiled=True)
            )

        state = self._inference_state()  # BN-folded serving weights
        ev_probs, ev_targets = [], []
        pr_probs, pr_targets, pr_event = [], [], []
        seen = 0
        for batch in batcher.prefetch_epoch(0, num_workers=self.num_workers):
            probs_e, probs_p = fetch(
                self.predict_step(
                    state,
                    self._device_batch(batch, assembled_local=False),
                )
            )
            take = min(self.global_batch, len(dataset) - seen)
            mask = batch["prong_targets"][:take] >= 0
            ev_probs.append(probs_e[:take])
            targets = batch["event_targets"][:take]
            if self.options.split_event_targets:
                # scores are the 4-way current head; remap targets to match
                from ..data.schema import split_current_targets

                targets = split_current_targets(targets)
            ev_targets.append(targets)
            pr_probs.append(probs_p[:take][mask])
            pr_targets.append(batch["prong_targets"][:take][mask])
            rows = np.nonzero(mask)[0] + seen
            pr_event.append(rows)
            seen += take

        return {
            "event_probabilities": np.concatenate(ev_probs),
            "event_targets": np.concatenate(ev_targets),
            "prong_probabilities": np.concatenate(pr_probs),
            "prong_targets": np.concatenate(pr_targets),
            "prong_event_index": np.concatenate(pr_event),
        }

    def _log_confusions(self, metrics: Dict[str, float], step: int):
        if not self.verbose or "event_confusion" not in metrics:
            return
        from ..data.schema import EVENT_CLASS_NAMES, PRONG_CLASS_NAMES

        kev = metrics["event_confusion"].shape[0]
        event_names = (
            EVENT_CLASS_NAMES if kev == len(EVENT_CLASS_NAMES)
            else [f"class_{i}" for i in range(kev)]
        )
        self.logger.log_confusion(
            "val_event_confusion", metrics["event_confusion"], event_names, step
        )
        self.logger.log_confusion(
            "val_prong_confusion", metrics["prong_confusion"], PRONG_CLASS_NAMES, step
        )

    def _checkpoint(self, metrics: Optional[Dict[str, float]]):
        if self.checkpoints is None or self.process_index != 0:
            return
        metric_value = None if metrics is None else metrics.get("val_epoch_AUC")
        self.checkpoints.save(
            jax.device_get(self.state), int(self.state.step), metric_value
        )

    def fit(
        self,
        max_steps: Optional[int] = None,
        eval_interval: Optional[int] = None,
        profile: bool = False,
    ) -> Dict[str, float]:
        """Run the full training loop; returns the last validation metrics.

        ``profile=True`` captures a ``jax.profiler`` device trace of steps
        ~11-15 into ``<run_dir>/profile`` (viewable in TensorBoard /
        Perfetto) — the tracing hook from SURVEY §5.
        """
        options = self.options
        eval_interval = eval_interval or options.eval_interval
        limit = max_steps or self.total_steps
        last_val: Dict[str, float] = {}
        profile_dir = (
            os.path.join(self.run_dir or os.getcwd(), "profile") if profile else None
        )
        profiling = False

        start_step = int(self.state.step)
        start_epoch = start_step // self.steps_per_epoch
        step = start_step
        last_eval_step = -1
        # mid-epoch resume: skip the already-consumed batches of the resumed
        # epoch in index space — nothing is assembled or transferred for them
        # (the epoch order is deterministic in (seed, epoch))
        resume_skip = start_step % self.steps_per_epoch
        t_start = time.time()
        window_start, window_events = time.time(), 0
        # Metrics are fetched one step late: device_get on the step just
        # dispatched would stall the host until that step finishes, leaving
        # the device idle; fetching the previous step's (already computed)
        # metrics keeps the dispatch pipeline full (VERDICT r1 item 7).
        pending_log = None  # (step, device metrics) awaiting fetch

        def flush_pending_log():
            nonlocal pending_log, window_start, window_events
            if pending_log is None:
                return
            log_step, device_metrics = pending_log
            pending_log = None
            # scanned steps return [K]-stacked metrics; log the latest step's
            host = {
                k: float(np.asarray(v).reshape(-1)[-1])
                for k, v in jax.device_get(device_metrics).items()
            }
            # schedule(log_step) is the lr the NEXT update will apply (the
            # update that produced log_step used optax count log_step-1) —
            # matching Lightning's LearningRateMonitor, which logs the
            # post-scheduler-step param-group lr: both series are
            # {(k, schedule(k))}, so TB curves coincide pointwise.
            lr = float(options.learning_rate) * float(self.schedule(log_step))
            host["lr-AdamW/pg1"] = lr
            elapsed = time.time() - window_start
            if elapsed > 0:
                host["events_per_second"] = window_events / elapsed
            window_start, window_events = time.time(), 0
            if not self.verbose:
                host.pop("grad_norm", None)
            self.logger.log_scalars(host, log_step)

        try:
            for epoch in range(start_epoch, options.epochs):
                start_batch, resume_skip = resume_skip, 0
                host_iterator = self.train_batcher.prefetch_epoch(
                    epoch,
                    depth=max(2, self.num_workers),
                    num_workers=self.num_workers,
                    start_batch=start_batch,
                )
                for took, batch, step_fn in self._train_dispatch_iter(
                    host_iterator, max_batches=limit - step
                ):
                    if step >= limit:
                        break
                    if (
                        profile_dir is not None
                        and step - start_step >= 10
                        and not profiling
                    ):
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    if self.log_graph and self.run_dir is not None:
                        self.log_graph = False
                        path = os.path.join(
                            self.run_dir, "train_step.stablehlo.txt"
                        )
                        with open(path, "w") as f:
                            f.write(step_fn.lower(self.state, batch).as_text())
                        if self.verbose:
                            print(f"Train-step graph written to {path}")
                    self.state, metrics = step_fn(self.state, batch)
                    step += took
                    window_events += self.global_batch * took
                    if profiling and step - start_step >= 15:
                        # device->host fetch, NOT block_until_ready: the
                        # latter returns early on the tunneled backend and
                        # would stop the trace mid-step (see CLAUDE.md)
                        jax.device_get(self.state.step)
                        jax.profiler.stop_trace()
                        profiling = False
                        if self.verbose:
                            print(f"Profiler trace written to {profile_dir}")
                        profile_dir = None  # capture exactly one trace per run

                    flush_pending_log()
                    if self.logger.enabled and (
                        step % self.log_every_n_steps < took or step <= 2
                    ):
                        pending_log = (step, metrics)

                    if step % eval_interval < took:
                        flush_pending_log()
                        last_val = self.validate()
                        last_eval_step = step
                        self.logger.log_scalars(last_val, step)
                        self._log_confusions(last_val, step)
                        self._checkpoint(last_val)
                        for callback in self.callbacks:
                            callback(step, last_val)
                        if self.verbose:
                            print(
                                f"step {step}: val_epoch_AUC="
                                f"{last_val['val_epoch_AUC']:.4f} "
                                f"val_epoch_accuracy="
                                f"{last_val['val_epoch_accuracy']:.4f}"
                            )
                if step >= limit:
                    break

            if profiling:  # trace still open (run shorter than 15 steps)
                jax.device_get(self.state.step)  # sound completion barrier
                jax.profiler.stop_trace()
                profiling = False
            flush_pending_log()

            # final validation + checkpoint (unless the last step already did it)
            if step != last_eval_step:
                last_val = self.validate()
                self.logger.log_scalars(last_val, step)
                self._log_confusions(last_val, step)
                self._checkpoint(last_val)
                for callback in self.callbacks:
                    callback(step, last_val)
        finally:
            # Always land here — including on exceptions and Ctrl-C — so the
            # in-flight async checkpoint is finalized + indexed and an open
            # profiler trace is closed, not torn down mid-write at exit.
            if profiling:
                jax.profiler.stop_trace()
            if self.checkpoints is not None:
                self.checkpoints.close()
        if self.verbose:
            print(
                f"Finished {step - start_step} steps in "
                f"{time.time() - t_start:.1f}s; "
                f"val_epoch_AUC={last_val['val_epoch_AUC']:.4f}"
            )
        self.logger.flush()
        return last_val
