"""Checkpointing: orbax-backed save/restore with top-k retention.

Replaces Lightning's ModelCheckpoint configuration (train.py:107-114):
checkpoints every validation, retains the top-k by ``val_epoch_AUC`` plus the
most recent one ("last"), and restores the full train state — parameters, BN
statistics, optimizer state, schedule step, dataset normalization statistics
and the RNG key — so resume continues exactly (README.md:59-61; epoch
shuffling is re-derived deterministically from (seed, epoch)).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Minimal, robust top-k checkpoint manager over orbax StandardCheckpointer."""

    def __init__(self, directory: str, top_k: int = 5, metric: str = "val_epoch_AUC"):
        self.directory = os.path.abspath(directory)
        self.top_k = top_k
        self.metric = metric
        # Async saves: ``save()`` returns after the device->host copy; disk
        # serialization runs in a background thread so training continues
        # through it (Lightning's ModelCheckpoint likewise does not stall
        # the step loop, reference train.py:107-114).  The pending save is
        # finalized (index update + prune) at the next save/restore/close.
        self._checkpointer = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._pending: Optional[Dict[str, Any]] = None
        os.makedirs(self.directory, exist_ok=True)
        self._index_path = os.path.join(self.directory, "index.json")
        self._index: Dict[str, Any] = {"checkpoints": [], "last": None}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    # -------------------------------------------------------------------------

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step}")

    def _write_index(self):
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=2)

    def save(self, state, step: int, metric_value: Optional[float] = None):
        """Start an async save; prune beyond top-k (never pruning 'last').

        Returns once the state is copied off-device; the previous save (if
        still in flight) is finalized first, so at most one save runs in
        the background."""
        self._finalize_pending()
        path = self._path(step)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._checkpointer.save(path, args=ocp.args.StandardSave(state))
        self._pending = {"step": int(step), "metric": metric_value, "path": path}
        return path

    def _finalize_pending(self):
        """Block until the in-flight save commits, then index + prune it."""
        if self._pending is None:
            return
        self._checkpointer.wait_until_finished()
        entry, self._pending = self._pending, None
        self._index["checkpoints"] = [
            c for c in self._index["checkpoints"] if c["step"] != entry["step"]
        ] + [entry]
        self._index["last"] = entry["step"]
        self._prune()
        self._write_index()

    def close(self):
        """Finalize any in-flight save (call at the end of training)."""
        self._finalize_pending()

    @staticmethod
    def _rank_metric(entry) -> float:
        """None/NaN metrics rank below every real value (pruned first)."""
        metric = entry.get("metric")
        if metric is None or (isinstance(metric, float) and np.isnan(metric)):
            return -np.inf
        return float(metric)

    def _prune(self):
        ranked = sorted(
            self._index["checkpoints"], key=self._rank_metric, reverse=True
        )
        keep = {c["step"] for c in ranked[: self.top_k]}
        keep.add(self._index["last"])
        for c in list(self._index["checkpoints"]):
            if c["step"] not in keep:
                shutil.rmtree(c["path"], ignore_errors=True)
                self._index["checkpoints"].remove(c)

    # -------------------------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        self._finalize_pending()
        return self._index.get("last")

    def best_step(self) -> Optional[int]:
        self._finalize_pending()
        entries = [
            c for c in self._index["checkpoints"]
            if self._rank_metric(c) != -np.inf
        ]
        if not entries:
            return self.latest_step()
        return max(entries, key=self._rank_metric)["step"]

    def restore(self, template, step: Optional[int] = None):
        """Restore into the structure of ``template`` (a freshly built state)."""
        self._finalize_pending()
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return _restore_rng_tolerant(self._checkpointer, self._path(step), template)


def _restore_rng_tolerant(checkpointer, path: str, template):
    """Restore, tolerating a PRNG-impl change since the checkpoint was
    written.

    Raw key shapes differ between jax PRNG impls (threefry ``(2,)`` vs rbg
    ``(4,)`` uint32 — see ``utils.cache.enable_fast_prng``), and a key from
    the other impl would be misinterpreted under the current default anyway.
    Random streams are not parity-bearing state, so on a ``base_rng`` shape
    mismatch the checkpoint's other leaves are restored strictly and the
    template's fresh key is kept.
    """
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)

    def do_restore(target):
        # StandardCheckpointer takes the target positionally; the async
        # handler-based checkpointer wants ocp.args
        if isinstance(checkpointer, ocp.StandardCheckpointer):
            return checkpointer.restore(path, target)
        return checkpointer.restore(path, args=ocp.args.StandardRestore(target))

    try:
        return do_restore(abstract)
    except Exception as err:
        # Only retry on a shape-mismatch failure (orbax's message does not
        # name the leaf) — corrupted checkpoints / IO errors re-raise
        # immediately rather than paying two more full restore attempts.
        # A non-rng shape mismatch survives both alt attempts and re-raises.
        if "not compatible with the stored shape" not in str(err) or not (
            hasattr(template, "base_rng") and hasattr(abstract, "replace")
        ):
            raise
        template_shape = tuple(template.base_rng.shape)
        for shape in ((2,), (4,)):
            if shape == template_shape:
                continue
            alt = abstract.replace(
                base_rng=jax.ShapeDtypeStruct(shape, abstract.base_rng.dtype)
            )
            try:
                restored = do_restore(alt)
            except Exception:
                continue
            return restored.replace(base_rng=template.base_rng)
        raise


def restore_from_path(path: str, template):
    """Restore a single checkpoint directory (the `-c path` resume flow)."""
    return _restore_rng_tolerant(
        ocp.StandardCheckpointer(), os.path.abspath(path), template
    )
