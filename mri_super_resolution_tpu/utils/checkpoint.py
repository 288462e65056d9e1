"""Checkpointing: orbax-backed save/restore of params + opt_state + step.

Reference equivalents:
- INR side: ``torch.save(state_dict)`` at phase boundaries
  (INR_ERD.py:219-220, inr_toy.py:114-115).
- MISR side: ``tf.train.Checkpoint(step, psnr, optimizer, model)`` +
  ``CheckpointManager(max_to_keep=3)`` with save-best-only on validation PSNR
  (multi-image-super-resolution/utils/training.py:88-102, 183-187).

``CheckpointManager`` here mirrors the TF behaviour: keeps N latest, tracks a
best-metric scalar, restores latest on construction if present.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_pytree(path: str, tree: Any) -> None:
    """One-shot save of a pytree (the torch.save analog)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def unwrap_trainer_params(tree: Any) -> Any:
    """Return the serving params whether ``tree`` is bare params or a full
    Trainer checkpoint ``{step, psnr, params, opt_state[, ema_params]}``
    (fit/trainer.py). An EMA run's serving weights ARE the averaged ones —
    validation and best-checkpoint gating used them — so ``ema_params``
    wins when present. The single source of truth for that layout — used by
    every CLI that accepts either form (misr_master, export_model)."""
    if isinstance(tree, dict) and "params" in tree and "step" in tree:
        ema = tree.get("ema_params")
        return ema if ema is not None else tree["params"]
    return tree


def restore_pytree(path: str, target: Any | None = None) -> Any:
    """Restore a pytree saved with :func:`save_pytree`.

    Without a target, leaves come back as host numpy arrays — device-agnostic,
    so checkpoints written under one backend (e.g. CPU) restore under another
    (e.g. the TPU) without sharding-metadata conflicts.
    """
    path = os.path.abspath(path)
    if target is not None:
        return ocp.StandardCheckpointer().restore(path, target)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    return ckptr.restore(path, restore_args=restore_args)


class CheckpointManager:
    """Step-indexed manager with best-metric gating (TF CheckpointManager
    + save-best-only analog)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )
        self.best_metric = -np.inf
        self._load_best_metric()

    def _best_path(self) -> str:
        return os.path.join(self.directory, "best_metric.txt")

    def _load_best_metric(self) -> None:
        if os.path.exists(self._best_path()):
            self.best_metric = float(open(self._best_path()).read().strip())

    def save(self, step: int, tree: Any, metric: float | None = None, best_only: bool = False) -> bool:
        """Save at ``step``. With ``best_only`` the save is skipped unless
        ``metric`` improves on the stored best (training.py:183-187)."""
        if best_only and metric is None:
            raise ValueError(
                "best_only=True requires a metric: saving unconditionally "
                "would rotate out the best checkpoints under max_to_keep"
            )
        if best_only and metric <= self.best_metric:
            return False
        if metric is not None and metric > self.best_metric:
            self.best_metric = float(metric)
            with open(self._best_path(), "w") as f:
                f.write(str(self.best_metric))
        self._mngr.save(step, args=ocp.args.StandardSave(tree))
        self._mngr.wait_until_finished()
        return True

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def restore(self, target: Any | None = None, step: int | None = None) -> Any | None:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return None
        if target is not None:
            return self._mngr.restore(step, args=ocp.args.StandardRestore(target))
        return self._mngr.restore(step)
