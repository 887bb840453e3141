"""Orbax checkpointing with best-val-SSIM selection and always-save-last.

Mirrors the reference's ``ModelCheckpoint(save_top_k=1, monitor="val_ssim",
mode="max", filename="best")`` (``main.py:113-119``) and the
hyperparameter-in-checkpoint persistence (``save_hyperparameters()`` in every
model, SURVEY §2.2) that lets ``report.py`` rebuild the model from the
checkpoint alone (``report.py:26-43``).

Improvements over the reference (SURVEY §5): "last" is actually saved every
validation (the reference's ``save_last=model == "palette"`` is always False
— quirk 1) and training can resume from it.

Layout: ``<dir>/<name>/best/`` and ``<dir>/<name>/last/``, each holding an
orbax ``state`` tree plus a ``meta.yaml`` with hparams, step, epoch and the
monitored value.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import yaml

import jax
import orbax.checkpoint as ocp


def _abstract_leaf(x):
    """ShapeDtypeStruct carrying the live sharding (when the template leaf
    is a placed jax.Array): orbax then restores every shard straight onto
    its owning devices — the multi-host fsdp/tp resume path. Host templates
    (numpy) restore as host arrays."""
    sharding = getattr(x, "sharding", None)
    return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)


class CheckpointManager:
    """``process_count > 1`` (multi-host pod): saves become COLLECTIVE —
    orbax's checkpointer runs cross-process sync barriers internally, so
    every process must enter ``_save`` together. State is passed as live
    jax.Arrays with their shardings, so fsdp/tp-partitioned leaves are
    written shard-by-shard from the owning processes (ZeRO-3 checkpoints
    never materialise on one host). Process 0 alone handles the
    surrounding filesystem bookkeeping (tmp cleanup, meta.yaml, atomic
    slot swap), fenced by explicit barriers."""

    def __init__(self, root: str, name: str,
                 process_index: int = 0, process_count: int = 1):
        self.dir = os.path.abspath(os.path.join(root, name))
        self.process_index = process_index
        self.process_count = process_count
        self.is_main = process_index == 0
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._barrier_seq = 0
        self.best_value: Optional[float] = None
        best_meta = self._read_meta("best")
        if best_meta:
            self.best_value = best_meta.get("monitor_value")

    def _barrier(self, tag: str) -> None:
        if self.process_count > 1:
            from jax.experimental import multihost_utils as mhu

            self._barrier_seq += 1
            mhu.sync_global_devices(
                f"pai_tpu_ckpt_{tag}_{self._barrier_seq}")

    # -- paths ------------------------------------------------------------
    def _slot(self, which: str) -> str:
        return os.path.join(self.dir, which)

    def _read_meta(self, which: str) -> Optional[Dict]:
        path = os.path.join(self._slot(which), "meta.yaml")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return yaml.safe_load(f)

    # -- save / load --------------------------------------------------------
    def _save(self, which: str, state, meta: Dict) -> None:
        slot = self._slot(which)
        tmp = slot + ".tmp"
        if self.is_main and os.path.exists(tmp):
            shutil.rmtree(tmp)
        self._barrier("clean")  # tmp is gone before anyone writes into it
        self._ckptr.save(os.path.join(tmp, "state"), state)
        self._ckptr.wait_until_finished()
        if self.is_main:
            with open(os.path.join(tmp, "meta.yaml"), "w") as f:
                yaml.safe_dump(meta, f)
            if os.path.exists(slot):
                shutil.rmtree(slot)
            os.rename(tmp, slot)
        self._barrier("swap")  # slot is live before anyone moves on

    def save_last(self, state, hparams: Dict, step: int, epoch: int,
                  monitor_value: Optional[float] = None) -> None:
        self._save("last", state, {
            "hparams": hparams, "step": int(step), "epoch": int(epoch),
            "monitor_value": None if monitor_value is None
            else float(monitor_value),
        })

    def save_diverged(self, state, hparams: Dict, step: int,
                      epoch: int) -> None:
        """Postmortem slot for a state whose loss went non-finite. Kept
        SEPARATE from 'last' on purpose: the diverged state's parameters
        are typically NaN (the loss the grads flow from is), so writing it
        over 'last' would clobber the most recent known-good
        validation-boundary save — the one ``--resume`` recovers from."""
        self._save("diverged", state, {
            "hparams": hparams, "step": int(step), "epoch": int(epoch),
            "monitor_value": None,
        })

    def maybe_save_best(self, state, hparams: Dict, step: int, epoch: int,
                        monitor_value: float) -> bool:
        """Save to best/ iff monitor improved (max val_ssim)."""
        if self.best_value is None or monitor_value > self.best_value:
            self._save("best", state, {
                "hparams": hparams, "step": int(step), "epoch": int(epoch),
                "monitor_value": float(monitor_value),
            })
            self.best_value = float(monitor_value)
            return True
        return False

    def restore(self, which: str, abstract_state=None) -> Tuple[Any, Dict]:
        slot = self._slot(which)
        meta = self._read_meta(which)
        if meta is None:
            raise FileNotFoundError(f"no checkpoint at {slot}")
        target = None
        if abstract_state is not None:
            target = jax.tree.map(_abstract_leaf, abstract_state)
        state = self._ckptr.restore(os.path.join(slot, "state"), target)
        return state, meta


def load_checkpoint(path: str, abstract_state=None) -> Tuple[Any, Dict]:
    """Load a checkpoint from an explicit slot path (``.../best`` or
    ``.../last``) — the report CLI entry point (report.py:24-49)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.yaml")) as f:
        meta = yaml.safe_load(f)
    target = None
    if abstract_state is not None:
        target = jax.tree.map(_abstract_leaf, abstract_state)
    state = ocp.StandardCheckpointer().restore(
        os.path.join(path, "state"), target)
    return state, meta
