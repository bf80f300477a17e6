"""Preemption-safe checkpointing.

The reference only had raw state-dict save/load with no optimizer state,
step counter, or resume (models/common.py:93-97; the train-loop save was
even commented out, trainval.py:149-152 — SURVEY.md §5).  Here: full
TrainState (params + batch_stats + optimizer state + step) serialized
with flax msgpack, written atomically (tmp + rename) so a preemption
mid-save never corrupts the latest checkpoint, with best-metric tracking
and retention.
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
from typing import Any, Optional

import flax.serialization


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _meta_path(self) -> str:
        return os.path.join(self.directory, "checkpoints.json")

    def _load_meta(self) -> dict:
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                return json.load(f)
        return {"checkpoints": [], "best": None}

    def _store_meta(self, meta: dict):
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
        os.replace(tmp, self._meta_path())

    def save(
        self,
        state: Any,
        step: int,
        metric: Optional[float] = None,
        aux: Optional[dict] = None,
    ) -> str:
        """Atomically write a checkpoint; track best by metric (higher is
        better); prune beyond ``keep`` (best is always retained).

        ``aux`` is an optional host-side state dict (sampler possibility
        arrays, loader RNG, epoch counter — VERDICT r2 #7) written as a
        pickle sidecar next to the msgpack, equally atomically."""
        name = f"ckpt_{step:08d}.msgpack"
        path = os.path.join(self.directory, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(flax.serialization.to_bytes(state))
        os.replace(tmp, path)
        if aux is not None:
            apath = path + ".aux.pkl"
            atmp = apath + ".tmp"
            with open(atmp, "wb") as f:
                pickle.dump(aux, f)
            os.replace(atmp, apath)

        meta = self._load_meta()
        meta["checkpoints"].append(
            {"name": name, "step": step, "metric": metric}
        )
        if metric is not None and (
            meta["best"] is None or metric > meta["best"]["metric"]
        ):
            meta["best"] = {"name": name, "step": step, "metric": metric}
            shutil.copyfile(
                path, os.path.join(self.directory, "ckpt_best.msgpack")
            )
        # retention: newest `keep` plus the best
        while len(meta["checkpoints"]) > self.keep:
            victim = meta["checkpoints"].pop(0)
            if meta["best"] and victim["name"] == meta["best"]["name"]:
                continue
            vp = os.path.join(self.directory, victim["name"])
            if os.path.exists(vp):
                os.remove(vp)
            if os.path.exists(vp + ".aux.pkl"):
                os.remove(vp + ".aux.pkl")
        self._store_meta(meta)
        return path

    def latest_path(self) -> Optional[str]:
        meta = self._load_meta()
        if not meta["checkpoints"]:
            return None
        return os.path.join(self.directory, meta["checkpoints"][-1]["name"])

    def best_path(self) -> Optional[str]:
        p = os.path.join(self.directory, "ckpt_best.msgpack")
        return p if os.path.exists(p) else None

    def restore(self, target: Any, path: Optional[str] = None) -> Any:
        """Restore into a pytree of the same structure (the target is the
        template, e.g. a freshly created TrainState)."""
        path = path or self.latest_path()
        if path is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(target, f.read())

    def restore_aux(self, path: Optional[str] = None) -> Optional[dict]:
        """The aux sidecar of a checkpoint (None if it has none)."""
        path = path or self.latest_path()
        if path is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        apath = path + ".aux.pkl"
        if not os.path.exists(apath):
            return None
        with open(apath, "rb") as f:
            return pickle.load(f)
