"""Checkpointing: Orbax-backed save/restore with the reference's
ModelCheckpoint semantics (train_normal.py:371-374: save_top_k on the
monitored validation loss + save_last) and warm-start from converted torch
checkpoints (demo.py:64-72 prefix handling lives in models/convert.py).
"""
from __future__ import annotations

import json
import os
from typing import Any



class CheckpointManager:
    def __init__(self, directory: str, save_top_k: int = 3, mode: str = "min"):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_top_k = save_top_k
        self.mode = mode
        self._ckpt = ocp.StandardCheckpointer()
        self._scores_path = os.path.join(self.directory, "scores.json")
        self._scores = {}
        if os.path.exists(self._scores_path):
            self._scores = json.load(open(self._scores_path))

    def _dir(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: Any, step: int, metric: float | None = None) -> None:
        """Always refreshes 'last'; keeps the top-k metric checkpoints."""
        import shutil

        last = self._dir("last")
        if os.path.exists(last):
            shutil.rmtree(last)
        self._ckpt.save(last, state)
        self._ckpt.wait_until_finished()

        if metric is None:
            return
        name = f"step_{step}"
        self._scores[name] = float(metric)
        keep = sorted(
            self._scores, key=self._scores.get, reverse=(self.mode == "max")
        )[: self.save_top_k]
        if name in keep:
            self._ckpt.save(self._dir(name), state)
            self._ckpt.wait_until_finished()
        for n in list(self._scores):
            if n not in keep:
                d = self._dir(n)
                if os.path.exists(d):
                    shutil.rmtree(d)
                del self._scores[n]
        with open(self._scores_path, "w") as fh:
            json.dump(self._scores, fh)

    def restore(self, target: Any, name: str = "last") -> Any:
        return self._ckpt.restore(self._dir(name), target=target)

    def best(self) -> str | None:
        if not self._scores:
            return None
        return sorted(self._scores, key=self._scores.get,
                      reverse=(self.mode == "max"))[0]
