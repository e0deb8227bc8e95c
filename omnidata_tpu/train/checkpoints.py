"""Checkpointing: Orbax-backed save/restore with the reference's
ModelCheckpoint semantics (train_normal.py:371-374: save_top_k on the
monitored validation loss + save_last) and warm-start from converted torch
checkpoints (demo.py:64-72 prefix handling lives in models/convert.py).

Saves are ASYNC: `save()` snapshots the (sharded, still-on-device) arrays
and returns immediately; serialization overlaps the next train steps.
Directory deletion/rotation is deferred until the in-flight save commits
(the next `save()`/`wait_until_finished()` drains it), so the 'last'
checkpoint on disk is always a complete committed tree. Call
`wait_until_finished()` (or use as a context manager) before exiting.
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
        self._pending_rm: list[str] = []  # dirs to delete once saves commit
        self._pending_link: str | None = None  # 'last' flip awaiting commit
        # rotating-'last' serial: resume past any last.N already on disk
        serials = [
            int(n.split(".", 1)[1]) for n in os.listdir(self.directory)
            if n.startswith("last.") and n.split(".", 1)[1].isdigit()
        ]
        self._last_serial = max(serials, default=-1) + 1
        last = self._dir("last")
        if os.path.isdir(last) and not os.path.islink(last):
            # migrate a pre-rotation plain 'last' directory
            new = self._dir(f"last.{self._last_serial}")
            self._last_serial += 1
            os.rename(last, new)
            os.symlink(os.path.basename(new), last)

    def _dir(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _drain(self) -> None:
        """Wait for in-flight saves, flip 'last' to the now-committed dir,
        then apply deferred deletions."""
        import shutil

        self._ckpt.wait_until_finished()
        if self._pending_link is not None:
            link = self._dir("last")
            tmp = link + ".tmp"
            if os.path.lexists(tmp):
                os.remove(tmp)
            os.symlink(os.path.basename(self._pending_link), tmp)
            if os.path.islink(link):
                self._pending_rm.append(os.path.realpath(link))
            os.replace(tmp, link)  # atomic flip, target already committed
            self._pending_link = None
        for d in self._pending_rm:
            if os.path.exists(d):
                shutil.rmtree(d)
        self._pending_rm.clear()

    def save(self, state: Any, step: int, metric: float | None = None) -> None:
        """Refreshes 'last' + keeps the top-k metric checkpoints — async.

        'last' rotates through last.0/last.1/… with the `last` symlink
        flipped only once the async save has committed (at the next drain),
        so a crash mid-save never leaves the resume point dangling."""
        self._drain()  # previous save is committed; old dirs reclaimable

        new = self._dir(f"last.{self._last_serial}")
        self._last_serial += 1
        self._ckpt.save(new, state)
        self._pending_link = new  # flipped after the save commits

        if metric is None:
            return
        name = f"step_{step}"
        self._scores[name] = float(metric)
        keep = sorted(
            self._scores, key=self._scores.get, reverse=(self.mode == "max")
        )[: self.save_top_k]
        if name in keep:
            # a crash-resumed run re-reaches validated steps: replace the
            # committed dir (we just drained, so nothing is in flight there)
            if os.path.exists(self._dir(name)):
                import shutil

                shutil.rmtree(self._dir(name))
            self._ckpt.save(self._dir(name), state)
        for n in list(self._scores):
            if n not in keep:
                self._pending_rm.append(self._dir(n))
                del self._scores[n]
        with open(self._scores_path, "w") as fh:
            json.dump(self._scores, fh)

    def wait_until_finished(self) -> None:
        self._drain()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._drain()

    def restore(self, target: Any, name: str = "last") -> Any:
        self._drain()  # an in-flight async save may be the one requested
        return self._ckpt.restore(self._dir(name), target=target)

    def best(self) -> str | None:
        if not self._scores:
            return None
        return sorted(self._scores, key=self._scores.get,
                      reverse=(self.mode == "max"))[0]
