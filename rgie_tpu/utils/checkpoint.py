"""Checkpoint save/load via orbax + dataset-cursor resume manifests.

The reference only ever torch.saves best state_dicts
(`/root/reference/src/clf/train_guidance_clf.py:309-318`) and has NO mid-run
resume: a crash mid-dataset loses progress (SURVEY §5). Here:

  * model/optimizer state -> orbax (async-capable, TPU-native);
  * dataset-scale edit runs write an idempotent per-image manifest so a
    restarted run skips already-edited images (failure recovery the reference
    lacks).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Set

import jax


def save_checkpoint(path: str, tree: Any, step: Optional[int] = None) -> str:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if step is not None:
        path = path / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return str(path)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target)


class BestCheckpointer:
    """Best-validation-loss checkpointing (the reference's gate,
    train_guidance_clf.py:296-318), orbax-backed."""

    def __init__(self, directory: str):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.best_loss = float("inf")
        self.best_path: Optional[str] = None

    def maybe_save(self, val_loss: float, tree: Any, step: int) -> bool:
        if val_loss < self.best_loss:
            self.best_loss = val_loss
            self.best_path = save_checkpoint(str(self.directory / "best"), tree)
            with open(self.directory / "best_meta.json", "w") as f:
                json.dump({"val_loss": val_loss, "step": step}, f)
            return True
        return False


class EditManifest:
    """Idempotent record of completed (image, adaptation) edits; JSONL on disk
    so a crashed dataset run resumes where it stopped."""

    def __init__(self, path: str):
        self.path = Path(path)
        self.done: Set[str] = set()
        if self.path.exists():
            with open(self.path) as f:
                for line in f:
                    try:
                        self.done.add(json.loads(line)["key"])
                    except Exception:
                        continue
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")

    @staticmethod
    def key(image_name: str, adaptation: str) -> str:
        return f"{image_name}::{adaptation}"

    def is_done(self, image_name: str, adaptation: str) -> bool:
        return self.key(image_name, adaptation) in self.done

    def mark(self, image_name: str, adaptation: str, **extra) -> None:
        k = self.key(image_name, adaptation)
        self.done.add(k)
        self._fh.write(json.dumps({"key": k, **extra}) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()
