"""Checkpoint save/resume via Orbax.

Capability parity with the reference's checkpointing (main.py:726-757:
rolling `checkpoint.pth` + periodic epoch snapshots holding model,
optimizer, lr state, epoch, and args; resume at main.py:599-613), rebuilt
on orbax.checkpoint with a keep-last-N policy. Warm starts with filtered
query embeddings go through engine/convert.py instead of strict loading.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory, keep: int = 5, save_interval: int = 1):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=save_interval
            ),
        )

    def save(self, step: int, state, config: Optional[Any] = None):
        """state: any pytree (e.g. engine.train.TrainState)."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if config is not None:
            cfg = dataclasses.asdict(config) if dataclasses.is_dataclass(config) else config
            (self.directory / "config.json").write_text(json.dumps(cfg, indent=2))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target, step: Optional[int] = None):
        """target: pytree of like-shaped arrays (abstract ok)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def close(self):
        self._mgr.close()
