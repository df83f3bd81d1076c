"""Checkpoint/resume via orbax.

The reference checkpoints only the mini-batch path, with
``torch.save(state_dict)`` keyed by best validation AUC
(``src/model_handler.py:379-399``). Here both paths share one orbax-based
checkpointer storing params + optimizer state + RNG + epoch, enabling
mid-run resume (the reference cannot resume)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any, *, metrics: Optional[dict] = None,
             force: bool = False) -> None:
        ocp = _ocp()
        self.mngr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics, force=force)
        self.mngr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        ocp = _ocp()
        if step is None:
            step = self.mngr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self.mngr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self.mngr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()
