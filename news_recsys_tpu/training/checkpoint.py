"""Sharded checkpointing + resume via Orbax.

The reference relies on Lightning's per-epoch weight-only checkpoints with
no mid-epoch resume (``DSSM/train.py:54-60``, ``base_model.py:531-536``).
Here:

- full train state (params + optimizer moments + step) is saved with Orbax,
  sharded arrays written natively (each host writes its shards on
  multi-host);
- restore is **mesh-flexible**: the target shardings come from the restore
  context, so a checkpoint written on one mesh loads onto a different mesh
  (or a single device);
- `step` is part of the state, so training resumes mid-schedule exactly
  (the reference's lr schedule is step-indexed, ``lr_schedule.py:16-28``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..utils.logging import get_logger

logger = get_logger("checkpoint")


class CheckpointManager:
    """Thin Orbax wrapper: epoch-indexed directories with retention."""

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of ``state_like``.

        ``state_like`` can be a fully materialized state on the *target*
        mesh (its shardings are reused, enabling cross-mesh restore).
        """
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.directory}")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape") else x,
            state_like,
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.close()
