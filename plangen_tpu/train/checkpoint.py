"""Orbax checkpointing with FIFO rotation and latest-resume.

Reference behavior (base_system.py:127-189, train.py:199-201): save every
`checkpointing_steps` under `checkpoint-{step}/`, keep the newest
`checkpoints_total_limit` (FIFO delete), resume='latest' scans for the newest
step. The reference saves ONLY trainable params and no optimizer state; here
the full TrainState (params + optimizer + step) is saved so resume is exact —
`save_trainable_only` replicates the reference's lighter artifact when needed.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from plangen_tpu.train.step import TrainState


class PlanGenCheckpointer:
    def __init__(self, directory: str, total_limit: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=total_limit, create=True
            ),
        )

    def save(self, step: int, state: TrainState, force: bool = False) -> None:
        self.manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(
        self, abstract_state: TrainState, step: Optional[int] = None
    ) -> Optional[TrainState]:
        """Restore into the structure/shardings of `abstract_state`.

        Returns None when no checkpoint exists (fresh start).
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        target = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_state
        )
        return self.manager.restore(step, args=ocp.args.StandardRestore(target))

    def save_params_only(self, step: int, params: Any, mask: Any = None) -> str:
        """Save (optionally trainable-masked) params as a standalone artifact."""
        path = os.path.join(self.directory, f"params-{step}")
        if mask is not None:
            params = jax.tree_util.tree_map(
                lambda p, m: p if m else None, params, mask
            )
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, params)
        ckptr.wait_until_finished()
        return path
