"""Checkpointing — orbax-based save/restore of the full TrainState
(replacement for detectron2's DetectionCheckpointer `resume_or_load`,
reference: train_net.py:310-321: model + optimizer + scheduler + iteration,
`last_checkpoint` pointer, periodic saves)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False):
        self._mgr.save(
            step, args=ocp.args.StandardSave(jax.tree.map(np.asarray, state)),
            force=force,
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def restore_variables(self, step: Optional[int] = None) -> Any:
        """Restore model variables ({params[, frozen]}) from a checkpoint that
        holds either a full TrainState (step/params/frozen/opt_state/rng — what
        the Trainer saves) or bare variables. Orbax StandardRestore rejects
        sub-structure templates ('tree structures do not match'), so restore
        with the saved structure (no template) and extract the variables."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        raw = self._mgr.restore(step, args=ocp.args.StandardRestore())
        if "params" not in raw:
            raise KeyError(
                f"checkpoint at {self.directory} step {step} has no 'params' "
                f"(keys: {list(raw)})"
            )
        variables = {"params": raw["params"]}
        if raw.get("frozen"):
            variables["frozen"] = raw["frozen"]
        return variables

    def resume_or_load(self, state: Any, resume: bool = True) -> Any:
        """Reference semantics: if resume and a checkpoint exists, restore the
        FULL state (optimizer + step); otherwise return the fresh state."""
        if resume and self.latest_step() is not None:
            return self.restore(state)
        return state
