"""Orbax checkpointing: params + opt_state + step, keep-best policy, true
mid-run resume.

Upgrades the reference's torch.save best/final dicts
(train_thermal_dustr.py:512-556) which save optimizer state but never reload
it (SURVEY.md §5 checkpoint/resume): here `restore` resumes the full
TrainState.
"""

from __future__ import annotations

import os
from typing import Optional


import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m["val_loss"],
            best_mode="min",
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, val_loss: float, extra: Optional[dict] = None):
        payload = {"state": state, "meta": {"val_loss": float(val_loss), **(extra or {})}}
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(payload["meta"]),
            ),
            metrics={"val_loss": float(val_loss)},
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def close(self):
        self._mgr.close()


def load_params_from_checkpoint_dir(directory: str, step: Optional[int] = None):
    """Restore just the model params from an orbax checkpoint directory
    (template-free — for inference CLIs). Returns (params, meta)."""
    mgr = ocp.CheckpointManager(os.path.abspath(directory))
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(),
            meta=ocp.args.JsonRestore(),
        ),
    )
    mgr.close()
    state = restored["state"]
    return state["params"], restored["meta"]
