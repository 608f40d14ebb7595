"""Orbax checkpointing: params + opt_state + step, keep-best + keep-last,
true mid-run resume.

Upgrades the reference's torch.save best/final dicts
(train_thermal_dustr.py:512-556) which save optimizer state but never reload
it (SURVEY.md §5 checkpoint/resume): here `restore` resumes the full
TrainState. Two policies live side by side:

  <dir>/best — best-val checkpoints (keep-best policy, like the reference's
               `*_best.pth` at train:518-532)
  <dir>/last — every epoch, max_to_keep=1, so resume continues from the TRUE
               last epoch instead of replaying everything since the last
               improvement (up to `patience` epochs on a plateau).

Early-stop bookkeeping (best_val, patience) rides in the meta JSON so a
resumed run stops at the same epoch the uninterrupted run would.

Saves are ASYNC (round 4): orbax snapshots device→host inside save() and
writes to disk in the background, so serializing the multi-GB ViT-L state
overlaps the next training epoch instead of stalling the chips. Reads
(latest_step/best_step/restore) and close() wait for in-flight saves first,
so read-your-writes semantics are preserved.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        # Multi-host runs: orbax coordinates async-save commit/finalize via
        # jax.distributed barriers whose keys are NOT namespaced per manager
        # by default — two managers (best + last) finalizing around the same
        # epoch boundary collide ("Barrier ThreadSaveMultiHostValueHolder:
        # set_value_start is already ongoing", observed in the real 2-process
        # loop test). Distinct barrier_sync_key_prefix values isolate them.
        def _mp(prefix):
            return ocp.options.MultiprocessingOptions(
                barrier_sync_key_prefix=prefix)

        best_options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m["val_loss"],
            best_mode="min",
            multiprocessing_options=_mp("best"),
        )
        self._best = ocp.CheckpointManager(
            os.path.join(self.directory, "best"), options=best_options)
        self._last = ocp.CheckpointManager(
            os.path.join(self.directory, "last"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, multiprocessing_options=_mp("last")))
        # pre-best/last-layout dirs (checkpoints directly under <dir>) must
        # still resume instead of silently restarting from scratch. Detection
        # is format-agnostic: let orbax itself scan the root (it understands
        # padded/prefixed step-dir names like 'step_100' that a bare
        # digits-only pattern match would miss) and keep the manager only if
        # it actually finds a step.
        self._legacy = None
        try:
            legacy = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    multiprocessing_options=_mp("legacy")))
            if legacy.latest_step() is not None:
                self._legacy = legacy
            else:
                legacy.close()
        except Exception:  # unreadable root layout — no legacy resume
            pass

    def _managers(self):
        """Resume priority: last (exact) → best → legacy flat layout."""
        mgrs = [self._last, self._best]
        if self._legacy is not None:
            mgrs.append(self._legacy)
        return mgrs

    @staticmethod
    def _save(mgr, step: int, state, val_loss: float, extra: Optional[dict]):
        """Async save: orbax copies device→host synchronously inside save()
        (so the donated TrainState buffers are safe to reuse on the next
        step), then writes to disk in the background — the multi-GB ViT-L
        state serialization overlaps the next epoch instead of stalling the
        chips. Durability points: orbax itself waits for the previous
        in-flight save of the same manager before starting a new one, commits
        step dirs atomically, and close() blocks until everything is on disk.

        Error surfacing: a failed background disk write raises at the next
        wait_until_finished, not at the save() that started it — so wait for
        the PREVIOUS in-flight save here first. Overlap is preserved (that
        save had the whole intervening epoch to finish); a disk failure
        surfaces at most one epoch late instead of only at end-of-run close().
        """
        mgr.wait_until_finished()
        meta = {"val_loss": float(val_loss), **(extra or {})}
        mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
            metrics={"val_loss": float(val_loss)},
        )

    def wait_until_finished(self):
        """Block until all in-flight async saves are committed to disk."""
        self._best.wait_until_finished()
        self._last.wait_until_finished()

    def save(self, step: int, state, val_loss: float, extra: Optional[dict] = None):
        """Record a new BEST checkpoint (call on val improvement)."""
        self._save(self._best, step, state, val_loss, extra)

    save_best = save

    def save_last(self, step: int, state, val_loss: float,
                  extra: Optional[dict] = None):
        """Record the rolling LAST checkpoint (call every epoch)."""
        self._save(self._last, step, state, val_loss, extra)

    def latest_step(self) -> Optional[int]:
        self.wait_until_finished()  # read-your-writes under async saves
        for mgr in self._managers():
            step = mgr.latest_step()
            if step is not None:
                return step
        return None

    def best_step(self) -> Optional[int]:
        self._best.wait_until_finished()
        return self._best.best_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Resume point: the LAST checkpoint when present (exact resume),
        else best, else a legacy flat-layout checkpoint. With an explicit
        `step`, the manager that actually CONTAINS that step is used (best/
        and last/ hold disjoint step sets on plateaus)."""
        self.wait_until_finished()  # read-your-writes under async saves
        mgr = None
        if step is not None:
            for cand in self._managers():
                if step in (cand.all_steps() or []):
                    mgr = cand
                    break
            if mgr is None:
                raise FileNotFoundError(
                    f"step {step} not found under {self.directory}")
        else:
            for cand in self._managers():
                if cand.latest_step() is not None:
                    mgr = cand
                    break
            if mgr is None:
                return None, None
            step = mgr.latest_step()
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def close(self):
        self.wait_until_finished()
        self._best.close()
        self._last.close()
        if self._legacy is not None:
            self._legacy.close()


def load_params_from_checkpoint_dir(directory: str, step: Optional[int] = None):
    """Restore just the model params from a checkpoint directory
    (template-free — for inference CLIs). Prefers the best checkpoint, then
    last, then a legacy flat layout. Returns (params, meta)."""
    directory = os.path.abspath(directory)
    candidates = [os.path.join(directory, "best"),
                  os.path.join(directory, "last"), directory]
    for cand in candidates:
        if not os.path.isdir(cand):
            continue
        mgr = ocp.CheckpointManager(cand)
        found = mgr.latest_step()
        if found is None or (step is not None
                             and step not in (mgr.all_steps() or [])):
            mgr.close()
            continue
        use = step if step is not None else found
        restored = mgr.restore(
            use,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(),
                meta=ocp.args.JsonRestore(),
            ),
        )
        mgr.close()
        state = restored["state"]
        return state["params"], restored["meta"]
    raise FileNotFoundError(f"no checkpoints under {directory}")
