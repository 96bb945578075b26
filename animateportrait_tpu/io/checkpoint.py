"""Orbax checkpointing: save/restore whole train-state PyTrees.

TPU-native replacement for the reference's per-net `<epoch>_net_<name>.pth`
files (`Module2/models/base_model.py:144-202`): the entire TrainState
(params for G and all Ds, both optimizer states, the image pool, step)
is one async-checkpointed PyTree; Module1-style whole-dict checkpoints
(`train_content.py:327`) map to the same API.
"""
from __future__ import annotations

import os
from typing import Any

import jax


def save(path: str, state: Any, force: bool = True) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()


def restore(path: str, target: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


class CheckpointManager:
    """Epoch-style manager: latest + every save_epoch_freq like the
    reference's latest_*/<epoch>_* naming (base_model.py:144-163)."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps),
        )
        self._iter_mgr = None

    def save(self, step: int, state: Any, force: bool = False,
             keep: bool = False) -> bool:
        """force: save even off the save_interval cadence (the
        save_latest_freq path, train.py:48-55); keep: also persist under
        iters/ with no pruning (--save_by_iter)."""
        import orbax.checkpoint as ocp

        if keep:
            if self._iter_mgr is None:
                self._iter_mgr = ocp.CheckpointManager(
                    os.path.join(self._dir, "iters"),
                    options=ocp.CheckpointManagerOptions(max_to_keep=None))
            self._iter_mgr.save(step, args=ocp.args.StandardSave(state))
            self._iter_mgr.wait_until_finished()
        ok = self._mgr.save(step, args=ocp.args.StandardSave(state),
                            force=force)
        self._mgr.wait_until_finished()
        return ok

    def restore(self, step: int | None, target: Any) -> Any:
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(target))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
