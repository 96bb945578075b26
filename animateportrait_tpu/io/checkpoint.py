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


def save_flax_npz(path: str, variables: Any) -> None:
    """Single-file flax variable dict -> .npz ('/'-joined key paths).

    The portable sibling of the torch converters: lets ``--frozen_dir``
    carry nets trained IN this framework (e.g. a stand-in frozen
    MobileFaceNet from ``tools/train_standin_frozen.py``) without a
    torch round-trip. Collections (params / batch_stats / ...) are the
    first path component.
    """
    import numpy as np
    from flax import traverse_util

    flat = traverse_util.flatten_dict(variables, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_flax_npz(path: str) -> Any:
    import numpy as np
    from flax import traverse_util

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return traverse_util.unflatten_dict(flat, sep="/")


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
        self._latest_mgr = None

    def _latest(self):
        """Single rolling 'latest' slot (<dir>/latest, max_to_keep=1) —
        the reference's latest_net_* files are one overwritten slot
        (base_model.py:152-156). Routing latest-cadence saves into the
        MAIN manager would count them against its max_to_keep and evict
        the epoch snapshots."""
        import orbax.checkpoint as ocp

        if self._latest_mgr is None:
            self._latest_mgr = ocp.CheckpointManager(
                os.path.join(self._dir, "latest"),
                options=ocp.CheckpointManagerOptions(max_to_keep=1))
        return self._latest_mgr

    def save(self, step: int, state: Any, force: bool = False,
             keep: bool = False, latest: bool = False) -> bool:
        """force: save even off the save_interval cadence; latest: write
        the rolling latest/ slot instead of the epoch namespace (the
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
        if latest:
            mgr = self._latest()
            ok = mgr.save(step, args=ocp.args.StandardSave(state),
                          force=True)
            mgr.wait_until_finished()
            return ok
        ok = self._mgr.save(step, args=ocp.args.StandardSave(state),
                            force=force)
        self._mgr.wait_until_finished()
        return ok

    def restore(self, step: int | None, target: Any) -> Any:
        import orbax.checkpoint as ocp

        step = self.latest_step() if step is None else step
        # the rolling latest/ slot may hold the newest state (and is the
        # ONLY holder of its step when the crash happened between epoch
        # saves); route to it exactly when it owns the requested step
        if step is not None and os.path.isdir(
                os.path.join(self._dir, "latest")):
            lm = self._latest()
            if (lm.latest_step() == step
                    and step not in self._mgr.all_steps()):
                return lm.restore(step,
                                  args=ocp.args.StandardRestore(target))
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(target))

    def latest_step(self) -> int | None:
        steps = [s for s in (self._mgr.latest_step(),) if s is not None]
        if os.path.isdir(os.path.join(self._dir, "latest")):
            ls = self._latest().latest_step()
            if ls is not None:
                steps.append(ls)
        return max(steps) if steps else None

    def close(self):
        self._mgr.close()
        if self._iter_mgr is not None:
            self._iter_mgr.close()
        if self._latest_mgr is not None:
            self._latest_mgr.close()
