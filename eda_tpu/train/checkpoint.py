"""Checkpoint save/restore with orbax.

Covers the reference semantics (``main_utils.py:126-166``): epoch-tagged
{params, batch_stats, opt_state, step, config} with optional optimizer
restore (skipped for --eval / --reduce_lr), plus auto-resume by scanning the
log dir for the newest checkpoint — which the reference requires the user to
do by hand after a crash (SURVEY.md §5: no elastic recovery). Also provides
the torch-checkpoint converter hook for warm-starting from the reference's
released ``.pth`` files.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with reference-equivalent save cadence."""

    def __init__(self, directory: str, save_freq: int = 5, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        self.save_freq = save_freq
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch: int, state, force: bool = False):
        """Save {params, batch_stats, opt_state, step} at an epoch boundary."""
        if not force and self.save_freq > 0 and (epoch + 1) % self.save_freq != 0:
            return False
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        return True

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state, epoch: Optional[int] = None, restore_optimizer: bool = True):
        """Restore into an existing TrainState (template provides structure).

        Returns (state, start_epoch). ``restore_optimizer=False`` mirrors the
        reference's --eval/--reduce_lr behavior (main_utils.py:138-145).
        """
        epoch = self.latest_epoch() if epoch is None else epoch
        if epoch is None:
            return state, 0
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template)
        )
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            step=restored["step"],
            opt_state=restored["opt_state"] if restore_optimizer else state.opt_state,
        )
        return state, epoch + 1


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``.pth`` state dict as numpy arrays (DDP 'module.'
    prefixes stripped). Requires torch (CPU build is in the image)."""
    import numpy as np
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt)
    out = {}
    for key, value in state.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if torch.is_tensor(value):
            out[key] = np.asarray(value.detach().cpu().numpy())
        elif isinstance(value, np.ndarray):
            out[key] = value
    return out
