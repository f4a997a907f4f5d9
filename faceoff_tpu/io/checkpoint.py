"""Orbax checkpointing of the full train state.

The reference saves only the model weights and silently loses the
optimizer, scheduler and step on resume (reference
train_faceoff_perceptual.py:140-143,178-185; SURVEY §5). Here the entire
`TrainState` pytree (params, EMA codebooks, optimizer state, step)
round-trips, so `--ckpt` resume is exact.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=False
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        # PyTree handler throughout so full and partial (weights-only)
        # restores share one registered handler per manager
        self._mgr.save(step, args=ocp.args.PyTreeSave(_savable(state)))
        self._mgr.wait_until_finished()

    def restore(self, state: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state` (which supplies shapes,
        dtypes and static fields)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.PyTreeRestore(item=_savable(state))
        )
        return _rebuild(state, restored)

    def restore_weights(self, state: Any, step: Optional[int] = None) -> Any:
        """Restore only step/params/vq — optimizer state is ignored, so a
        checkpoint trains on (e.g.) a cycle schedule and still loads for
        inference or fine-tuning under a different optimizer (the
        reference's `--ckpt` semantics, train_faceoff_perceptual.py:178-185,
        which also carries weights only)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        partial = {
            "step": state.step,
            "params": state.params,
            "vq": state.vq,
        }
        restored = self._mgr.restore(
            step,
            args=ocp.args.PyTreeRestore(item=partial, partial_restore=True),
        )
        return state.replace(**restored)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()


def _savable(state: Any):
    """Checkpointable view of a train state: the pytree fields of any
    flax.struct dataclass as nested dicts (static fields like the optax
    transforms are skipped — they are code, not state). Works for the
    perceptual TrainState and for composite states such as GANTrainState
    (gen + two discriminators + their optimizers), so the GAN stage can
    resume exactly — unlike the reference, which saves only module
    weights (disc_trainers/train_vqvae_mocoganhd_disc_single.py:321-328)."""
    if isinstance(state, dict):
        return {k: _savable(v) for k, v in state.items()}
    if dataclasses.is_dataclass(state) and not isinstance(state, type):
        return {
            f.name: _savable(getattr(state, f.name))
            for f in dataclasses.fields(state)
            if f.metadata.get("pytree_node", True)
        }
    return state


def _rebuild(template: Any, restored: Any):
    """Inverse of _savable: pour the restored nested dict back into the
    dataclass structure of `template` (which also supplies static fields)."""
    if isinstance(template, dict) and isinstance(restored, dict):
        out = dict(template)
        out.update(
            {k: _rebuild(template.get(k), v) for k, v in restored.items()}
        )
        return out
    if dataclasses.is_dataclass(template) and not isinstance(template, type):
        kwargs = {
            k: _rebuild(getattr(template, k), v) for k, v in restored.items()
        }
        return template.replace(**kwargs)
    return restored
