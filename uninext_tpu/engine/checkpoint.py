"""Checkpointing via orbax + torch-zoo weight conversion.

Parity: DetectionCheckpointer (detection_checkpoint.py:15) —
save/resume of model+optimizer+iteration; `resume_or_load` semantics; loading
reference .pth zoo weights with key remapping (engine/convert.py does the
torch->flax mapping, including the 3->4 channel conv1 inflation the reference
performs via conversion/convert_3c_to_4c_pth.py).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state) -> None:
        if step in (self._mgr.all_steps() or ()):  # idempotent per step:
            return  # hooks may fire periodic+final/best saves at one iter
        self._mgr.save(step, args=ocp.args.StandardSave(
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step}))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_params(self, params, step: Optional[int] = None):
        """Restore only the model params (eval-only: no optimizer state)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return params, False
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore({"params": params}))
        except (ValueError, KeyError, TypeError):
            # orbax versions that require the full saved structure
            restored = self._mgr.restore(step)
        return restored["params"], True

    def restore(self, state, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return state, False
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step}
        restored = self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(target))
        return state.replace(params=restored["params"],
                             opt_state=restored["opt_state"],
                             step=restored["step"]), True

    def resume_or_load(self, state, init_weights_path: Optional[str] = None):
        """d2 resume_or_load semantics: resume full state if a checkpoint
        exists, else load initial weights only (no optimizer/iteration)."""
        state, resumed = self.restore(state)
        if resumed:
            return state, True
        if init_weights_path and os.path.exists(init_weights_path):
            from .convert import load_torch_checkpoint
            params = load_torch_checkpoint(init_weights_path, state.params)
            state = state.replace(params=params)
        return state, False


def inflate_conv_3c_to_4c(kernel: np.ndarray) -> np.ndarray:
    """(kh, kw, 3, out) -> (kh, kw, 4, out); new channel zero-initialized.

    Parity: conversion/convert_3c_to_4c_pth.py (template-branch backbone for
    SOT/VOS consumes RGB+mask input)."""
    kh, kw, _, out = kernel.shape
    return np.concatenate(
        [kernel, np.zeros((kh, kw, 1, out), kernel.dtype)], axis=2)
