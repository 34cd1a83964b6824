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


def _flatten_tree(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if hasattr(v, "items"):
            out.update(_flatten_tree(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten_tree(flat):
    root: dict = {}
    for path, leaf in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return root


def load_stage_weights(target_params, source_params, inflate_4c: bool = True,
                       template_from_backbone: bool = True,
                       verbose: bool = True):
    """flax->flax stage hand-off with d2 DetectionCheckpointer semantics
    (detection_checkpoint.py:15 + c2_model_loading shape-skip): copy every
    leaf whose path exists in the source with a matching shape; leave
    missing or shape-mismatched leaves at the target's initialization and
    report them. This is how the reference's 3-stage pipeline hands weights
    forward (obj365 pretrain -> image_joint -> video_joint, assets/TRAIN.md),
    with two stage-specific rules folded in:

      * the stage-3 `template_backbone` tower (absent from image
        checkpoints) initializes from the image `backbone` at the same
        subpath — the reference builds the 4-channel template branch from
        the same backbone family (uninext_vid.py:160-167);
      * a (kh, kw, 4, out) conv whose source is (kh, kw, 3, out) is
        inflated with a zero-init 4th input channel — the reference's
        conversion/convert_3c_to_4c_pth.py surgery between stages 2 and 3.

    No classifier-head surgery is ever needed across category-set changes
    (obj365 -> coco joint): classification is query<->prompt-token alignment
    (VL_Align), so there is no class-indexed weight to remap.

    Returns (new_params_dict, report) where report counts
    {loaded, inflated, remapped_template, missing, mismatched}.
    """
    tgt = _flatten_tree(target_params)
    src = _flatten_tree(source_params)
    report = {"loaded": 0, "inflated": 0, "remapped_template": 0,
              "missing": [], "mismatched": []}
    out = {}
    for path, leaf in tgt.items():
        cand = path
        remapped = False
        if cand not in src and template_from_backbone \
                and "template_backbone" in path:
            cand = tuple("backbone" if p == "template_backbone" else p
                         for p in path)
            remapped = True
        if cand not in src:
            out[path] = leaf
            report["missing"].append("/".join(path))
            continue
        s = np.asarray(src[cand])
        t_shape = tuple(np.shape(leaf))
        if tuple(s.shape) == t_shape:
            out[path] = jax.numpy.asarray(s, dtype=leaf.dtype)
        elif (inflate_4c and s.ndim == 4 and len(t_shape) == 4
              and s.shape[2] == 3 and t_shape[2] == 4
              and (s.shape[0], s.shape[1], s.shape[3])
              == (t_shape[0], t_shape[1], t_shape[3])):
            out[path] = jax.numpy.asarray(inflate_conv_3c_to_4c(s),
                                          dtype=leaf.dtype)
            report["inflated"] += 1
        else:
            out[path] = leaf
            report["mismatched"].append(
                f"{'/'.join(path)}: src {tuple(s.shape)} vs tgt {t_shape}")
            continue
        report["loaded"] += 1
        report["remapped_template"] += int(remapped)
    if verbose:
        print(f"[load_stage_weights] loaded {report['loaded']} "
              f"(inflated {report['inflated']}, template-remapped "
              f"{report['remapped_template']}), "
              f"{len(report['missing'])} left at init, "
              f"{len(report['mismatched'])} shape-skipped")
    return _unflatten_tree(out), report
