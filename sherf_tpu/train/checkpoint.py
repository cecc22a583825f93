"""Checkpointing via orbax.

Replaces the reference's whole-module pickling (training_loop.py:563-579 +
persistence.py): we persist the param/EMA/optimizer pytrees and mutable
collections; module code lives in the package, not the checkpoint.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from sherf_tpu.train.train_state import SHERFTrainState


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: SHERFTrainState, step: Optional[int] = None):
    step = int(state.step) if step is None else int(step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"snapshot-{step:06d}")
    payload = {
        "step": state.step,
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        "extra_vars": state.extra_vars,
    }
    _checkpointer().save(path, payload, force=True)
    return path


def restore_checkpoint(path: str, state: SHERFTrainState) -> SHERFTrainState:
    """Restore into an existing (template) state — shapes/dtypes come from
    the template, mirroring misc.copy_params_and_buffers resume semantics
    (training_loop.py:199-208)."""
    template = {
        "step": state.step,
        "params": state.params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        "extra_vars": state.extra_vars,
    }
    restored = _checkpointer().restore(os.path.abspath(path), item=template)
    return state.replace(
        step=restored["step"], params=restored["params"],
        ema_params=restored["ema_params"], opt_state=restored["opt_state"],
        extra_vars=restored["extra_vars"])


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    snaps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("snapshot-"))
    return os.path.join(ckpt_dir, snaps[-1]) if snaps else None
