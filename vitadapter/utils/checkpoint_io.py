"""Orbax-based train-state checkpointing (save / resume / load-weights).

Replaces the reference's mmcv CheckpointHook + `--resume-from`/`--auto-resume`
(SURVEY §5.4) with orbax: atomic, async-capable, mesh-aware restores.
"""

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    max_keep: int = 1) -> None:
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(
        ckpt_dir,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_keep),
    ) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(_to_savable(state)))


def latest_step(ckpt_dir: str) -> Optional[int]:
    ckpt_dir = os.path.abspath(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, template: Any,
                       step: Optional[int] = None) -> Any:
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(_to_savable(template)))
    return restored


def _to_savable(tree):
    return jax.tree_util.tree_map(np.asarray, tree)
