"""Checkpoint save/restore (orbax), replacing mmengine CheckpointHook +
``--resume auto`` (tools/train.py:111-117): epoch checkpoints with optimizer
state, plus weights-only load for stage chaining (``load_from`` /
``ori_checkpoint_file``)."""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, tree: Any):
    path = os.path.join(os.path.abspath(ckpt_dir), f'step_{step}')
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    best_step = -1
    for name in os.listdir(ckpt_dir):
        m = re.match(r'^step_(\d+)$', name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(os.path.abspath(ckpt_dir), name)
    return best


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure/shardings of ``target`` (an abstract or
    concrete example pytree)."""
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    return ckptr.restore(path, abstract)


def load_checkpoint_raw(path: str) -> Any:
    """Restore the FULL saved tree without a target structure (numpy leaves).

    Used by weights-only loading (tools/test.py, stage chaining), where the
    caller doesn't know the optimizer-state structure stored alongside."""
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path)
