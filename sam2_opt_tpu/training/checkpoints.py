"""Checkpoint save/load/resume (orbax) + parameter-pattern utilities.

Re-design of sam2/training/utils/checkpoint_utils.py:30-361 and the Trainer
checkpoint paths (trainer.py:344-445): atomic full-state checkpoints
(params/opt/step/best-meters), resume auto-discovery, unix-pattern parameter
inclusion/exclusion, and frozen-parameter verification.
"""

from __future__ import annotations

import fnmatch
import os
import re
import shutil
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from sam2_opt_tpu.utils.misc import keystr_to_dotted




def names_matching(params, patterns: Sequence[str]) -> List[str]:
    """All parameter names (torch-style dotted) matching any unix pattern
    (reference checkpoint_utils.py:30-66 unix_pattern_to_parameter_names)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = [keystr_to_dotted(jax.tree_util.keystr(p)) for p, _ in flat]
    out = []
    for n in names:
        if any(fnmatch.fnmatch(n, pat) for pat in patterns):
            out.append(n)
    return out


def filter_params(params, include: Optional[Sequence[str]] = None,
                  exclude: Optional[Sequence[str]] = None):
    """Return {name: array} after include/exclude pattern filtering
    (reference checkpoint_utils.py:68-88)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    result = {}
    for path, leaf in flat:
        name = keystr_to_dotted(jax.tree_util.keystr(path))
        if include and not any(fnmatch.fnmatch(name, p) for p in include):
            continue
        if exclude and any(fnmatch.fnmatch(name, p) for p in exclude):
            continue
        result[name] = leaf
    return result


def assert_frozen_unchanged(before: Dict[str, np.ndarray], params,
                            patterns: Sequence[str]):
    """Verify params matching `patterns` did not change
    (reference assert_skipped_parameters_are_frozen, checkpoint_utils.py:99)."""
    now = filter_params(params, include=patterns)
    changed = [
        n for n, v in now.items()
        if n in before and not np.array_equal(np.asarray(v), before[n])
    ]
    if changed:
        raise AssertionError(
            f"parameters expected frozen but changed: {changed[:5]}"
        )


class CheckpointManager:
    """Atomic full-train-state checkpoints with resume discovery."""

    def __init__(self, save_dir: str, keep: int = 3):
        self.save_dir = os.path.abspath(save_dir)
        self.keep = keep
        os.makedirs(self.save_dir, exist_ok=True)
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckpt = ocp.PyTreeCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.save_dir, f"checkpoint_{step}")

    def save(self, step: int, state: Dict):
        """Atomic save: write to tmp dir, rename (reference trainer.py:363-380).

        Saving step S also deletes checkpoints with step > S: after restoring
        an older step and retraining, higher-step checkpoints are stale
        futures from the rolled-back timeline — keeping them would make the
        step-ordered GC delete the FRESH saves and point resume
        auto-discovery (latest_step) at pre-rollback state."""
        final = self._path(step)
        tmp = final + ".tmp"
        multiproc = jax.process_count() > 1
        rank0 = jax.process_index() == 0
        if rank0 and os.path.exists(tmp):
            shutil.rmtree(tmp)
        if multiproc:
            # orbax's save is collective (internal cross-process barriers):
            # EVERY process must call it, with identical host state (the
            # trainer fetch_global's the sharded train state first). Only
            # rank 0 touches the filesystem bookkeeping around it.
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_tmp_clean_{step}")
        state = jax.tree_util.tree_map(np.asarray, state)
        self._ckpt.save(tmp, state)
        if rank0:
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(tmp, final)
            for s in self.all_steps():
                if s > step:
                    shutil.rmtree(self._path(s), ignore_errors=True)
            self._gc()
        if multiproc:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_done_{step}")

    def _gc(self):
        steps = self.all_steps()
        for s in steps[: -self.keep]:
            shutil.rmtree(self._path(s), ignore_errors=True)

    def all_steps(self) -> List[int]:
        steps = []
        for name in os.listdir(self.save_dir):
            m = re.fullmatch(r"checkpoint_(\d+)", name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, step: Optional[int] = None, target=None):
        """Restore a checkpoint (latest when step is None); returns the state
        dict or None if no checkpoint exists (resume auto-discovery,
        reference trainer.py:382-445)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        from sam2_opt_tpu.io.checkpoints import intify_keys

        restored = self._ckpt.restore(self._path(step), item=target)
        return intify_keys(restored)
