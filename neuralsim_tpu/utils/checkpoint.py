"""Checkpoint IO: orbax-backed save/load of the full training state.

TPU-native equivalent of ``nr3d_lib.checkpoint`` (``CheckpointIO``,
``sorted_ckpts`` — SURVEY.md §5 checkpoint row: periodic wall-clock
``latest`` saves every i_save seconds + iteration snapshots every i_backup +
final; reference train.py:1352-1372,1658-1668).

State tree: {params, opt_state, occ_grids, error_maps, it} — everything the
trainer carries, saved atomically per step directory.
"""
from __future__ import annotations

import os
import re
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class CheckpointIO:
    def __init__(self, ckpt_dir: str, *, i_save_seconds: float = 900.0,
                 i_backup: int = 5000, keep_last: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.i_save_seconds = i_save_seconds
        self.i_backup = i_backup
        self.keep_last = keep_last
        self._last_save_t = time.time()

    # -- low level -------------------------------------------------------------
    def save(self, state: Any, step: int, tag: Optional[str] = None) -> str:
        ocp = _ocp()
        name = tag or f"step_{step:08d}"
        path = os.path.join(self.ckpt_dir, name)
        ckptr = ocp.StandardCheckpointer()
        # orbax refuses to overwrite; remove stale dirs (e.g. 'latest')
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        ckptr.save(path, jax.device_get(state))
        ckptr.wait_until_finished()
        self._gc()
        return path

    def load(self, state_template: Any, tag_or_path: Optional[str] = None) -> Any:
        ocp = _ocp()
        path = tag_or_path
        if path is None:
            # most-recent of: newest step snapshot vs the tag saves. The
            # time-based 'latest' is typically newer than the last i_backup
            # step snapshot — picking the step snapshot unconditionally would
            # silently discard up to i_backup iterations of progress.
            candidates = []
            ckpts = self.sorted_ckpts()
            if ckpts:
                candidates.append(ckpts[-1])
            for tag in ("final", "latest"):
                p = os.path.join(self.ckpt_dir, tag)
                if os.path.isdir(p):
                    candidates.append(p)
            if not candidates:
                return None
            path = max(candidates, key=os.path.getmtime)
        elif not os.path.isabs(path):
            path = os.path.join(self.ckpt_dir, path)
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, jax.device_get(state_template))

    def sorted_ckpts(self) -> List[str]:
        """Step-sorted checkpoint paths (reference sorted_ckpts)."""
        out = []
        for d in os.listdir(self.ckpt_dir):
            m = re.fullmatch(r"step_(\d+)", d)
            if m:
                out.append((int(m.group(1)), os.path.join(self.ckpt_dir, d)))
        return [p for _, p in sorted(out)]

    def _gc(self):
        ckpts = self.sorted_ckpts()
        for p in ckpts[:-self.keep_last] if self.keep_last else []:
            step = int(re.search(r"step_(\d+)", p).group(1))
            if self.i_backup and step % self.i_backup == 0:
                continue  # keep backup snapshots
            import shutil
            shutil.rmtree(p, ignore_errors=True)

    # -- trainer-facing cadence -------------------------------------------------
    def maybe_save(self, state: Any, step: int) -> Optional[str]:
        """Time-based 'latest' save + iteration backups (reference
        train.py:1658-1668)."""
        saved = None
        if self.i_backup and step > 0 and step % self.i_backup == 0:
            saved = self.save(state, step)
        if time.time() - self._last_save_t > self.i_save_seconds:
            saved = self.save(state, step, tag="latest")
            self._last_save_t = time.time()
        return saved
