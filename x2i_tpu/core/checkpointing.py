"""Orbax checkpointing with reference-equivalent resume semantics.

The reference saves `{output_dir}/{step}/diffusion_pytorch_model.bin` and
auto-resumes from the max numeric dirname
(/root/reference/train/train_minicpm.py:203-207,407-414,647-653). We keep the
same directory-per-step layout and latest-step scan, backed by orbax.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


_NUM_RE = re.compile(r"^\d+$")


def latest_step(output_dir: str) -> Optional[int]:
    """Max numeric subdirectory name, or None (mirrors
    get_max_numbered_filename, train_minicpm.py:203-207)."""
    if not os.path.isdir(output_dir):
        return None
    steps = [int(d) for d in os.listdir(output_dir) if _NUM_RE.match(d)]
    return max(steps) if steps else None


class CheckpointManager:
    """Step-directory checkpoints of arbitrary pytrees (params + opt state)."""

    def __init__(self, output_dir: str, max_to_keep: Optional[int] = 5):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.output_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, tree: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None,
                template: Optional[Any] = None) -> Any:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
