"""Checkpoint/resume for fine-tuning state.

The reference's checkpoint/resume surface is download resumption and
settings merging (SURVEY §5, both ported); training state checkpoints are
the framework-side addition: Orbax-backed save/restore of (params,
opt_state, step) with atomic directory swaps, so interrupted fine-tunes
resume exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


def save_checkpoint(path: str, params: Any, opt_state: Any, step: int) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(path, f"step_{step}"),
            {"params": params, "opt_state": opt_state, "step": step},
            force=True,
        )


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_checkpoint(
    path: str, like: Any
) -> Optional[Tuple[Any, Any, int]]:
    """Restore the latest checkpoint; `like` is a pytree of the same
    structure (e.g. freshly-initialized state) used as the restore target.
    Returns (params, opt_state, step) or None when nothing is saved."""
    import orbax.checkpoint as ocp

    step = latest_step(path)
    if step is None:
        return None
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.join(path, f"step_{step}"),
            {"params": like[0], "opt_state": like[1], "step": step},
        )
    return restored["params"], restored["opt_state"], restored["step"]
