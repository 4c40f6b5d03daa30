"""Lightweight checkpoint/resume for long searches (orbax-backed).

The reference keeps all optimization state inside ``fori_loop`` carries and
loses it at process exit (SURVEY.md §5). Here any pytree of
(params, opt_state, step, ...) round-trips through orbax; multi-host safe
(orbax coordinates the write across processes).
"""

from __future__ import annotations

import os
from typing import Any


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree checkpoint to ``path`` (a directory), overwriting."""
    path = os.path.abspath(path)
    _checkpointer().save(path, state, force=True)


def restore_checkpoint(path: str, like: Any | None = None) -> Any:
    """Restore a pytree checkpoint; ``like`` provides structure/sharding."""
    path = os.path.abspath(path)
    if like is None:
        return _checkpointer().restore(path)
    import orbax.checkpoint as ocp

    return _checkpointer().restore(path, item=like)


def latest_step_dir(root: str) -> str | None:
    """Find the highest-numbered ``step_*`` subdirectory under ``root``."""
    if not os.path.isdir(root):
        return None
    steps = [d for d in os.listdir(root) if d.startswith("step_")]
    if not steps:
        return None
    best = max(steps, key=lambda d: int(d.split("_")[1]))
    return os.path.join(root, best)
