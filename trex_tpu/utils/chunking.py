"""Memory-bounded mapping (counterpart of ``utils/memory.py:15-28``)."""

from __future__ import annotations

from typing import Callable

import jax


def chunked_map(fn: Callable, xs, batch_size: int | None = None):
    """Map ``fn`` over the leading axis in fixed-size chunks.

    ``jax.lax.map`` with ``batch_size`` — vectorizes within a chunk, loops
    across chunks, bounding peak memory at chunk granularity. Use for wide
    per-site computations that would not fit if fully vmapped.
    """
    return jax.lax.map(fn, xs, batch_size=batch_size)
