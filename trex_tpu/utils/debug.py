"""Numerical-debug switches (the engine's "sanitizer" layer).

The reference's closest analogue is ``jax.debug.print`` NaN diagnostics in
verbose loss mode (``tree.py:344-359``). Here the standard JAX machinery is
exposed as one switch: NaN/Inf checking aborts with a traceback pointing at
the producing op.
"""

from __future__ import annotations

import jax


def enable_nan_checks(enable: bool = True) -> None:
    """Globally enable jax NaN and Inf debugging (slow; for debugging runs)."""
    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)
