"""Optimizer factory (counterpart of ``evals/benchmark.py:41-72``)."""

from __future__ import annotations

import optax

_FACTORIES = {
    "adam": lambda lr: optax.adam(lr),
    "sgd": lambda lr: optax.sgd(lr, momentum=0.9),
    "rmsprop": lambda lr: optax.rmsprop(lr),
    "adamw": lambda lr: optax.adamw(lr, weight_decay=0.01),
}


def make_optimizer(
    name: str,
    learning_rate: float,
    *,
    clip_global_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    """Build an optax optimizer by name with optional global-norm clipping.

    Same names/hyperparameters as the reference factory: sgd carries momentum
    0.9, adamw weight decay 0.01, and clipping defaults to norm 1.0.
    """
    if name not in _FACTORIES:
        raise ValueError(f"Unknown optimizer {name!r}; choose from {sorted(_FACTORIES)}")
    base = _FACTORIES[name](learning_rate)
    if clip_global_norm is not None:
        return optax.chain(optax.clip_by_global_norm(clip_global_norm), base)
    return base
