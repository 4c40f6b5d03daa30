"""Substitution-model selection by information criteria (AIC / AICc / BIC).

ModelFinder/jModelTest-style comparison (the reference has no model machinery
at all): fit each candidate model on a fixed topology with
``ops.likelihood.optimize_model`` and rank by the requested criterion. All
fits are independent jitted programs; the expensive ones share the same
pruning recursion the rest of the engine uses.

Parameter counting follows the standard unrooted-tree convention:
2n-3 branch lengths (the engine's rooted parameterization has one redundant
root-adjacent length under reversible models), plus per-model:

- jc: 0
- gtr: Q(Q-1)/2 - 1 exchangeabilities + Q-1 frequencies
- empirical (fixed matrix): 0 (Q-1 if frequencies are fit, +F style)
- +g: 1 (Gamma shape); +i: 1 (invariant fraction)
- +rK: 2K-2 (K rates + K weights - two normalization constraints)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.ops.likelihood import optimize_model
from trex_tpu.topology import Topology


@dataclass
class ModelFit:
    model: str
    log_likelihood: float
    n_parameters: int
    aic: float
    aicc: float
    bic: float
    params: dict


def count_parameters(model: str, n_states: int, n_leaves: int,
                     freqs_fitted: bool = False) -> int:
    """Free-parameter count for a model string (see module docstring)."""
    m = re.fullmatch(
        r"(jc|k80|hky|f81|tn93|gtr|empirical)(?:(\+g)?(\+i)?|(\+r([2-8])))?",
        model,
    )
    if not m:
        raise ValueError(f"unknown model {model!r}")
    k = 2 * n_leaves - 3  # unrooted branch lengths
    q = n_states
    base = m.group(1)
    if base == "gtr":
        k += q * (q - 1) // 2 - 1 + (q - 1)
    elif base == "empirical" and freqs_fitted:
        k += q - 1
    elif base == "k80":
        k += 1  # kappa
    elif base == "hky":
        k += 1 + (q - 1)  # kappa + frequencies
    elif base == "f81":
        k += q - 1  # frequencies
    elif base == "tn93":
        k += 2 + (q - 1)  # two transition rates + frequencies
    if m.group(2):
        k += 1
    if m.group(3):
        k += 1
    if m.group(5):
        k += 2 * int(m.group(5)) - 2
    return k


def compare_models(
    topology: Topology,
    leaf_sequences: jax.Array,
    n_states: int,
    *,
    models: tuple[str, ...] = ("jc", "jc+g", "gtr", "gtr+g", "gtr+g+i",
                               "gtr+r3"),
    criterion: str = "bic",
    site_weights: jax.Array | None = None,
    sequences_are_masks: bool = False,
    n_iterations: int = 500,
    learning_rate: float = 0.05,
    fixed_rates: jax.Array | None = None,
    fixed_freqs: jax.Array | None = None,
) -> list[ModelFit]:
    """Fit every candidate model on the fixed topology; return fits sorted
    best-first by ``criterion`` ("aic" / "aicc" / "bic").

    ``site_weights`` (compressed patterns) are exact: the sample size for
    AICc/BIC is the total site count ``sum(weights)``.
    """
    if criterion not in ("aic", "aicc", "bic"):
        raise ValueError(f"unknown criterion {criterion!r}")
    n_sites = (
        float(jnp.sum(jnp.asarray(site_weights)))
        if site_weights is not None
        else float(leaf_sequences.shape[-1])
    )
    n_leaves = topology.n_leaves
    fits: list[ModelFit] = []
    for model in models:
        params, losses = optimize_model(
            topology, leaf_sequences, n_states,
            model=model, n_iterations=n_iterations,
            learning_rate=learning_rate,
            sequences_are_masks=sequences_are_masks,
            site_weights=site_weights,
            fixed_rates=fixed_rates, fixed_freqs=fixed_freqs,
        )
        lnl = -float(losses[-1])
        k = count_parameters(
            model, n_states, n_leaves,
            freqs_fitted=model.startswith("empirical") and fixed_freqs is None,
        )
        aic = 2.0 * k - 2.0 * lnl
        denom = n_sites - k - 1.0
        aicc = aic + (2.0 * k * (k + 1.0) / denom if denom > 0 else np.inf)
        bic = k * np.log(n_sites) - 2.0 * lnl
        fits.append(
            ModelFit(
                model=model, log_likelihood=lnl, n_parameters=k,
                aic=aic, aicc=aicc, bic=bic,
                params={
                    key: np.asarray(value) for key, value in params.items()
                },
            )
        )
    return sorted(fits, key=lambda f: getattr(f, criterion))
