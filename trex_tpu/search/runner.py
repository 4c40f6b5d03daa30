"""Long-running search driver: segmented, checkpointed, resumable.

The reference keeps all optimization state inside a single ``fori_loop`` and
loses it on crash (SURVEY.md §5). Here the annealed joint search runs in
segments of ``checkpoint_every`` steps — each segment one jitted scan — with
(params, opt_state, step) checkpointed between segments and JSON-lines
metrics per segment. Resuming from the latest checkpoint continues the exact
schedule: temperatures derive from global step indices and per-step PRNG
keys from ``fold_in(base_key, step)``, so an interrupted run is bit-identical
to an uninterrupted one.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import optax

from trex_tpu.ops.costs import surrogate_cost
from trex_tpu.ops.relax import binary_tree_penalty, soft_sequences, soft_topology
from trex_tpu.search.joint import JointConfig, init_params
from trex_tpu.search.optimizers import make_optimizer
from trex_tpu.utils.checkpoint import latest_step_dir, restore_checkpoint, save_checkpoint
from trex_tpu.utils.metrics import MetricsLogger


@dataclasses.dataclass(frozen=True)
class RunnerConfig:
    workdir: str
    n_iterations: int = 10000
    checkpoint_every: int = 1000
    seed: int = 0
    joint: JointConfig = JointConfig()


def _segment_step_fn(cfg: JointConfig, optimizer, n_leaves: int, total_steps: int):
    """Jitted segment runner: scans [start, start+n) global steps."""

    def loss_fn(p, leaf_tensor, temperature, step_key):
        seqs = soft_sequences(p["ancestors"], leaf_tensor, n_leaves, temperature)
        tree = soft_topology(step_key, p["tree_params"])
        return surrogate_cost(seqs, tree) + temperature * binary_tree_penalty(
            tree, cfg.constraint_scale
        )

    def segment(params, opt_state, leaf_tensor, base_key, start, n_steps):
        steps = start + jnp.arange(n_steps)
        temps = jnp.maximum(
            cfg.temp_end,
            cfg.temp_start * (1.0 - steps.astype(jnp.float32) / total_steps),
        )
        keys = jax.vmap(lambda s: jax.random.fold_in(base_key, s))(steps)

        def body(carry, inputs):
            p, s = carry
            temperature, step_key = inputs
            loss, grads = jax.value_and_grad(loss_fn)(
                p, leaf_tensor, temperature, step_key
            )
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (temps, keys)
        )
        return params, opt_state, losses

    return jax.jit(segment, static_argnames=("n_steps",))


def run_search(
    cfg: RunnerConfig,
    leaf_tensor: jax.Array,
    resume: bool = True,
    max_segments: int | None = None,
) -> dict[str, jax.Array]:
    """Run (or resume) a checkpointed joint search; returns final params.

    ``max_segments`` bounds how many checkpoint segments this invocation
    executes (None = run to completion) — the resume path picks up where a
    bounded/interrupted invocation stopped.
    """
    n_all = leaf_tensor.shape[0]
    n_leaves = (n_all + 1) // 2
    length, n_states = leaf_tensor.shape[1], leaf_tensor.shape[2]

    base_key = jax.random.PRNGKey(cfg.seed)
    init_key, _ = jax.random.split(base_key)
    optimizer = make_optimizer(
        cfg.joint.optimizer,
        cfg.joint.learning_rate,
        clip_global_norm=cfg.joint.clip_global_norm,
    )

    params = init_params(init_key, n_leaves, length, n_states)
    opt_state = optimizer.init(params)
    step = 0

    ckpt_root = os.path.join(cfg.workdir, "checkpoints")
    if resume:
        latest = latest_step_dir(ckpt_root)
        if latest is not None:
            restored = restore_checkpoint(
                latest, like={"params": params, "opt_state": opt_state, "step": 0}
            )
            params = restored["params"]
            opt_state = restored["opt_state"]
            step = int(restored["step"])

    segment = _segment_step_fn(cfg.joint, optimizer, n_leaves, cfg.n_iterations)
    metrics_path = os.path.join(cfg.workdir, "metrics.jsonl")
    segments_done = 0
    with MetricsLogger(metrics_path, echo=False) as log:
        while step < cfg.n_iterations and (
            max_segments is None or segments_done < max_segments
        ):
            n_steps = min(cfg.checkpoint_every, cfg.n_iterations - step)
            params, opt_state, losses = segment(
                params, opt_state, leaf_tensor, base_key, step, n_steps
            )
            step += n_steps
            log.log(step, loss=float(losses[-1]), segment_mean=float(losses.mean()))
            save_checkpoint(
                os.path.join(ckpt_root, f"step_{step}"),
                {"params": params, "opt_state": opt_state, "step": step},
            )
            segments_done += 1
    return params
