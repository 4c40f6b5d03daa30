"""Utility layer: chunked map, timers, checkpointing, metrics, CLI smoke."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.utils.chunking import chunked_map
from trex_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from trex_tpu.utils.metrics import MetricsLogger
from trex_tpu.utils.profiling import Timer, timed


def test_chunked_map_matches_vmap():
    xs = jnp.arange(24.0).reshape(12, 2)
    fn = lambda x: jnp.sum(x ** 2)
    np.testing.assert_allclose(
        np.asarray(chunked_map(fn, xs, batch_size=4)),
        np.asarray(jax.vmap(fn)(xs)),
    )


def test_timed_returns_mean_and_result():
    f = jax.jit(lambda x: x * 2)
    mean_s, out = timed(f, jnp.ones(8), warmup=1, reps=3)
    assert mean_s > 0
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(8))


def test_timer_accumulates():
    t = Timer()
    x = jnp.ones(4)
    with t.time(x):
        _ = x + 1
    assert t.count == 1 and t.total >= 0


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7),
    }
    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(state["params"]["w"])
    )
    assert int(restored["step"]) == 7


def test_metrics_logger(tmp_path):
    path = os.path.join(tmp_path, "metrics.jsonl")
    with MetricsLogger(path, echo=False) as log:
        log.log(0, loss=jnp.asarray(1.5), note="a")
        log.log(1, loss=0.5)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5 and lines[0]["note"] == "a"
    assert lines[1]["step"] == 1


def test_cli_score_smoke(capsys):
    from trex_tpu.cli import main

    main(["score", "--leaves", "4", "--sites", "16", "--mutations", "2"])
    out = json.loads(capsys.readouterr().out)
    assert "parsimony_score" in out and out["parsimony_score"] >= 0


def test_cli_bench_smoke(capsys):
    from trex_tpu.cli import main

    main(["bench", "--leaves", "8", "--sites", "32", "--batch", "8", "--reps", "2"])
    out = json.loads(capsys.readouterr().out)
    assert out["value"] > 0


def test_enable_nan_checks_toggles_config():
    from trex_tpu.utils.debug import enable_nan_checks

    enable_nan_checks(True)
    assert jax.config.jax_debug_nans and jax.config.jax_debug_infs
    enable_nan_checks(False)
    assert not jax.config.jax_debug_nans and not jax.config.jax_debug_infs


def test_annotations_module_imports():
    from trex_tpu import annotations

    assert annotations.DPTable is not None
    assert annotations.ChildIndexPairs is not None


def test_initialize_distributed_single_host_noop():
    from trex_tpu.parallel.distributed import initialize_distributed

    # No coordinator configured and no pod env: returns False, raises nothing.
    assert initialize_distributed() in (False, True)


def test_latest_step_dir(tmp_path):
    from trex_tpu.utils.checkpoint import latest_step_dir

    assert latest_step_dir(str(tmp_path / "missing")) is None
    (tmp_path / "step_10").mkdir()
    (tmp_path / "step_2").mkdir()
    assert latest_step_dir(str(tmp_path)).endswith("step_10")


def test_cli_nk_bench_smoke(capsys):
    from trex_tpu.cli import main

    main([
        "nk-bench", "--leaves", "4", "--sites", "10", "--k-values", "1",
        "--lambdas", "0.0", "0.5", "--iterations", "50",
    ])
    out = json.loads(capsys.readouterr().out)
    assert "K=1" in out and "sankoff" in out["K=1"]


def test_top_level_exports():
    import trex_tpu

    for name in trex_tpu.__all__:
        assert getattr(trex_tpu, name) is not None


def test_auto_prune_chunk_guard():
    """The scan-memory guard engages exactly at the budget boundary."""
    from trex_tpu.utils.chunking import auto_prune_chunk

    # Fits: 10 prunes x 1 MB << 2 GB default budget.
    assert auto_prune_chunk(10, 1 << 20) is None
    # Exceeds: chunk bounds the working set to <= budget.
    chunk = auto_prune_chunk(4095, 4096 * 4096 * 8)
    assert chunk is not None and 1 <= chunk
    assert chunk * 4096 * 4096 * 8 <= 2 << 30
    # The 2048-taxa x 4096-sites chip probe config (scale_probe.py).
    assert auto_prune_chunk(4094, 4095 * 4096 * 8) == (2 << 30) // (4095 * 4096 * 8)
    # Degenerate: per-prune bigger than budget still makes progress.
    assert auto_prune_chunk(8, (2 << 30) + 1) == 1
    # Custom budget: fits exactly -> no chunking; one byte less -> chunks.
    assert auto_prune_chunk(100, 10, budget_bytes=1000) is None
    assert auto_prune_chunk(100, 10, budget_bytes=999) == 99
