"""Model-aware ML candidate ranking (GTR transition matrices in the search).

Oracles: the fused-kernel ranking with an explicit transition matrix equals
the lax likelihood with the same rates/freqs (CPU interpret parity comes
from the existing kernel tests; here we check the search-level wiring);
model-aware search recovers the true topology on strongly non-JC data and
reports a better likelihood than the JC-ranked search when they differ.
"""

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.models.simulate import simulate_alignment
from trex_tpu.ops.likelihood import tree_log_likelihood
from trex_tpu.search.ml import ml_hill_climb
from trex_tpu.search.ratchet import rf_distance_unrooted
from trex_tpu.topology import random_topologies

RATES = np.array(
    [
        [0.0, 1.0, 12.0, 1.0],
        [1.0, 0.0, 1.0, 12.0],
        [12.0, 1.0, 0.0, 1.0],
        [1.0, 12.0, 1.0, 0.0],
    ]
)
FREQS = np.array([0.35, 0.15, 0.35, 0.15])


def _single(key, n_leaves):
    return jax.tree_util.tree_map(
        lambda x: x[0], random_topologies(key, n_leaves, 1)
    )


def test_model_aware_climb_matches_lax_objective():
    """The climb's reported score equals the lax GTR likelihood at t0."""
    truth = _single(jax.random.key(0), 8)
    blens = np.full((truth.n_all,), 0.15)
    leaves = simulate_alignment(
        jax.random.key(1), truth, blens, n_sites=300,
        rates=RATES, freqs=FREQS,
    )
    rates = jnp.asarray(RATES, jnp.float32)
    freqs = jnp.asarray(FREQS, jnp.float32)
    result, lengths, losses = ml_hill_climb(
        truth, jnp.asarray(leaves), 4, max_rounds=0,
        neighborhood="nni", optimize_final_lengths=False,
        rates=rates, freqs=freqs,
    )
    expected = -float(
        tree_log_likelihood(
            truth, jnp.full((truth.n_all,), 0.1), jnp.asarray(leaves), 4,
            rates=rates, freqs=freqs,
        )
    )
    assert abs(result.score - expected) < 0.5


def test_model_aware_search_recovers_topology():
    truth = _single(jax.random.key(2), 10)
    blens = np.full((truth.n_all,), 0.25)
    leaves = simulate_alignment(
        jax.random.key(3), truth, blens, n_sites=800,
        rates=RATES, freqs=FREQS,
    )
    start = _single(jax.random.key(4), 10)
    result, lengths, _ = ml_hill_climb(
        start, jnp.asarray(leaves), 4, neighborhood="spr",
        rates=jnp.asarray(RATES, jnp.float32),
        freqs=jnp.asarray(FREQS, jnp.float32),
    )
    assert rf_distance_unrooted(result.topology, truth) == 0
    # Final Newton lengths are fitted under the model too.
    assert float(lengths[:-1].mean()) > 0.05


def test_spr_scan_accepts_model_smoke():
    # The analytic scan is model-aware (parity tested exhaustively in
    # tests/test_likelihood_scan.py); smoke the search-level plumbing.
    topo = _single(jax.random.key(5), 6)
    rng = np.random.default_rng(0)
    leaves = jnp.asarray(rng.integers(0, 4, size=(6, 30)).astype(np.int32))
    result, lengths, _ = ml_hill_climb(
        topo, leaves, 4, neighborhood="spr-scan", max_rounds=2,
        rates=jnp.asarray(RATES, jnp.float32),
        freqs=jnp.asarray(FREQS, jnp.float32),
    )
    assert np.isfinite(result.score)


def test_cli_model_rounds(capsys, tmp_path):
    import json

    from trex_tpu.cli import main
    from trex_tpu.io import DNA, write_fasta

    truth = _single(jax.random.key(6), 8)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(
        jax.random.key(7), truth, blens, n_sites=500,
        rates=RATES, freqs=FREQS,
    )
    path = tmp_path / "a.fasta"
    path.write_text(write_fasta([f"t{i}" for i in range(8)], leaves, DNA))
    main(["infer", "--fasta", str(path), "--criterion", "ml",
          "--start", "nj", "--model", "gtr", "--model-rounds", "2"])
    out = json.loads(capsys.readouterr().out)
    assert out.get("model_rounds", 0) >= 1
    # The fitted exchangeabilities reflect the strong transition bias.
    r = np.asarray(out["gtr_rates"])
    assert r[0][2] > 3 * r[0][1]  # A<->G >> A<->C


def test_model_aware_scan_climb_matches_enumerating():
    """spr-scan with GTR reaches the same optimum as the enumerating spr."""
    truth = _single(jax.random.key(8), 9)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(
        jax.random.key(9), truth, blens, n_sites=400,
        rates=RATES, freqs=FREQS,
    )
    start = _single(jax.random.key(10), 9)
    kwargs = dict(
        rates=jnp.asarray(RATES, jnp.float32),
        freqs=jnp.asarray(FREQS, jnp.float32),
        optimize_final_lengths=False,
    )
    scan, _, _ = ml_hill_climb(
        start, jnp.asarray(leaves), 4, neighborhood="spr-scan", **kwargs
    )
    enum, _, _ = ml_hill_climb(
        start, jnp.asarray(leaves), 4, neighborhood="spr", **kwargs
    )
    assert abs(scan.score - enum.score) < 0.5
    assert rf_distance_unrooted(scan.topology, truth) == 0


def test_ml_iterated_search_escapes_local_optimum():
    """Iterated perturbation+reclimb matches or beats the plain NNI climb."""
    from trex_tpu.io import native
    from trex_tpu.search.ml import ml_iterated_search

    if not native.available():
        import pytest

        pytest.skip("needs the native library")
    truth = _single(jax.random.key(20), 10)
    blens = np.full((truth.n_all,), 0.15)
    leaves = simulate_alignment(jax.random.key(21), truth, blens, n_sites=400)
    start = _single(jax.random.key(22), 10)
    plain, _, _ = ml_hill_climb(
        start, jnp.asarray(leaves), 4, neighborhood="nni",
        optimize_final_lengths=False,
    )
    iterated, lengths, losses = ml_iterated_search(
        jax.random.key(23), start, jnp.asarray(leaves), 4,
        n_iterations=5, neighborhood="nni",
    )
    assert iterated.score <= plain.score + 1e-6
    assert len(iterated.trace) >= 1
    assert lengths.shape == (truth.n_all,)


def test_cli_ml_ratchet(capsys, tmp_path):
    import json

    from trex_tpu.cli import main
    from trex_tpu.io import DNA, write_fasta

    truth = _single(jax.random.key(24), 8)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(jax.random.key(25), truth, blens, n_sites=300)
    path = tmp_path / "a.fasta"
    path.write_text(write_fasta([f"t{i}" for i in range(8)], leaves, DNA))
    main(["infer", "--fasta", str(path), "--criterion", "ml",
          "--start", "nj", "--ratchet", "3"])
    out = json.loads(capsys.readouterr().out)
    assert out["ml_iterations"] == 3
    assert "neg_log_likelihood" in out


def test_ml_iterated_search_resume(tmp_path):
    """A second run with the same progress_dir resumes from best.nwk."""
    from trex_tpu.io import native
    from trex_tpu.search.ml import ml_iterated_search

    if not native.available():
        import pytest

        pytest.skip("needs the native library")
    truth = _single(jax.random.key(30), 8)
    blens = np.full((truth.n_all,), 0.2)
    leaves = simulate_alignment(jax.random.key(31), truth, blens, n_sites=200)
    start = _single(jax.random.key(32), 8)
    pdir = str(tmp_path / "run")
    first, _, _ = ml_iterated_search(
        jax.random.key(33), start, jnp.asarray(leaves), 4,
        n_iterations=2, neighborhood="nni", progress_dir=pdir,
    )
    # Resume from a DIFFERENT (bad) start: the saved best must win out —
    # iteration 0 reclimbs from the saved tree, so the resumed score can
    # never be worse than the first run's.
    worse_start = _single(jax.random.key(34), 8)
    second, _, _ = ml_iterated_search(
        jax.random.key(35), worse_start, jnp.asarray(leaves), 4,
        n_iterations=0, neighborhood="nni", progress_dir=pdir,
    )
    assert second.score <= first.score + 1e-6
