"""File-based CLI workflows: ``infer`` and ``score --fasta/--tree``."""

import json

import pytest

FASTA = """>taxA
ACGTACGTACGTACGTACGT
>taxB
ACGTACGAACGTACGTACGW
>taxC
ACGAACGAACGTACRTACGT
>taxD
ACGAACGAACTTACGTACGT
>taxE
NNGAACGAACTTACGTAC-T
>taxF
ACGTACGTACGTTCGTACGT
"""


@pytest.fixture
def fasta_path(tmp_path):
    path = tmp_path / "aln.fasta"
    path.write_text(FASTA)
    return str(path)


@pytest.mark.parametrize("start", ["stepwise", "nj", "upgma", "random", "diff"])
def test_cli_infer_starts(capsys, tmp_path, fasta_path, start):
    from trex_tpu.cli import main

    out_tree = str(tmp_path / "out.nwk")
    main([
        "infer", "--fasta", fasta_path, "--start", start,
        "--neighborhood", "nni", "--output-tree", out_tree,
    ])
    out = json.loads(capsys.readouterr().out)
    # All starts reach the same optimum on this tiny instance.
    assert out["parsimony_score"] == 4.0
    assert out["n_taxa"] == 6 and out["n_sites"] == 20
    assert open(out_tree).read().strip() == out["tree"]


def test_cli_score_fasta_roundtrip(capsys, tmp_path, fasta_path):
    from trex_tpu.cli import main

    out_tree = str(tmp_path / "t.nwk")
    main(["infer", "--fasta", fasta_path, "--output-tree", out_tree,
          "--neighborhood", "nni"])
    infer_out = json.loads(capsys.readouterr().out)

    anc = str(tmp_path / "anc.fasta")
    main(["score", "--fasta", fasta_path, "--tree", out_tree,
          "--output-fasta", anc])
    score_out = json.loads(capsys.readouterr().out)
    assert score_out["parsimony_score"] == infer_out["parsimony_score"]
    text = open(anc).read()
    # 6 leaves + 5 reconstructed ancestors, ambiguity resolved to ACGT.
    assert text.count(">") == 11
    body = "".join(l for l in text.splitlines() if not l.startswith(">"))
    assert set(body) <= set("ACGT")


def test_cli_score_fasta_without_tree(capsys, fasta_path):
    from trex_tpu.cli import main

    main(["score", "--fasta", fasta_path])
    out = json.loads(capsys.readouterr().out)
    assert out["tree_source"] == "stepwise addition"
    assert out["parsimony_score"] == 4.0


def test_cli_infer_ml_with_branch_lengths(capsys, tmp_path, fasta_path):
    from trex_tpu.cli import main
    from trex_tpu.io import load_newick

    out_tree = str(tmp_path / "ml.nwk")
    main([
        "infer", "--fasta", fasta_path, "--criterion", "ml",
        "--neighborhood", "nni", "--rounds", "2", "--output-tree", out_tree,
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["criterion"] == "ml"
    assert out["neg_log_likelihood"] > 0
    assert out["mean_branch_length"] > 0
    # The emitted newick carries branch lengths and round-trips exactly.
    topo, blens, names = load_newick(open(out_tree).read())
    assert sorted(names) == ["taxA", "taxB", "taxC", "taxD", "taxE", "taxF"]
    assert (blens[:-1] > 0).all()


def test_cli_infer_ratchet_and_bootstrap(capsys, fasta_path):
    from trex_tpu.cli import main
    from trex_tpu.io import load_newick

    main([
        "infer", "--fasta", fasta_path, "--neighborhood", "nni",
        "--ratchet", "1", "--bootstrap", "5", "--rounds", "5",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["parsimony_score"] == 4.0  # ratchet never worse than climb
    assert out["ratchet_iterations"] == 1
    assert len(out["split_support"]) == 5  # one per ancestor
    assert all(0.0 <= s <= 1.0 for s in out["split_support"])
    # Support values ride the newick as internal labels and still parse.
    assert ")" in out["tree"]
    _, _, names = load_newick(out["tree"])
    assert len(names) == 6


def test_save_newick_support_labels():
    import numpy as np

    from trex_tpu.io import load_newick, save_newick
    from trex_tpu.topology import balanced_topology

    topo = balanced_topology(4)
    text = save_newick(
        topo, ["a", "b", "c", "d"],
        branch_lengths=np.asarray([1, 2, 3, 4, 0.5, 0.5, 0.0]),
        support=np.asarray([0.9, 0.85, 1.0]),
    )
    assert "0.9" in text and "0.85" in text
    assert not text.rstrip(";").endswith("1")  # root label omitted
    topo2, blens, names = load_newick(text)
    assert sorted(names) == ["a", "b", "c", "d"]
    by_name = dict(zip(names, blens[:4]))
    assert by_name["a"] == 1.0 and by_name["d"] == 4.0


def test_cli_infer_ml_bootstrap(capsys, fasta_path):
    from trex_tpu.cli import main

    main([
        "infer", "--alignment", fasta_path, "--criterion", "ml",
        "--neighborhood", "nni", "--rounds", "3", "--bootstrap", "4",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["bootstrap_replicates"] == 4
    assert len(out["split_support"]) == 5
    assert all(0.0 <= s <= 1.0 for s in out["split_support"])


def test_cli_score_ml_asr(capsys, tmp_path, fasta_path):
    from trex_tpu.cli import main

    anc = str(tmp_path / "ml_anc.fasta")
    main(["score", "--fasta", fasta_path, "--criterion", "ml",
          "--output-fasta", anc])
    out = json.loads(capsys.readouterr().out)
    assert out["log_likelihood"] < 0
    assert 0 < out["mean_ancestor_posterior"] <= 1
    assert out["mean_branch_length"] > 0
    text = open(anc).read()
    assert text.count(">") == 11  # 6 leaves + 5 ML ancestors


def test_cli_infer_ml_gtr_model(capsys, fasta_path):
    from trex_tpu.cli import main

    main([
        "infer", "--fasta", fasta_path, "--criterion", "ml",
        "--model", "gtr+g", "--neighborhood", "nni", "--rounds", "1",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["model"] == "gtr+g"
    assert out["gamma_shape"] > 0
    freqs = out["base_frequencies"]
    assert abs(sum(freqs) - 1.0) < 1e-3
    rates = out["gtr_rates"]
    assert rates[2][3] == 1.0  # pinned exchangeability


def test_save_newick_lengths_roundtrip():
    import numpy as np

    from trex_tpu.io import load_newick, save_newick
    from trex_tpu.topology import balanced_topology

    topo = balanced_topology(8)
    rng = np.random.default_rng(0)
    blens = rng.uniform(0.01, 2.0, size=topo.n_all)
    blens[-1] = 0.0
    names = [f"t{i}" for i in range(8)]
    text = save_newick(topo, names, blens)
    topo2, blens2, names2 = load_newick(text)
    # Same unrooted structure and, leaf-name-matched, the same lengths.
    by_name = dict(zip(names2, blens2[:8]))
    for i, n in enumerate(names):
        np.testing.assert_allclose(by_name[n], blens[i], rtol=1e-6)
    assert sorted(np.asarray(topo2.children).ravel().tolist()) == sorted(
        np.asarray(topo.children).ravel().tolist()
    )


def test_cli_phylip_and_nexus_inputs(capsys, tmp_path, fasta_path):
    """All three alignment formats give the same inference result."""
    from trex_tpu.cli import main

    phy = tmp_path / "aln.phy"
    body = [ln for ln in FASTA.splitlines()]
    taxa = [
        (body[i][1:], body[i + 1]) for i in range(0, len(body), 2)
    ]
    phy.write_text(
        f"{len(taxa)} {len(taxa[0][1])}\n"
        + "\n".join(f"{n}  {s}" for n, s in taxa)
        + "\n"
    )
    nex = tmp_path / "aln.nex"
    nex.write_text(
        "#NEXUS\nBEGIN DATA;\nDIMENSIONS NTAX=6 NCHAR=20;\nMATRIX\n"
        + "\n".join(f"{n}  {s}" for n, s in taxa)
        + "\n;\nEND;\n"
    )
    results = []
    for path in (fasta_path, str(phy), str(nex)):
        main(["infer", "--fasta", path, "--neighborhood", "nni"])
        results.append(json.loads(capsys.readouterr().out))
    assert {r["parsimony_score"] for r in results} == {4.0}
    assert {r["tree"] for r in results} == {results[0]["tree"]}


def test_cli_errors(tmp_path, fasta_path):
    from trex_tpu.cli import main

    bad_tree = tmp_path / "bad.nwk"
    bad_tree.write_text("((taxA,taxB),(taxC,(taxD,(taxE,taxZ))));\n")
    with pytest.raises(SystemExit, match="taxa differ"):
        main(["score", "--fasta", fasta_path, "--tree", str(bad_tree)])
    with pytest.raises(SystemExit, match="power-of-two"):
        main(["infer", "--fasta", fasta_path, "--start", "balanced"])


def test_cli_dnds(capsys, tmp_path):
    """GY94 fit on a tiny in-frame coding alignment (ambiguity -> missing)."""
    from trex_tpu.cli import main

    coding = """>s1
ATGAAAGGGTGCCTT
>s2
ATGAAGGGGTGTCTC
>s3
ATGAACGGATGCCTG
>s4
ATGANCGGATGCC-G
"""
    path = tmp_path / "coding.fasta"
    path.write_text(coding)
    out_tree = str(tmp_path / "dnds.nwk")
    main([
        "dnds", "--alignment", str(path), "--iterations", "30",
        "--freqs", "f1x4", "--output-tree", out_tree,
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["n_taxa"] == 4 and out["n_codons"] == 5
    assert out["missing_codons"] == 2  # ANC and C-G
    assert out["kappa"] > 0 and out["omega"] > 0
    assert out["log_likelihood"] < 0
    newick = open(out_tree).read()
    for name in ("s1", "s2", "s3", "s4"):
        assert name in newick


def test_cli_dnds_stop_error(tmp_path):
    from trex_tpu.cli import main

    path = tmp_path / "stops.fasta"
    path.write_text(">a\nATGTAA\n>b\nATGTAC\n>c\nATGTAT\n>d\nATGCAT\n")
    with pytest.raises(ValueError, match="stop"):
        main(["dnds", "--alignment", str(path), "--iterations", "5"])


def test_cli_infer_ml_alrt(capsys, tmp_path, fasta_path):
    from trex_tpu.cli import main

    out_tree = str(tmp_path / "ml_alrt.nwk")
    main([
        "infer", "--fasta", fasta_path, "--criterion", "ml",
        "--neighborhood", "nni", "--rounds", "3", "--alrt", "100",
        "--output-tree", out_tree,
    ])
    out = json.loads(capsys.readouterr().out)
    assert len(out["sh_alrt_support"]) == 5  # n_ancestors for 6 taxa
    assert all(0.0 <= s <= 1.0 for s in out["sh_alrt_support"])
    assert all(0.0 <= s <= 1.0 for s in out["rell_support"])
    # Supports ride the newick as internal node labels.
    from trex_tpu.io import load_newick
    text = open(out_tree).read()
    topo, lengths, names2 = load_newick(text)
    assert sorted(names2) == ["taxA", "taxB", "taxC", "taxD", "taxE", "taxF"]


def test_cli_modeltest(capsys, tmp_path, fasta_path):
    from trex_tpu.cli import main

    main([
        "modeltest", "--alignment", fasta_path,
        "--models", "jc,gtr", "--criterion", "aic", "--iterations", "60",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["best"] in ("jc", "gtr")
    assert len(out["table"]) == 2
    assert out["table"][0]["aic"] <= out["table"][1]["aic"]
    for row in out["table"]:
        assert row["log_likelihood"] < 0 and row["n_parameters"] > 0


def test_cli_partition(capsys, tmp_path, fasta_path):
    from trex_tpu.cli import main

    part = tmp_path / "parts.txt"
    part.write_text("DNA, left = 1-10\nDNA, right = 11-20\n")
    main([
        "partition", "--alignment", fasta_path, "--partitions", str(part),
        "--model", "jc", "--iterations", "40",
    ])
    out = json.loads(capsys.readouterr().out)
    assert [p["name"] for p in out["partitions"]] == ["left", "right"]
    assert out["partitions"][0]["rate_multiplier"] == 1.0
    assert out["partitions"][1]["rate_multiplier"] > 0
    assert out["log_likelihood"] == pytest.approx(
        sum(p["log_likelihood"] for p in out["partitions"]), rel=1e-4
    )


def test_cli_score_ml_with_model(capsys, tmp_path, fasta_path):
    """score --criterion ml --model gtr+g fits the model before the ASR."""
    import numpy as np

    from trex_tpu.cli import main

    anc = str(tmp_path / "anc_ml.fasta")
    main(["score", "--fasta", fasta_path, "--criterion", "ml",
          "--model", "gtr+g", "--output-fasta", anc])
    out = json.loads(capsys.readouterr().out)
    assert out["model"] == "gtr+g"
    assert out["log_likelihood"] < 0
    assert 0 < out["mean_ancestor_posterior"] <= 1
    # JC fit of the same data cannot beat the fitted GTR+G likelihood.
    main(["score", "--fasta", fasta_path, "--criterion", "ml"])
    out_jc = json.loads(capsys.readouterr().out)
    assert out["log_likelihood"] >= out_jc["log_likelihood"] - 0.5
    assert open(anc).read().count(">") == 11


def test_cli_score_joint_asr(capsys, tmp_path, fasta_path):
    from trex_tpu.cli import main

    anc = str(tmp_path / "anc_joint.fasta")
    main(["score", "--fasta", fasta_path, "--criterion", "ml",
          "--asr", "joint", "--output-fasta", anc])
    out = json.loads(capsys.readouterr().out)
    # The single best assignment never beats the marginalized likelihood.
    assert out["joint_log_probability"] <= out["log_likelihood"] + 1e-3
    assert open(anc).read().count(">") == 11


def test_cli_stats(capsys, tmp_path):
    from trex_tpu.cli import main

    # 4 taxa x 8 sites, hand-designed site classes:
    # col0 constant A; col1 informative (2xC, 2xG); col2 variable
    # singleton (A,A,A,T); col3 constant with one N; col4 one real G
    # among gaps/N (-> constant); col5 informative; col6 constant;
    # col7 variable singleton (A,C,A,A).
    path = tmp_path / "s.fasta"
    path.write_text(
        ">a\nACAG-CTA\n"
        ">b\nACAG-CTC\n"
        ">c\nAGANGGTA\n"
        ">d\nAGTGNGTA\n"
    )
    main(["stats", "--fasta", str(path)])
    out = json.loads(capsys.readouterr().out)
    assert out["n_taxa"] == 4 and out["n_sites"] == 8
    assert out["constant_sites"] == 4      # cols 0, 3, 4, 6
    assert out["variable_sites"] == 4      # cols 1, 2, 5, 7
    assert out["parsimony_informative_sites"] == 2  # cols 1, 5
    assert out["missing_fraction"] > 0
    assert abs(sum(out["composition"].values()) - 1.0) < 0.01


def test_cli_treedraw(capsys, tmp_path):
    from trex_tpu.cli import main

    tree = tmp_path / "t.nwk"
    tree.write_text("((alpha:0.1,beta:0.2):0.05,(gamma:0.3,delta:0.4):0.15);\n")
    main(["treedraw", "--tree", str(tree)])
    out = capsys.readouterr().out
    for name in ("alpha", "beta", "gamma", "delta"):
        assert name in out
    assert ":0.1" in out  # branch lengths annotated


def test_cli_mesh_defaults_to_auto_on_multidevice(capsys, fasta_path):
    """On the 8-virtual-device test backend, no --mesh flag must mean
    'auto' (the sharded drivers), --mesh 1,1 must opt out, and both must
    produce the identical tree and score (the mesh paths are bit-identical
    by design — tests/test_sharding.py)."""
    import jax

    from trex_tpu.cli import main
    from trex_tpu.cli._common import _make_cli_mesh
    from trex_tpu.parallel.mesh import TREE_AXIS

    assert len(jax.devices()) == 8
    mesh = _make_cli_mesh(None)
    assert mesh is not None  # implicit auto
    assert _make_cli_mesh("1,1") is None  # explicit opt-out
    # divides-aware auto: a 3-chain MCMC batch picks a compatible tree axis.
    assert _make_cli_mesh(None, divides=3).shape[TREE_AXIS] == 1
    assert _make_cli_mesh(None, divides=8).shape[TREE_AXIS] == 8

    outs = {}
    for flag in ([], ["--mesh", "1,1"]):
        main([
            "infer", "--fasta", fasta_path, "--start", "stepwise",
            "--neighborhood", "spr-scan", *flag,
        ])
        outs[bool(flag)] = json.loads(capsys.readouterr().out)
    assert outs[False]["parsimony_score"] == outs[True]["parsimony_score"]
    assert outs[False]["tree"] == outs[True]["tree"]


def test_cli_mcmc_default_mesh_indivisible_chains(capsys, fasta_path):
    """The implicit mesh default must not trip mcmc_sample's divisibility
    check for chain counts the balanced heuristic cannot shard (3 chains
    on 8 devices -> tree axis 1)."""
    from trex_tpu.cli import main

    main([
        "mcmc", "--fasta", fasta_path, "--generations", "8",
        "--chains", "3", "--sample-every", "2", "--burnin", "0.0",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["n_samples"] > 0
