"""PHYLIP and NEXUS readers (io.formats)."""

import numpy as np
import pytest

from trex_tpu.io import (
    DNA,
    encode_alignment,
    encode_alignment_masks,
    load_newick,
    parse_nexus,
    parse_phylip,
    write_phylip,
)

PHYLIP_SEQ = """4 12
alpha  ACGTACGTACGT
beta   ACGTACGAACGT
gamma  ACGAACGAACGT
delta  ACGAACGAACTT
"""

PHYLIP_INTERLEAVED = """4 12
alpha  ACGTAC
beta   ACGTAC
gamma  ACGAAC
delta  ACGAAC
GTACGT
GAACGT
GAACGT
GAACTT
"""

NEXUS = """#NEXUS
[ exported by some tool ]
BEGIN DATA;
  DIMENSIONS NTAX=4 NCHAR=12;
  FORMAT DATATYPE=DNA MISSING=? GAP=-;
  MATRIX
    alpha  ACGTACGTACGT
    beta   ACGTACGAAC-T
    gamma  ACGAACGAACGT
    delta  ....ACGAACTT
  ;
END;
BEGIN TREES;
  TRANSLATE
    1 alpha,
    2 beta,
    3 gamma,
    4 delta;
  TREE best = [&U] ((1:0.1,2:0.2):0.05,(3:0.1,4:0.1):0.05);
END;
"""


def test_phylip_sequential_and_interleaved_agree():
    names1, rows1 = parse_phylip(PHYLIP_SEQ)
    names2, rows2 = parse_phylip(PHYLIP_INTERLEAVED)
    assert names1 == names2 == ["alpha", "beta", "gamma", "delta"]
    np.testing.assert_array_equal(rows1, rows2)
    assert rows1.shape == (4, 12)


def test_phylip_roundtrip_and_errors():
    names, rows = parse_phylip(PHYLIP_SEQ)
    again_names, again_rows = parse_phylip(write_phylip(names, rows))
    assert again_names == names
    np.testing.assert_array_equal(again_rows, rows)
    with pytest.raises(ValueError, match="header"):
        parse_phylip("garbage\nACGT\n")
    with pytest.raises(ValueError, match="lengths"):
        parse_phylip("2 8\na ACGT\nb ACGTACGT\n")


def test_nexus_matrix_match_chars_and_trees():
    names, rows, trees = parse_nexus(NEXUS)
    assert names == ["alpha", "beta", "gamma", "delta"]
    # '.' copies the first row.
    assert rows[3].tobytes().decode()[:4] == "ACGT"
    # Gap preserved as a raw character; masks encoding treats it as missing.
    masks = encode_alignment_masks(rows, DNA)
    assert masks[1, 10] == 0b1111  # the '-' cell
    ints = encode_alignment(rows, DNA)
    assert ints.shape == (4, 12)

    assert set(trees) == {"best"}
    topo, blens, tree_names = load_newick(trees["best"])
    assert sorted(tree_names) == sorted(names)
    np.testing.assert_allclose(sorted(blens[:4]), [0.1, 0.1, 0.1, 0.2])


def test_nexus_end_to_end_scoring():
    import jax.numpy as jnp

    from trex_tpu.io import align_leaf_order
    from trex_tpu.ops.fitch import fitch_score

    names, rows, trees = parse_nexus(NEXUS)
    masks = encode_alignment_masks(rows, DNA)
    topo, _, tree_names = load_newick(trees["best"])
    topo = align_leaf_order(topo, tree_names, names)
    score = float(
        fitch_score(topo, jnp.asarray(masks), sequences_are_masks=True)
    )
    assert score >= 0


def test_nexus_errors():
    with pytest.raises(ValueError, match="#NEXUS"):
        parse_nexus("BEGIN DATA; END;")
    with pytest.raises(ValueError, match="unterminated .comment."):
        parse_nexus("#NEXUS [unclosed")
    with pytest.raises(ValueError, match="MATRIX"):
        parse_nexus("#NEXUS\nBEGIN DATA;\nDIMENSIONS NTAX=1;\nEND;")
