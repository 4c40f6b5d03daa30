"""Command-line drivers: ``python -m trex_tpu.cli <command>``.

Commands
--------
score       Exact Sankoff scoring of generated data, or of a real alignment
            (``--fasta`` + optional ``--tree``) with full IUPAC/gap support.
infer       File-based tree inference: FASTA in, searched tree (newick) out —
            distance/stepwise starting trees + SPR/NNI hill climbing.
search      Joint topology + sequence optimization with restarts.
asr         Gradient ASR on a fixed topology, accuracy vs exact Sankoff.
bench       Throughput benchmark (same metric as bench.py, more knobs).
nk-bench    The reference's accuracy benchmark: NK data, Sankoff vs gradient
            ASR across lambda values (``evals/benchmark.py:902-1048``).
simulate    Simulate an alignment down a (given or generated) tree under
            JC/GTR/empirical (+G/+I) models — the seq-gen equivalent.
treedist    Robinson-Foulds distance between two newick files.
consensus   Majority-rule consensus of a multi-newick file.
topotest    KH/SH/AU/BP/ELW topology tests of candidate trees on an
            alignment (optional CONSEL site-lnL export).
treeprune   Induced subtree + alignment rows for a taxa subset.

The reference has no CLI at all (SURVEY.md §1); flags here use a plain
argparse tree so the module stays dependency-free.
"""

from trex_tpu.cli.parser import build_parser, main

__all__ = ["build_parser", "main"]
