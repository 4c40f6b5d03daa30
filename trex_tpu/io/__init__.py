"""Data I/O: alignments (FASTA) and trees (Newick) <-> engine types.

The reference has no file I/O at all (all data is generated in-process,
SURVEY.md §1); a production engine needs to ingest real alignments and tree
hypotheses. Parsing and search-move generation are native C++
(``native/trex_native.cpp``) via ctypes, with pure-Python fallbacks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from trex_tpu.io import native
from trex_tpu.io.formats import (
    encode_alignment,
    encode_alignment_masks,
    parse_nexus,
    parse_paml_rates,
    parse_partitions,
    parse_phylip,
    write_phylip,
)
from trex_tpu.io.fallback import (
    py_nni_neighbors,
    py_parse_newick,
    py_sample_topologies,
    py_spr_move,
    py_spr_neighborhood,
    py_tbr_move,
    py_tbr_neighborhood,
    py_write_newick,
)
from trex_tpu.topology import Topology

# Alphabets: index 0.. for states; unknown characters map to state 0.
DNA = "ACGT"
PROTEIN = "ARNDCQEGHILKMFPSTWYV"

# IUPAC nucleotide ambiguity codes -> state-set bitmasks over DNA (A=1, C=2,
# G=4, T=8). Gaps and '?' are treated as fully missing (any state), the
# standard parsimony/likelihood convention.
IUPAC_DNA_MASKS = {
    "A": 0b0001, "C": 0b0010, "G": 0b0100, "T": 0b1000, "U": 0b1000,
    "R": 0b0101, "Y": 0b1010, "S": 0b0110, "W": 0b1001,
    "K": 0b1100, "M": 0b0011,
    "B": 0b1110, "D": 0b1101, "H": 0b1011, "V": 0b0111,
    "N": 0b1111, "X": 0b1111, "-": 0b1111, "?": 0b1111, ".": 0b1111,
}


def _preprocess_newick(text: str) -> tuple[str, dict[str, str]]:
    """Strip ``[...]`` comments and lift quoted labels to placeholder tokens.

    Real-world newick (BEAST/MrBayes/TreeAnnotator output, NEXUS extracts)
    carries bracket comments and single-quoted labels with arbitrary
    characters (``''`` escapes a quote). The core parsers handle neither;
    this pre-pass removes comments and substitutes each quoted label with a
    parser-safe token, returning the token -> original-label map.
    """
    out: list[str] = []
    quoted: dict[str, str] = {}
    i, counter = 0, 0
    while i < len(text):
        c = text[i]
        if c == "[":
            end = text.find("]", i)
            if end < 0:
                raise ValueError("unterminated [comment] in newick input")
            i = end + 1
        elif c == "'":
            buf: list[str] = []
            j = i + 1
            while j < len(text):
                if text[j] == "'" and j + 1 < len(text) and text[j + 1] == "'":
                    buf.append("'")
                    j += 2
                elif text[j] == "'":
                    break
                else:
                    buf.append(text[j])
                    j += 1
            else:
                raise ValueError("unterminated quoted label in newick input")
            token = f"__q{counter}__"
            counter += 1
            quoted[token] = "".join(buf)
            out.append(token)
            i = j + 1
        else:
            out.append(c)
            i += 1
    return "".join(out), quoted


def load_newick(text: str) -> tuple[Topology, np.ndarray, list[str]]:
    """Parse newick into (Topology, branch_lengths by child node, leaf names).

    Tolerates the common real-world extensions: ``[...]`` comments,
    single-quoted labels (``''`` escape), internal-node/support labels, and
    missing branch lengths.
    """
    text, quoted = _preprocess_newick(text)
    if native.available():
        children, parents, blens, names = native.parse_newick(text)
    else:
        children, parents, blens, names = py_parse_newick(text)
    if quoted:
        names = [quoted.get(n, n) for n in names]
    topo = Topology(children=jnp.asarray(children), parents=jnp.asarray(parents))
    return topo, blens, names


_NEEDS_QUOTING = set(" ()[]{}:;,'\"")


def _quote_names(names: list[str] | None) -> list[str] | None:
    """Single-quote labels containing newick metacharacters ('' escape)."""
    if names is None:
        return None
    out = []
    for n in names:
        if any(ch in _NEEDS_QUOTING for ch in n):
            out.append("'" + n.replace("'", "''") + "'")
        else:
            out.append(n)
    return out


def save_newick(
    topology: Topology,
    leaf_names: list[str] | None = None,
    branch_lengths=None,
    support=None,
) -> str:
    """Serialize a topology to newick, optionally with lengths and support.

    ``branch_lengths``: (n_all,) lengths indexed by child node (the same
    convention ``load_newick`` returns); the root entry is ignored.
    ``support``: (n_ancestors,) values indexed like ``topology.children``
    (e.g. from ``search.bootstrap.split_support``), written as internal
    node labels in the standard ``(a,b)0.95:length`` position (the root
    label is omitted). Entries may be numbers (formatted ``%.4g``) or
    ready-made strings (e.g. ``"80/63.4"`` concordance labels). Labels
    with newick metacharacters are single-quoted, so any name round-trips
    through ``load_newick`` exactly.
    """
    children = np.asarray(topology.children)
    leaf_names = _quote_names(leaf_names)
    if branch_lengths is not None or support is not None:
        return _write_newick_annotated(
            children,
            leaf_names,
            None
            if branch_lengths is None
            else np.asarray(branch_lengths, dtype=np.float64),
            # Keep string labels as-is; coerce numerics to float.
            support
            if support is not None
            and any(isinstance(v, str) for v in support)
            else (
                None if support is None
                else np.asarray(support, dtype=np.float64)
            ),
        )
    if native.available():
        return native.write_newick(children, leaf_names)
    return py_write_newick(children, leaf_names)


def _write_newick_annotated(
    children: np.ndarray,
    leaf_names: list[str] | None,
    blens: np.ndarray | None,
    support: np.ndarray | None,
) -> str:
    n_leaves = children.shape[0] + 1
    names = leaf_names or [f"L{i}" for i in range(n_leaves)]
    repr_ = list(names) + [""] * (n_leaves - 1)
    for a in range(n_leaves - 1):
        c0, c1 = int(children[a, 0]), int(children[a, 1])
        left, right = repr_[c0], repr_[c1]
        if blens is not None:
            left += f":{blens[c0]:.8g}"
            right += f":{blens[c1]:.8g}"
        label = "" if support is None else _format_label(support[a])
        repr_[n_leaves + a] = f"({left},{right}){label}"
    # Strip the root's label (it annotates no split).
    out = repr_[2 * n_leaves - 2]
    if support is not None:
        root_label = _format_label(support[n_leaves - 2])
        if root_label:
            out = out[: len(out) - len(root_label)]
    return out + ";"


def _format_label(value) -> str:
    """Internal-node label: strings pass through, numbers get ``%.4g``."""
    if isinstance(value, str):
        return value
    return f"{value:.4g}"


def _split_fasta(text: str) -> tuple[list[str], np.ndarray]:
    """FASTA text -> (names, (n_seqs, L) uint8 raw character matrix)."""
    names: list[str] = []
    chunks: list[str] = []
    current: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            if names:
                chunks.append("".join(current))
                current = []
            names.append(line[1:].split()[0] if len(line) > 1 else "")
        else:
            current.append(line)
    if names:
        chunks.append("".join(current))
    if not names:
        raise ValueError("no sequences in FASTA input")
    lengths = {len(c) for c in chunks}
    if len(lengths) != 1:
        raise ValueError(f"unaligned sequences (lengths {sorted(lengths)})")
    data = np.frombuffer(
        "".join(chunks).encode("ascii"), dtype=np.uint8
    ).reshape(len(names), -1)
    return names, data


def parse_fasta(text: str, alphabet: str = DNA) -> tuple[list[str], np.ndarray]:
    """Parse FASTA text into (names, (n_seqs, L) int8 state matrix).

    Unknown characters (gaps, ambiguity codes) map to state 0; use
    ``parse_fasta_masks`` to preserve them as state-set bitmasks.
    """
    names, data = _split_fasta(text)
    lookup = np.zeros(256, dtype=np.int8)
    for i, ch in enumerate(alphabet):
        lookup[ord(ch)] = i
        lookup[ord(ch.lower())] = i
    return names, lookup[data]


def parse_fasta_masks(
    text: str, alphabet: str = DNA
) -> tuple[list[str], np.ndarray]:
    """Parse FASTA into (names, (n_seqs, L) int32 state-set bitmasks).

    The ambiguity-preserving loader: IUPAC nucleotide codes, gaps, ``?`` and
    ``N``/``X`` become multi-bit masks (for DNA via ``IUPAC_DNA_MASKS``; for
    other alphabets only gap/missing characters are ambiguous). Feed the
    result to any scorer with ``sequences_are_masks=True`` — parsimony then
    minimizes over all resolutions of the ambiguity, the standard
    missing-data semantics the integer loader cannot express.
    """
    names, data = _split_fasta(text)
    full = (1 << len(alphabet)) - 1
    lookup = np.zeros(256, dtype=np.int32)
    if alphabet == DNA:
        for ch, mask in IUPAC_DNA_MASKS.items():
            lookup[ord(ch)] = mask
            lookup[ord(ch.lower())] = mask
    else:
        for i, ch in enumerate(alphabet):
            lookup[ord(ch)] = 1 << i
            lookup[ord(ch.lower())] = 1 << i
        for ch in "-?.Xx":
            lookup[ord(ch)] = full
    masks = lookup[data]
    bad = masks == 0
    if bad.any():
        seq_i, col = np.argwhere(bad)[0]
        raise ValueError(
            f"character {chr(data[seq_i, col])!r} at sequence {seq_i} column "
            f"{col} is not in the alphabet or IUPAC table"
        )
    return names, masks


def write_fasta(names: list[str], sequences: np.ndarray, alphabet: str = DNA) -> str:
    """Serialize an integer state matrix back to FASTA."""
    table = np.frombuffer(alphabet.encode("ascii"), dtype=np.uint8)
    rows = []
    seqs = np.asarray(sequences).astype(np.int64)
    for name, row in zip(names, seqs):
        rows.append(f">{name}")
        rows.append(table[row].tobytes().decode("ascii"))
    return "\n".join(rows) + "\n"


def format_tree(
    topology: Topology,
    leaf_names: list[str] | None = None,
    annotations: dict[int, str] | None = None,
) -> str:
    """ASCII rendering of a topology (debugging / logging aid).

    ``annotations`` maps node index -> extra text (e.g. support values or
    reconstructed states).
    """
    children = np.asarray(topology.children)
    n_leaves = topology.n_leaves
    names = leaf_names or [f"L{i}" for i in range(n_leaves)]
    ann = annotations or {}

    lines: list[str] = []
    root = topology.n_all - 1
    lines.append(f"[{root}]" + (f"  {ann[root]}" if root in ann else ""))
    # Iterative DFS (deep caterpillar trees would blow Python recursion).
    a, b = children[root - n_leaves]
    stack = [(int(b), "", True), (int(a), "", False)]
    while stack:
        node, prefix, is_last = stack.pop()
        branch = "`-- " if is_last else "|-- "
        label = names[node] if node < n_leaves else f"[{node}]"
        extra = f"  {ann[node]}" if node in ann else ""
        lines.append(prefix + branch + label + extra)
        if node >= n_leaves:
            child_prefix = prefix + ("    " if is_last else "|   ")
            a2, b2 = children[node - n_leaves]
            stack.append((int(b2), child_prefix, True))
            stack.append((int(a2), child_prefix, False))
    return "\n".join(lines)


def relabel_leaves(topology: Topology, new_ids: np.ndarray) -> Topology:
    """Permute leaf indices (``new_ids[i]`` = new index of current leaf i)
    and re-canonicalize the ancestor numbering."""
    from trex_tpu.io.fallback import _canonicalize

    children = np.asarray(topology.children)
    n_leaves = topology.n_leaves
    n_all = topology.n_all

    def mapped(node: int) -> int:
        return int(new_ids[node]) if node < n_leaves else node

    kids = {
        n_leaves + a: [mapped(int(children[a, 0])), mapped(int(children[a, 1]))]
        for a in range(n_leaves - 1)
    }
    ch, par, _ = _canonicalize(n_leaves, kids, n_all - 1)
    return Topology(children=jnp.asarray(ch), parents=jnp.asarray(par))


def align_leaf_order(
    topology: Topology, names: list[str], target_names: list[str]
) -> Topology:
    """Renumber leaves so leaf i carries ``target_names[i]``.

    The standard glue between a tree file (leaves numbered by newick
    appearance order) and an alignment file (rows in FASTA order).
    """
    index_of = {name: i for i, name in enumerate(target_names)}
    if set(names) != set(target_names):
        raise ValueError("leaf name sets differ")
    new_ids = np.asarray([index_of[n] for n in names], dtype=np.int32)
    return relabel_leaves(topology, new_ids)


def sample_topologies(seed: int, n_leaves: int, batch: int) -> Topology:
    """Batched random topologies via the native sampler (Python fallback)."""
    if native.available():
        children, parents = native.sample_topologies(seed, n_leaves, batch)
    else:
        children, parents = py_sample_topologies(seed, n_leaves, batch)
    return Topology(children=jnp.asarray(children), parents=jnp.asarray(parents))


def nni_neighbors_host(topology: Topology) -> tuple[np.ndarray, np.ndarray]:
    """NNI neighbors as HOST numpy (children, parents) — no device transfer.

    The search hot loops use this: candidate scoring only reads ``children``
    on device, so the (equally large) parents arrays can stay host-side and
    only the winner's row ever crosses the wire.
    """
    children = np.asarray(topology.children)
    if native.available():
        return native.nni_neighbors(children)
    return py_nni_neighbors(children)


def nni_neighbors(topology: Topology) -> Topology:
    """All NNI neighbors of a single topology, as a batched Topology."""
    nc, npar = nni_neighbors_host(topology)
    return Topology(children=jnp.asarray(nc), parents=jnp.asarray(npar))


def canonicalize_topology(
    children: np.ndarray, lengths: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray | None]:
    """Structure-determined canonical numbering of one host children array.

    Accepts any VALID rooted-binary ``children`` (root = last ancestor;
    numbering need not even be topological) and returns the canonical
    (children, permuted lengths) — the byte identity every host-enumerated
    topology carries. Device-side rearrangements
    (``ops.tree_moves``) emit valid-but-arbitrary numberings; samplers pass
    their emitted states through this before deduplicating or summarizing.
    """
    from trex_tpu.io.fallback import _canonicalize

    children = np.asarray(children)
    n_leaves = children.shape[0] + 1
    kids = {
        n_leaves + a: [int(children[a, 0]), int(children[a, 1])]
        for a in range(n_leaves - 1)
    }
    ch, _, relabel = _canonicalize(n_leaves, kids, 2 * n_leaves - 2)
    if lengths is None:
        return ch, None
    out = np.array(lengths, dtype=np.float32, copy=True)
    for old, new in relabel.items():
        out[new] = lengths[old]
    return ch, out


def spr_neighborhood_host(topology: Topology) -> tuple[np.ndarray, np.ndarray]:
    """SPR neighborhood as HOST numpy (children, parents) — no transfer.

    Returns views into per-shape cached buffers (overwritten by the next
    call of the same shape); copy for persistence. Falls back to the pure-
    Python enumerator (identical output, slower) without the native library.
    """
    if not native.available():
        return py_spr_neighborhood(np.asarray(topology.children))
    return native.spr_neighborhood(np.asarray(topology.children))


def spr_neighborhood(topology: Topology) -> Topology:
    """All distinct valid SPR moves of a topology, as a batched Topology.

    Enumerates every (prune, regraft) node pair; invalid moves (regraft in
    the pruned subtree, no-ops) are skipped and duplicate resulting trees
    deduplicated. O(n^2) candidates — the standard parsimony-search
    neighborhood, a strict superset of NNI.
    """
    nc, npar = spr_neighborhood_host(topology)
    return Topology(children=jnp.asarray(nc), parents=jnp.asarray(npar))


def renumber_leaves(topology: Topology, new_leaf_ids: list[int]) -> Topology:
    """Permute leaf indices (``new_leaf_ids[i]`` = new index of leaf ``i``)
    and re-canonicalize the ancestor numbering.

    Used to put independently parsed trees (whose leaf numbering follows
    each file's own name order) onto one shared name -> index mapping so
    index-based split operations (consensus, RF) compare like with like.
    """
    from trex_tpu.io.fallback import _canonicalize

    children = np.asarray(topology.children)
    n_leaves = topology.n_leaves
    kids = {}
    for a in range(topology.n_ancestors):
        node = n_leaves + a
        kids[node] = [
            int(c) if c >= n_leaves else int(new_leaf_ids[int(c)])
            for c in children[a]
        ]
    ch, par, _ = _canonicalize(n_leaves, kids, topology.n_all - 1)
    return Topology(children=jnp.asarray(ch), parents=jnp.asarray(par))


def prune_to_taxa(
    topology: Topology,
    keep: list[int],
    branch_lengths: np.ndarray | None = None,
) -> tuple[Topology, np.ndarray | None, list[int]]:
    """Induced subtree on a leaf subset (degree-2 nodes suppressed).

    Args:
        keep: leaf indices to retain (>= 2); the pruned tree renumbers them
            0..k-1 in the order given.
        branch_lengths: optional (n_all,) lengths (child-indexed); lengths
            along suppressed unary paths are summed onto the surviving edge.

    Returns:
        (pruned Topology, pruned lengths or None, keep) — ``keep`` echoes
        the old leaf index of each new leaf.
    """
    from trex_tpu.io.fallback import _canonicalize

    n_leaves = topology.n_leaves
    n_all = topology.n_all
    if len(keep) < 2:
        raise ValueError("need at least two retained taxa")
    if len(set(keep)) != len(keep) or not all(
        0 <= x < n_leaves for x in keep
    ):
        raise ValueError("keep must be distinct leaf indices")
    children = np.asarray(topology.children)
    blens = (
        None
        if branch_lengths is None
        else np.asarray(branch_lengths, dtype=np.float64)
    )
    new_id = {old: i for i, old in enumerate(keep)}

    # Bottom-up: each node resolves to (surviving node id, accumulated
    # length above it) or None when its subtree holds no kept leaf.
    k = len(keep)
    resolved: list[tuple[int, float] | None] = [None] * n_all
    for leaf in range(n_leaves):
        if leaf in new_id:
            resolved[leaf] = (
                new_id[leaf], 0.0 if blens is None else float(blens[leaf])
            )
    kids: dict[int, list[tuple[int, float]]] = {}
    next_internal = k
    for a in range(topology.n_ancestors):
        node = n_leaves + a
        survivors = [resolved[int(c)] for c in children[a]]
        survivors = [s for s in survivors if s is not None]
        own_len = (
            0.0
            if blens is None or node == n_all - 1
            else float(blens[node])
        )
        if not survivors:
            resolved[node] = None
        elif len(survivors) == 1:
            # Unary: suppress this node, extend the child's edge upward.
            child_id, below = survivors[0]
            resolved[node] = (child_id, below + own_len)
        else:
            me = next_internal
            next_internal += 1
            kids[me] = survivors
            resolved[node] = (me, own_len)
    root_entry = resolved[n_all - 1]
    assert root_entry is not None and root_entry[0] in kids
    new_root = root_entry[0]

    plain_kids = {p: [c for c, _ in cs] for p, cs in kids.items()}
    ch, par, relabel = _canonicalize(k, plain_kids, new_root)
    out = Topology(children=jnp.asarray(ch), parents=jnp.asarray(par))
    if blens is None:
        return out, None, list(keep)
    new_blens = np.zeros((2 * k - 1,), dtype=np.float64)
    for p, cs in kids.items():
        for c, length in cs:
            new_blens[relabel[c]] = length
    return out, new_blens, list(keep)


def reroot_at_edge(
    topology: Topology,
    node: int,
    branch_lengths: np.ndarray | None = None,
) -> tuple[Topology, np.ndarray | None]:
    """Re-root the tree's UNROOTED structure on the edge above ``node``.

    The old root (a degree-2 vertex in the unrooted view) is smoothed out
    and a new root is inserted in the middle of the edge between ``node``
    and its current parent. Branch lengths, when given (indexed by child
    node as everywhere), follow the edges; the target edge's length is
    split evenly between the new root's two children, and the smoothed old
    root edge becomes one edge whose length is the sum of its two halves.

    Likelihoods under reversible models and parsimony scores are invariant
    to this operation (the pulley principle); it exists for presentation —
    outgroup rooting of inferred trees.
    """
    children = np.asarray(topology.children)
    n_leaves = topology.n_leaves
    n_all = topology.n_all
    old_root = n_all - 1
    # Derive parents from children: several hot paths (batched scorers,
    # MCMC host states) legitimately carry a placeholder parents tensor,
    # and children alone determine the tree.
    parents = np.arange(n_all, dtype=np.int64)
    for a in range(topology.n_ancestors):
        parents[children[a]] = n_leaves + a
    if int(parents[node]) == old_root or node == old_root:
        out_b = None if branch_lengths is None else np.asarray(
            branch_lengths, dtype=np.float64
        )
        return topology, out_b  # the root already subdivides this edge

    blens = (
        None
        if branch_lengths is None
        else np.asarray(branch_lengths, dtype=np.float64)
    )
    # Undirected adjacency of the unrooted tree with edge lengths: old root
    # suppressed, its two children joined by one edge.
    adj: dict[int, list[tuple[int, float]]] = {
        i: [] for i in range(n_all) if i != old_root
    }

    def add_edge(a: int, b: int, w: float) -> None:
        adj[a].append((b, w))
        adj[b].append((a, w))

    rc1, rc2 = (int(c) for c in children[old_root - n_leaves])
    for a in range(topology.n_ancestors):
        parent = n_leaves + a
        if parent == old_root:
            continue
        for c in children[a]:
            c = int(c)
            add_edge(parent, c, 0.0 if blens is None else float(blens[c]))
    root_w = 0.0 if blens is None else float(blens[rc1]) + float(blens[rc2])
    add_edge(rc1, rc2, root_w)

    # Locate the target edge (node, up) in the unrooted view: `node`'s
    # parent, unless that was the smoothed old root — then the other side
    # of the joined edge.
    up = int(parents[node])
    target_w = 0.0 if blens is None else float(blens[node])

    # Orient everything away from a synthetic root bisecting (node, up).
    kids: dict[int, list[int]] = {old_root: [node, up]}
    new_blens = np.zeros((n_all,), dtype=np.float64)
    new_blens[node] = target_w / 2.0
    new_blens[up] = target_w / 2.0
    stack = [(node, up), (up, node)]
    while stack:
        cur, came_from = stack.pop()
        cs = []
        for nxt, w in adj[cur]:
            if nxt == came_from:
                continue
            cs.append(nxt)
            new_blens[nxt] = w
            stack.append((nxt, cur))
        if cs:
            kids[cur] = cs
    from trex_tpu.io.fallback import _canonicalize

    ch, par, relabel = _canonicalize(n_leaves, kids, old_root)
    out = Topology(children=jnp.asarray(ch), parents=jnp.asarray(par))
    if blens is None:
        return out, None
    remapped = np.zeros((n_all,), dtype=np.float64)
    for old, new in relabel.items():
        remapped[new] = new_blens[old]
    remapped[n_all - 1] = 0.0
    return out, remapped


def reroot_on_outgroup(
    topology: Topology,
    outgroup: list[int],
    branch_lengths: np.ndarray | None = None,
) -> tuple[Topology, np.ndarray | None]:
    """Root so the outgroup leaves form one child of the root.

    ``outgroup``: leaf indices. The outgroup must be a split of the
    unrooted tree (monophyletic given some rooting); otherwise ValueError.
    """
    from trex_tpu.search.bootstrap import subtree_leaf_sets

    n_leaves = topology.n_leaves
    want = frozenset(outgroup)
    if not want or not all(0 <= x < n_leaves for x in want):
        raise ValueError("outgroup must be a non-empty set of leaf indices")
    every = frozenset(range(n_leaves))
    if want == every:
        raise ValueError("outgroup cannot contain every taxon")
    if len(want) == 1:
        return reroot_at_edge(topology, next(iter(want)), branch_lengths)
    clades = subtree_leaf_sets(topology)
    children = np.asarray(topology.children)
    n_all = topology.n_all
    # Edge above ancestor a splits off clades[a]; edge above leaf l splits
    # off {l}. Accept either orientation of the target bipartition.
    for a, clade in enumerate(clades):
        node = n_leaves + a
        if node == n_all - 1:
            continue
        if clade == want or every - clade == want:
            return reroot_at_edge(topology, node, branch_lengths)
    raise ValueError(
        "outgroup is not monophyletic on this tree (no edge splits it off)"
    )


def tbr_neighborhood_host(
    topology: Topology, max_trees: int = 16384, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """TBR neighborhood as HOST numpy (children, parents) — no transfer.

    The full O(n^3) TBR set (SPR included as the reroot == prune
    degenerate), deduplicated; ``max_trees`` truncates after a seeded
    shuffle of the iteration order, so a truncated result is an unbiased
    sample. Returns views into per-shape cached buffers (overwritten by the
    next same-shape call); copy for persistence. Falls back to the pure-
    Python enumerator without the native library (same move set; a
    truncated sample draws a different, equally unbiased subset — the
    shuffle streams differ).
    """
    if not native.available():
        return py_tbr_neighborhood(
            np.asarray(topology.children), max_trees=max_trees, seed=seed
        )
    return native.tbr_neighborhood(
        np.asarray(topology.children), max_trees=max_trees, seed=seed
    )


def tbr_neighborhood(
    topology: Topology, max_trees: int = 16384, seed: int = 0
) -> Topology:
    """The (possibly sampled) TBR neighborhood as a batched Topology."""
    nc, npar = tbr_neighborhood_host(topology, max_trees=max_trees, seed=seed)
    return Topology(children=jnp.asarray(nc), parents=jnp.asarray(npar))


def tbr_move_host(
    children: np.ndarray, prune_node: int, reroot_node: int, regraft_node: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """One TBR move on host numpy arrays (native or Python fallback)."""
    if not native.available():
        return py_tbr_move(children, prune_node, reroot_node, regraft_node)
    return native.tbr_move(
        np.asarray(children), prune_node, reroot_node, regraft_node
    )


def spr_move_host(
    children: np.ndarray, prune_node: int, regraft_node: int
) -> tuple[np.ndarray, np.ndarray] | None:
    """One SPR move on host numpy arrays (native or Python fallback)."""
    if not native.available():
        return py_spr_move(children, prune_node, regraft_node)
    return native.spr_move(np.asarray(children), prune_node, regraft_node)


def tbr_move(
    topology: Topology, prune_node: int, reroot_node: int, regraft_node: int
) -> Topology | None:
    """One tree-bisection-reconnection move (None if invalid).

    Prunes the subtree above ``prune_node``, re-roots it at the edge above
    ``reroot_node`` (inside the subtree; == prune_node for plain SPR), and
    regrafts onto the edge above ``regraft_node``.
    """
    result = tbr_move_host(
        np.asarray(topology.children), prune_node, reroot_node, regraft_node
    )
    if result is None:
        return None
    nc, npar = result
    return Topology(children=jnp.asarray(nc), parents=jnp.asarray(npar))


def spr_move(topology: Topology, prune_node: int, regraft_node: int) -> Topology | None:
    """One subtree-prune-regraft move (None if invalid)."""
    result = spr_move_host(np.asarray(topology.children), prune_node, regraft_node)
    if result is None:
        return None
    nc, npar = result
    return Topology(children=jnp.asarray(nc), parents=jnp.asarray(npar))


__all__ = [
    "DNA",
    "PROTEIN",
    "IUPAC_DNA_MASKS",
    "load_newick",
    "save_newick",
    "parse_fasta",
    "parse_fasta_masks",
    "write_fasta",
    "parse_paml_rates",
    "parse_partitions",
    "parse_phylip",
    "write_phylip",
    "parse_nexus",
    "encode_alignment",
    "encode_alignment_masks",
    "format_tree",
    "relabel_leaves",
    "align_leaf_order",
    "sample_topologies",
    "canonicalize_topology",
    "nni_neighbors",
    "spr_neighborhood",
    "spr_neighborhood_host",
    "spr_move",
    "spr_move_host",
    "tbr_move_host",
    "prune_to_taxa",
    "renumber_leaves",
    "reroot_at_edge",
    "reroot_on_outgroup",
    "tbr_move",
    "tbr_neighborhood",
    "tbr_neighborhood_host",
]
