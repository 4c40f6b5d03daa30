"""Pure-Python fallbacks for the native runtime (same contracts, slower).

Used when ``native/libtrex_native.so`` cannot be built/loaded. Parity with
the native implementations is enforced by ``tests/test_io.py``.
"""

from __future__ import annotations

import numpy as np


def _canonicalize(n_leaves: int, kids: dict[int, list[int]], root: int):
    """Relabel ancestors post-order so children always precede parents.

    Structure-determined (mirrors the native ``canonicalize``): children are
    traversed ordered by minimum leaf descendant, so identical structures
    always map to identical arrays regardless of child-list order.
    """
    n_all = 2 * n_leaves - 1
    minleaf: dict[int, int] = {}

    def fill_minleaf(node: int) -> int:
        if node not in minleaf:
            cs = kids.get(node, [])
            minleaf[node] = node if not cs else min(fill_minleaf(c) for c in cs)
        return minleaf[node]

    fill_minleaf(root)
    relabel = {i: i for i in range(n_leaves)}
    order: list[int] = []
    stack = [root]
    while stack:
        node = stack.pop()
        order.append(node)
        # Push smaller-minleaf first so the larger-minleaf child pops first;
        # reversed order then numbers smaller-minleaf subtrees first (DFS
        # order — deterministic, though it differs from balanced_topology's
        # breadth-style numbering for >= 8 leaves).
        stack.extend(sorted(kids.get(node, []), key=lambda c: minleaf[c]))
    next_id = n_leaves
    for node in reversed(order):
        if kids.get(node) and node not in relabel:
            relabel[node] = next_id
            next_id += 1
    children = np.full((n_leaves - 1, 2), -1, dtype=np.int32)
    parents = np.full(n_all, -1, dtype=np.int32)
    for node, cs in kids.items():
        if not cs:
            continue
        p = relabel[node]
        c0, c1 = sorted(relabel[c] for c in cs)
        children[p - n_leaves] = (c0, c1)
        parents[c0] = p
        parents[c1] = p
    parents[n_all - 1] = n_all - 1
    return children, parents, relabel


def py_parse_newick(text: str):
    """Parse rooted binary newick; returns (children, parents, blens, names)."""
    pos = 0
    nodes: list[dict] = []

    def skip_ws():
        nonlocal pos
        while pos < len(text) and text[pos].isspace():
            pos += 1

    def parse_clade() -> int:
        nonlocal pos
        skip_ws()
        if pos >= len(text):
            raise ValueError("unexpected end of newick")
        node = {"kids": [], "label": "", "blen": 0.0, "leaf": False}
        nodes.append(node)
        idx = len(nodes) - 1
        if text[pos] == "(":
            pos += 1
            while True:
                node["kids"].append(parse_clade())
                skip_ws()
                if pos < len(text) and text[pos] == ",":
                    pos += 1
                    continue
                break
            skip_ws()
            if pos >= len(text) or text[pos] != ")":
                raise ValueError("missing ')'")
            pos += 1
        else:
            node["leaf"] = True
        start = pos
        while pos < len(text) and text[pos] not in ":,()' ;\t\n":
            pos += 1
        node["label"] = text[start:pos]
        skip_ws()
        if pos < len(text) and text[pos] == ":":
            pos += 1
            bstart = pos
            while pos < len(text) and (text[pos].isdigit() or text[pos] in ".+-eE"):
                pos += 1
            node["blen"] = float(text[bstart:pos])
        return idx

    root = parse_clade()
    leaves = [i for i, n in enumerate(nodes) if n["leaf"]]
    for n in nodes:
        if not n["leaf"] and len(n["kids"]) != 2:
            raise ValueError("non-binary newick node")
    n_leaves = len(leaves)
    engine_id = {}
    names = []
    for k, i in enumerate(leaves):
        engine_id[i] = k
        names.append(nodes[i]["label"])
    nxt = n_leaves
    for i, n in enumerate(nodes):
        if not n["leaf"]:
            engine_id[i] = nxt
            nxt += 1
    kids = {
        engine_id[i]: [engine_id[c] for c in n["kids"]]
        for i, n in enumerate(nodes)
    }
    children, parents, relabel = _canonicalize(n_leaves, kids, engine_id[root])
    blens = np.zeros(2 * n_leaves - 1)
    for i, n in enumerate(nodes):
        blens[relabel[engine_id[i]]] = n["blen"]
    return children, parents, blens, names


def py_write_newick(children: np.ndarray, leaf_names: list[str] | None = None) -> str:
    n_leaves = children.shape[0] + 1
    names = leaf_names or [f"L{i}" for i in range(n_leaves)]
    repr_ = list(names) + [""] * (n_leaves - 1)
    for a in range(n_leaves - 1):
        c0, c1 = int(children[a, 0]), int(children[a, 1])
        repr_[n_leaves + a] = f"({repr_[c0]},{repr_[c1]})"
    return repr_[2 * n_leaves - 2] + ";"


def py_sample_topologies(seed: int, n_leaves: int, batch: int):
    # Canonicalized like the native sampler: the raw coalescent numbering is
    # valid but not structure-determined, which would give sampled trees a
    # second byte identity vs move-generated ones (breaking bytes dedup).
    rng = np.random.default_rng(seed)
    n_anc, n_all = n_leaves - 1, 2 * n_leaves - 1
    children = np.empty((batch, n_anc, 2), dtype=np.int32)
    parents = np.empty((batch, n_all), dtype=np.int32)
    for b in range(batch):
        active = list(range(n_leaves))
        kids: dict[int, list[int]] = {}
        for a in range(n_anc):
            i, j = rng.choice(len(active), size=2, replace=False)
            c1, c2 = active[i], active[j]
            node = n_leaves + a
            kids[node] = [min(c1, c2), max(c1, c2)]
            active = [x for x in active if x not in (c1, c2)] + [node]
        ch, par, _ = _canonicalize(n_leaves, kids, n_all - 1)
        children[b] = ch
        parents[b] = par
    return children, parents


def py_nni_neighbors(children: np.ndarray):
    children = np.asarray(children, dtype=np.int32)
    n_leaves = children.shape[0] + 1
    n_all = 2 * n_leaves - 1
    base = {
        n_leaves + a: [int(children[a, 0]), int(children[a, 1])]
        for a in range(n_leaves - 1)
    }
    out_c, out_p = [], []
    for a in range(n_leaves - 1):
        p = n_leaves + a
        for ci in range(2):
            c = base[p][ci]
            if c < n_leaves:
                continue
            sibling = base[p][1 - ci]
            for gi in range(2):
                kids = {k: list(v) for k, v in base.items()}
                grand = kids[c][gi]
                kids[p][1 - ci] = grand
                kids[c][gi] = sibling
                ch, par, _ = _canonicalize(n_leaves, kids, n_all - 1)
                out_c.append(ch)
                out_p.append(par)
    return np.stack(out_c), np.stack(out_p)
