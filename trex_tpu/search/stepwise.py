"""Greedy stepwise-addition starting trees, TPU-batched.

Classic parsimony stepwise addition (add taxa one at a time, each at the
edge that minimizes the score) re-shaped for the TPU's static-shape batch
scorer: instead of growing the tree (one XLA recompile per size), every
intermediate tree is FULL-size over all n taxa, with not-yet-added taxa
carried as fully ambiguous leaves (state-set mask = all states). A fully
ambiguous leaf provably contributes 0 to any parsimony score and leaves all
other state sets unchanged (``tests/test_ambiguity.py``), so the padded
score equals the induced-subtree score exactly — and every step is ONE
fixed-shape ``batched_scores_fastest`` call over all insertion edges, hitting
the fused Fitch kernel on TPU with zero recompiles after the first step.

The reference has no discrete tree construction at all (searches start from
balanced or random trees, ``evals/benchmark.py:781-791``); this is new
capability, standard in production parsimony engines.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from trex_tpu.ops.dispatch import batched_scores_fastest
from trex_tpu.topology import Topology


@dataclasses.dataclass
class _GrowingTree:
    """Host-side induced tree over the added taxa, arbitrary internal labels.

    Internal nodes are negative labels; leaves are taxon ids. ``parent`` maps
    every node except the root; ``kids`` maps internal labels to their two
    children.
    """

    root: int
    parent: dict[int, int]
    kids: dict[int, list[int]]
    next_label: int = -1

    def edges(self) -> list[int]:
        """Child endpoints of every edge (the edge above each non-root node)."""
        return [n for n in self.parent]

    def attach(self, taxon: int, edge_child: int | None) -> None:
        """Insert ``taxon`` on the edge above ``edge_child`` (None = above root)."""
        w = self.next_label
        self.next_label -= 1
        self.kids[w] = []
        if edge_child is None:
            self.kids[w] = [self.root, taxon]
            self.parent[self.root] = w
            self.parent[taxon] = w
            self.root = w
            return
        up = self.parent[edge_child]
        self.kids[up][self.kids[up].index(edge_child)] = w
        self.parent[w] = up
        self.kids[w] = [edge_child, taxon]
        self.parent[edge_child] = w
        self.parent[taxon] = w

    def copy(self) -> "_GrowingTree":
        return _GrowingTree(
            root=self.root,
            parent=dict(self.parent),
            kids={k: list(v) for k, v in self.kids.items()},
            next_label=self.next_label,
        )


def _materialize(tree: _GrowingTree, parked: list[int], n_leaves: int) -> np.ndarray:
    """Full-size canonical children array: induced tree + parked chain.

    Parked (not-yet-added) taxa are chained above the induced root; they are
    fully ambiguous during scoring, so their placement is score-neutral.
    Ancestors are numbered by post-order completion (children visited by
    minimum leaf descendant, the engine's canonical convention), so children
    always have smaller indices than their parent.
    """
    work = tree.copy()
    for t in parked:
        work.attach(t, None)

    children = np.empty((n_leaves - 1, 2), dtype=np.int32)
    # Iterative post-order; order children by minimum leaf descendant.
    min_leaf: dict[int, int] = {}

    def resolve_min(node: int) -> int:
        if node >= 0:
            return node
        if node not in min_leaf:
            stack = [node]
            post = []
            while stack:
                x = stack.pop()
                post.append(x)
                if x < 0:
                    stack.extend(work.kids[x])
            for x in reversed(post):
                if x < 0:
                    min_leaf[x] = min(
                        (x_ if x_ >= 0 else min_leaf[x_]) for x_ in work.kids[x]
                    )
        return min_leaf[node]

    number: dict[int, int] = {}
    counter = n_leaves
    stack: list[tuple[int, bool]] = [(work.root, False)]
    while stack:
        node, expanded = stack.pop()
        if node >= 0:
            continue
        if expanded:
            a, b = work.kids[node]
            ia = a if a >= 0 else number[a]
            ib = b if b >= 0 else number[b]
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            children[counter - n_leaves] = (lo, hi)
            number[node] = counter
            counter += 1
        else:
            stack.append((node, True))
            kids = sorted(work.kids[node], key=resolve_min)
            for k in reversed(kids):
                stack.append((k, False))
    return children


def _children_to_parents(children: np.ndarray, n_leaves: int) -> np.ndarray:
    n_all = 2 * n_leaves - 1
    parents = np.empty((n_all,), dtype=np.int32)
    parents[-1] = n_all - 1
    for a in range(n_leaves - 1):
        parents[children[a, 0]] = n_leaves + a
        parents[children[a, 1]] = n_leaves + a
    return parents


def _batch_topology(children_list: list[np.ndarray], n_leaves: int) -> Topology:
    ch = np.stack(children_list)
    par = np.stack([_children_to_parents(c, n_leaves) for c in children_list])
    return Topology(children=jnp.asarray(ch), parents=jnp.asarray(par))


def stepwise_addition(
    leaf_sequences,
    n_states: int,
    *,
    sequences_are_masks: bool = False,
    order: np.ndarray | None = None,
    seed: int | None = None,
    site_weights=None,
    use_scan: bool | None = None,
) -> tuple[Topology, float]:
    """Build a tree by greedy stepwise addition (TPU-batched scoring).

    Args:
        leaf_sequences: (n_leaves, L) integer states, or state-set bitmasks
            with ``sequences_are_masks=True`` (composes with IUPAC input).
        n_states: alphabet size Q (<= 32; scoring is unit-cost Fitch).
        order: explicit addition order (permutation of taxa); default is a
            random order from ``seed`` (or 0).
        site_weights: optional (L,) weights (compressed patterns/bootstrap).
        use_scan: evaluate each insertion step with the analytic scan
            (``ops.spr_scan`` restricted to the inserted taxon: one O(n)
            up/down pass per step instead of batch-scoring 2n candidate
            trees — O(n^2 L) total construction). Default: when the native
            library is available (the scan applies moves via
            ``io.spr_move``). Both paths are exact and reach trees of equal
            score.

    Returns:
        (topology, score): the grown tree over all taxa and its exact
        unit-cost parsimony score.

    In the batched path every addition step scores all insertion edges in
    one fixed-shape batch (padded to ``2 * n_leaves - 2`` candidates), so
    XLA compiles the scorer once for the whole construction.
    """
    seqs = np.asarray(leaf_sequences)
    n_leaves = seqs.shape[0]
    if n_leaves < 3:
        raise ValueError("stepwise addition needs at least 3 taxa")
    masks = (
        seqs.astype(np.int32)
        if sequences_are_masks
        else (1 << seqs.astype(np.int32))
    )
    full_mask = np.int32((1 << n_states) - 1)
    if order is None:
        rng = np.random.default_rng(0 if seed is None else seed)
        order = rng.permutation(n_leaves)
    order = [int(t) for t in np.asarray(order)]
    if sorted(order) != list(range(n_leaves)):
        raise ValueError("order must be a permutation of all taxa")

    hamming = jnp.ones((n_states, n_states)) - jnp.eye(n_states)
    max_candidates = 2 * n_leaves - 2

    if use_scan is None:
        from trex_tpu.io import native

        use_scan = native.available()
    if use_scan:
        return _stepwise_scan(
            masks, n_states, order, full_mask, site_weights, hamming
        )

    # Seed tree: the first three taxa (all rooted resolutions of 3 taxa give
    # the same unrooted tree, hence the same parsimony score).
    t0, t1, t2 = order[:3]
    tree = _GrowingTree(
        root=-1, parent={t0: -1, t1: -1}, kids={-1: [t0, t1]}, next_label=-2
    )
    tree.attach(t2, None)

    added = order[:3]
    scored_masks = np.full_like(masks, full_mask)
    for t in added:
        scored_masks[t] = masks[t]

    for step in range(3, n_leaves):
        taxon = order[step]
        parked = order[step + 1 :]
        scored_masks[taxon] = masks[taxon]
        masks_dev = jnp.asarray(scored_masks)

        # Candidates: insert ``taxon`` on every edge of the induced tree,
        # plus above the induced root.
        insertion_points: list[int | None] = list(tree.edges()) + [None]
        cand_children = []
        for edge_child in insertion_points:
            cand = tree.copy()
            cand.attach(taxon, edge_child)
            cand_children.append(_materialize(cand, parked, n_leaves))
        n_real = len(cand_children)
        while len(cand_children) < max_candidates:
            cand_children.append(cand_children[0])
        topos = _batch_topology(cand_children, n_leaves)

        scores = np.asarray(
            batched_scores_fastest(
                topos, hamming, masks_dev,
                site_weights=site_weights, sequences_are_masks=True,
            )
        )[:n_real]
        best = int(np.argmin(scores))
        tree.attach(taxon, insertion_points[best])

    final_children = _materialize(tree, [], n_leaves)
    batched = _batch_topology([final_children] * max_candidates, n_leaves)
    final_score = float(
        np.asarray(
            batched_scores_fastest(
                batched, hamming, jnp.asarray(masks),
                site_weights=site_weights, sequences_are_masks=True,
            )
        )[0]
    )
    topo = jax.tree.map(lambda a: a[0], batched)
    return topo, final_score


def _stepwise_scan(
    masks: np.ndarray,
    n_states: int,
    order: list[int],
    full_mask: np.int32,
    site_weights,
    hamming,
) -> tuple[Topology, float]:
    """Scan-based stepwise addition: one analytic pass per inserted taxon.

    The full-size padded representation (not-yet-added taxa fully
    ambiguous) makes each insertion exactly an SPR of the new leaf, so
    ``spr_scan`` restricted to that single prune node scores every
    insertion edge in one O(n) up/down pass; the winning move is applied
    with the native ``io.spr_move``.
    """
    from trex_tpu.io import spr_move
    from trex_tpu.ops.fitch import fitch_score
    from trex_tpu.ops.spr_scan import spr_scan

    n_leaves = masks.shape[0]
    t0, t1, t2 = order[:3]
    tree = _GrowingTree(
        root=-1, parent={t0: -1, t1: -1}, kids={-1: [t0, t1]}, next_label=-2
    )
    tree.attach(t2, None)
    children = _materialize(tree, order[3:], n_leaves)
    topo = Topology(
        children=jnp.asarray(children),
        parents=jnp.asarray(_children_to_parents(children, n_leaves)),
    )

    scored_masks = np.full_like(masks, full_mask)
    for t in order[:3]:
        scored_masks[t] = masks[t]
    weights = (
        None if site_weights is None
        else jnp.asarray(site_weights, jnp.float32)
    )
    # Masks live ON DEVICE and are updated one row per insertion — the
    # alternative re-uploads the whole (n x L) matrix every step (4 MB per
    # insertion at 1024 x 1024).
    masks_dev = jnp.asarray(masks)
    scored_dev = jnp.asarray(scored_masks)
    for t in order[3:]:
        scored_dev = scored_dev.at[t].set(masks_dev[t])
        scores, _ = spr_scan(
            topo, scored_dev, weights,
            sequences_are_masks=True,
            prune_nodes=jnp.asarray([t], jnp.int32),
        )
        row = np.asarray(scores)[0]
        v = int(np.nanargmin(np.where(np.isfinite(row), row, np.nan)))
        moved = spr_move(topo, t, v)
        if moved is not None:  # v == sibling is a no-op reattachment
            topo = moved

    final = float(
        fitch_score(
            topo, jnp.asarray(masks), site_mask=weights,
            sequences_are_masks=True,
        )
    )
    return topo, final


def stepwise_addition_multi(
    leaf_sequences,
    n_states: int,
    *,
    n_orders: int = 8,
    seed: int = 0,
    sequences_are_masks: bool = False,
    site_weights=None,
) -> tuple[Topology, float]:
    """Best of ``n_orders`` random-addition-sequence stepwise trees.

    Random addition orders are the standard way to diversify stepwise
    starting trees (each order can land in a different basin); downstream
    hill climbing / ratchet refines the best one.
    """
    rng = np.random.default_rng(seed)
    best_topo, best_score = None, np.inf
    for _ in range(n_orders):
        order = rng.permutation(np.asarray(leaf_sequences).shape[0])
        topo, score = stepwise_addition(
            leaf_sequences, n_states,
            sequences_are_masks=sequences_are_masks,
            order=order, site_weights=site_weights,
        )
        if score < best_score:
            best_topo, best_score = topo, score
    return best_topo, float(best_score)
