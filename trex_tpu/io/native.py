"""ctypes bindings for the native runtime (``native/trex_native.cpp``).

Loads ``libtrex_native.so`` (building it with the in-tree Makefile on first
use if a compiler is available). Every entry point has a pure-Python
fallback in ``trex_tpu.io.pytree_io`` so the package works without a
toolchain; the native path is the production data-loading/search-move path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libtrex_native.so"))


@lru_cache(maxsize=1)
def load_library() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s"],
                cwd=os.path.abspath(_NATIVE_DIR),
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.trex_parse_newick.restype = ctypes.c_int
    lib.trex_parse_newick.argtypes = [
        ctypes.c_char_p, i32p, i32p, f64p, ctypes.c_char_p,
        ctypes.c_int, i32p,
    ]
    lib.trex_write_newick.restype = ctypes.c_int
    lib.trex_write_newick.argtypes = [
        i32p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.trex_sample_topologies.restype = None
    lib.trex_sample_topologies.argtypes = [
        ctypes.c_uint64, ctypes.c_int, ctypes.c_int, i32p, i32p,
    ]
    lib.trex_nni_count.restype = ctypes.c_int
    lib.trex_nni_count.argtypes = [i32p, ctypes.c_int]
    lib.trex_nni_neighbors.restype = ctypes.c_int
    lib.trex_nni_neighbors.argtypes = [i32p, ctypes.c_int, i32p, i32p]
    lib.trex_spr.restype = ctypes.c_int
    lib.trex_spr.argtypes = [
        i32p, ctypes.c_int, ctypes.c_int32, ctypes.c_int32, i32p, i32p,
    ]
    lib.trex_tbr.restype = ctypes.c_int
    lib.trex_tbr.argtypes = [
        i32p, ctypes.c_int, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p,
    ]
    lib.trex_spr_neighborhood.restype = ctypes.c_int
    lib.trex_spr_neighborhood.argtypes = [
        i32p, ctypes.c_int, i32p, i32p, ctypes.c_int,
    ]
    lib.trex_tbr_neighborhood.restype = ctypes.c_int
    lib.trex_tbr_neighborhood.argtypes = [
        i32p, ctypes.c_int, ctypes.c_uint64, i32p, i32p, ctypes.c_int,
    ]
    return lib


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def available() -> bool:
    return load_library() is not None


def parse_newick(text: str):
    """Parse a rooted binary newick string.

    Returns (children (n_anc,2) int32, parents (n_all,) int32,
    branch_lengths (n_all,) float64 indexed by child node, leaf_names list).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n_leaves_guess = text.count(",") + 1
    n_anc = n_leaves_guess - 1
    n_all = 2 * n_leaves_guess - 1
    children = np.zeros((max(n_anc, 1), 2), dtype=np.int32)
    parents = np.zeros(max(n_all, 1), dtype=np.int32)
    blens = np.zeros(max(n_all, 1), dtype=np.float64)
    names_buf = ctypes.create_string_buffer(len(text) + n_all * 8 + 16)
    n_leaves_out = np.zeros(1, dtype=np.int32)
    rc = lib.trex_parse_newick(
        text.encode(), _i32(children), _i32(parents),
        blens.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        names_buf, len(names_buf), _i32(n_leaves_out),
    )
    if rc != 0:
        raise ValueError(f"newick parse failed (code {rc})")
    n_leaves = int(n_leaves_out[0])
    names = names_buf.value.decode().split("\n") if n_leaves else []
    return (
        children[: n_leaves - 1].copy(),
        parents[: 2 * n_leaves - 1].copy(),
        blens[: 2 * n_leaves - 1].copy(),
        names,
    )


def write_newick(children: np.ndarray, leaf_names: list[str] | None = None) -> str:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    children = np.ascontiguousarray(children, dtype=np.int32)
    n_leaves = children.shape[0] + 1
    names = "\n".join(leaf_names).encode() if leaf_names else None
    cap = 16 * (2 * n_leaves) + (len(names) if names else 8 * n_leaves) + 16
    out = ctypes.create_string_buffer(cap)
    rc = lib.trex_write_newick(_i32(children), n_leaves, names, out, cap)
    if rc < 0:
        raise ValueError(f"newick write failed (code {rc})")
    return out.value.decode()


def sample_topologies(seed: int, n_leaves: int, batch: int):
    """Batched coalescent topology sampling (canonical numbering)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n_anc, n_all = n_leaves - 1, 2 * n_leaves - 1
    children = np.zeros((batch, n_anc, 2), dtype=np.int32)
    parents = np.zeros((batch, n_all), dtype=np.int32)
    lib.trex_sample_topologies(seed, n_leaves, batch, _i32(children), _i32(parents))
    return children, parents


def nni_neighbors(children: np.ndarray):
    """All NNI neighbors of a canonical topology."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    children = np.ascontiguousarray(children, dtype=np.int32)
    n_leaves = children.shape[0] + 1
    count = lib.trex_nni_count(_i32(children), n_leaves)
    out_children = np.zeros((max(count, 1), n_leaves - 1, 2), dtype=np.int32)
    out_parents = np.zeros((max(count, 1), 2 * n_leaves - 1), dtype=np.int32)
    written = lib.trex_nni_neighbors(
        _i32(children), n_leaves, _i32(out_children), _i32(out_parents)
    )
    return out_children[:written].copy(), out_parents[:written].copy()


def spr_move(children: np.ndarray, prune_node: int, regraft_node: int):
    """One SPR move; returns (children, parents) or None if invalid."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    children = np.ascontiguousarray(children, dtype=np.int32)
    n_leaves = children.shape[0] + 1
    out_children = np.zeros((n_leaves - 1, 2), dtype=np.int32)
    out_parents = np.zeros(2 * n_leaves - 1, dtype=np.int32)
    rc = lib.trex_spr(
        _i32(children), n_leaves, prune_node, regraft_node,
        _i32(out_children), _i32(out_parents),
    )
    if rc != 0:
        return None
    return out_children, out_parents


def tbr_move(
    children: np.ndarray, prune_node: int, reroot_node: int, regraft_node: int
):
    """One TBR move (prune + reroot + regraft); None if invalid."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    children = np.ascontiguousarray(children, dtype=np.int32)
    n_leaves = children.shape[0] + 1
    out_children = np.zeros((n_leaves - 1, 2), dtype=np.int32)
    out_parents = np.zeros(2 * n_leaves - 1, dtype=np.int32)
    rc = lib.trex_tbr(
        _i32(children), n_leaves, prune_node, reroot_node, regraft_node,
        _i32(out_children), _i32(out_parents),
    )
    if rc != 0:
        return None
    return out_children, out_parents


# Reused output buffers: page faults on fresh large allocations cost
# ~0.5 ms/page under the microVM kernel, dwarfing the enumeration itself.
_NEIGHBORHOOD_BUFFERS: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}


def spr_neighborhood(children: np.ndarray, max_trees: int | None = None):
    """SPR neighborhood in one native call (deduplicated).

    ``max_trees`` caps the enumeration (default: the full O(n^2)
    neighborhood, itself capped at 200k trees — the output is O(n) ints per
    tree, so unbounded 1000-leaf neighborhoods would be gigabytes).

    Returns VIEWS into per-shape cached buffers (overwritten by the next
    call with the same shape); copy if you need persistence.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    children = np.ascontiguousarray(children, dtype=np.int32)
    n_leaves = children.shape[0] + 1
    n_all = 2 * n_leaves - 1
    cap = (n_all - 1) * (n_all - 1)
    cap = min(cap, max_trees if max_trees is not None else 200_000)
    key = (cap, n_leaves)
    if key not in _NEIGHBORHOOD_BUFFERS:
        _NEIGHBORHOOD_BUFFERS[key] = (
            np.zeros((cap, n_leaves - 1, 2), dtype=np.int32),
            np.zeros((cap, n_all), dtype=np.int32),
        )
    out_children, out_parents = _NEIGHBORHOOD_BUFFERS[key]
    count = lib.trex_spr_neighborhood(
        _i32(children), n_leaves, _i32(out_children), _i32(out_parents), cap
    )
    if count < 0:
        raise RuntimeError(f"spr_neighborhood failed (code {count})")
    return out_children[:count], out_parents[:count]


def tbr_neighborhood(
    children: np.ndarray, max_trees: int = 16384, seed: int = 0
):
    """TBR neighborhood in one native call (deduplicated, SPR included).

    The full TBR set is O(n^3); ``max_trees`` bounds the output and the
    native side shuffles the (prune, regraft) iteration order by ``seed``,
    so truncation yields an unbiased neighborhood sample rather than a
    low-index-biased prefix.

    Returns VIEWS into per-shape cached buffers (overwritten by the next
    same-shape call); copy for persistence.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    children = np.ascontiguousarray(children, dtype=np.int32)
    n_leaves = children.shape[0] + 1
    n_all = 2 * n_leaves - 1
    cap = min(max_trees, 200_000)
    key = (cap, n_leaves, "tbr")
    if key not in _NEIGHBORHOOD_BUFFERS:
        _NEIGHBORHOOD_BUFFERS[key] = (
            np.zeros((cap, n_leaves - 1, 2), dtype=np.int32),
            np.zeros((cap, n_all), dtype=np.int32),
        )
    out_children, out_parents = _NEIGHBORHOOD_BUFFERS[key]
    count = lib.trex_tbr_neighborhood(
        _i32(children), n_leaves, ctypes.c_uint64(seed),
        _i32(out_children), _i32(out_parents), cap,
    )
    if count < 0:
        raise RuntimeError(f"tbr_neighborhood failed (code {count})")
    return out_children[:count], out_parents[:count]
