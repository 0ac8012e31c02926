"""Size-guarded single-task kernels for the iterative graph family.

Motivation (round-5 gate-latency work): every distributed round in
``graph.py`` costs one or two all-to-all exchanges whose FIXED cost
(task launch, block shuffle, schema plumbing) is ~1-2 s regardless of
data size.  On an edge list that fits one worker's heap that overhead
dominates a hundred-fold: the 3-iteration PageRank over the sf0.01
purchase graph spent ~29 s in exchange fixed costs for ~0.2 s of
arithmetic.  Below a row bound the SAME integer-exact semantics run in
ONE Ray task over the already-materialized edge blocks; above it the
callers' distributed paths run unchanged.  Byte-equality between the
two paths is pinned by tests (``tests/test_stages.py``), mirroring the
broadcast/joined twin convention used across the repo.

Scale honesty: the bound is enforced on the MATERIALIZED edge count
(metadata, free), the solve happens inside a Ray task — the blocks
travel object-store → task, nothing graph-sized ever lands on the
driver (same contract as the k-core broadcast-survivor bound and the
alias/canonical map guards).  At 100 TB the distinct-edge lists these
queries feed (near-dup pairs, co-purchase graphs) can exceed any
single heap — then the bound trips and the O(log d) exchanges take
over.

Kernels replicate their distributed twins' semantics EXACTLY:

- ``cc_kernel``          — min-label components (pandas ``min`` order,
                           i.e. numeric for ints, lexicographic for
                           strings) == hash-to-min closure fixpoint.
- ``pagerank_kernel``    — fixed-point int64 PageRank, floor division,
                           dangling mass leaks (``graph.pagerank_int``).
- ``triangles_kernel``   — distinct undirected a<b edge set, each
                           triangle counted once via its middle vertex.
- ``kcore_kernel``       — iterative degree peeling over the distinct
                           undirected edge set, ``max_rounds`` bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Default edge-count bound for the single-task path.  5M edges ≈ a few
# hundred MB as factorized int32/int64 arrays — comfortably one task's
# heap; aligned with k_core's broadcast_max_nodes.  Triangle counting
# materializes the wedge set inside the task, so its callers pass a
# tighter bound.
SMALL_GRAPH_MAX_EDGES = 5_000_000


def solve_in_task(edges_mat, kernel, **kw):
    """Run ``kernel(edges_df, **kw)`` inside ONE Ray task over the blocks
    of a materialized edge Dataset; return the result as a Dataset.

    The driver only handles ObjectRefs — blocks stream object-store →
    task, the kernel's output DataFrame comes back as a single block
    ref (``from_pandas_refs``), never deserialized driver-side.
    Delegates to the multi-input ``dedup_local.solve_in_task_n`` so the
    plumbing (block concat, empty handling, remote-function caching)
    lives in exactly one place.
    """
    from .dedup_local import solve_in_task_n
    return solve_in_task_n(kernel, [edges_mat], **kw)


def _factorize_edges(edges: pd.DataFrame, src_col: str, dst_col: str):
    """Factorize both endpoint columns against ONE sorted label array so
    integer code order == pandas min order on the original labels."""
    labels = pd.unique(pd.concat([edges[src_col], edges[dst_col]],
                                 ignore_index=True))
    order = pd.Series(labels).sort_values(kind="mergesort").to_numpy()
    lut = pd.Series(np.arange(len(order)), index=order)
    u = lut[edges[src_col].to_numpy()].to_numpy()
    v = lut[edges[dst_col].to_numpy()].to_numpy()
    return u.astype(np.int64), v.astype(np.int64), order


def cc_kernel(edges: pd.DataFrame, src_col: str = "src",
              dst_col: str = "dst") -> pd.DataFrame:
    """(node, component) for every node in the edge list; component =
    smallest member under pandas ordering — the hash-to-min fixpoint."""
    if not len(edges):
        return pd.DataFrame({"node": [], "component": []})
    u, v, labels = _factorize_edges(edges, src_col, dst_col)
    comp = np.arange(len(labels), dtype=np.int64)
    while True:
        prev = comp.copy()
        m = np.minimum(comp[u], comp[v])
        np.minimum.at(comp, u, m)
        np.minimum.at(comp, v, m)
        comp = np.minimum(comp, comp[comp])      # pointer doubling
        if np.array_equal(comp, prev):
            break
    return pd.DataFrame({"node": labels, "component": labels[comp]})


def pagerank_kernel(edges: pd.DataFrame, iterations: int = 3,
                    damping_pct: int = 85, scale: int = 10 ** 9,
                    src_col: str = "src",
                    dst_col: str = "dst") -> pd.DataFrame:
    """Integer-exact PageRank — semantics of ``graph.pagerank_int``
    verbatim (multi-edges count; floor division; dangling mass leaks)."""
    if not len(edges):
        return pd.DataFrame({"node": [], "rank": []})
    u, v, labels = _factorize_edges(edges, src_col, dst_col)
    n = len(labels)
    out_deg = np.bincount(u, minlength=n).astype(np.int64)
    init = scale // n
    base = (100 - damping_pct) * init // 100
    rank = np.full(n, init, dtype=np.int64)
    has_out = out_deg > 0
    for _ in range(iterations):
        contrib = np.zeros(n, dtype=np.int64)
        contrib[has_out] = rank[has_out] // out_deg[has_out]
        in_sum = np.zeros(n, dtype=np.int64)
        np.add.at(in_sum, v, contrib[u])         # exact int64 edge sum
        rank = base + damping_pct * in_sum // 100
    return pd.DataFrame({"node": labels, "rank": rank})


def _canon_distinct(edges: pd.DataFrame, src_col: str, dst_col: str,
                    as_str: bool) -> pd.DataFrame:
    if src_col not in edges.columns or not len(edges):
        # zero-block materialized inputs reach the kernel as a
        # column-less frame — mirror the distributed paths' clean empty
        return pd.DataFrame({"a": [], "b": []})
    s, d = edges[src_col], edges[dst_col]
    if as_str or s.dtype.kind not in "iu" or d.dtype.kind not in "iu":
        s, d = s.astype(str), d.astype(str)
    a = s.where(s <= d, d)
    b = d.where(s <= d, s)
    out = pd.DataFrame({"a": a, "b": b})
    return out[out["a"] != out["b"]].drop_duplicates()


def triangles_kernel(edges: pd.DataFrame, src_col: str = "src",
                     dst_col: str = "dst",
                     as_str: bool = False) -> pd.DataFrame:
    """One-row {n_triangles} over the undirected simple graph — same
    wedge-through-middle-vertex count as ``graph.triangle_count``."""
    e = _canon_distinct(edges, src_col, dst_col, as_str)
    if not len(e):
        return pd.DataFrame({"n_triangles": [0]})
    wedges = e.rename(columns={"a": "wa", "b": "mid"}).merge(
        e.rename(columns={"a": "mid", "b": "wc"}), on="mid")
    closed = wedges[["wa", "wc"]].merge(
        e, left_on=["wa", "wc"], right_on=["a", "b"])
    return pd.DataFrame({"n_triangles": [int(len(closed))]})


def kcore_kernel(edges: pd.DataFrame, k: int, max_rounds: int = 8,
                 src_col: str = "src", dst_col: str = "dst") -> pd.DataFrame:
    """(node, degree) members of the k-core — iterative peel over the
    distinct undirected edge set, ``graph.k_core`` semantics (string-keyed
    canonicalization, fixpoint or ``max_rounds``, degree = surviving
    subgraph degree)."""
    e = _canon_distinct(edges, src_col, dst_col, as_str=True)
    if not len(e):
        return pd.DataFrame({"node": [], "degree": []})
    u, v, labels = _factorize_edges(e, "a", "b")
    n = len(labels)
    for _ in range(max_rounds):
        deg = (np.bincount(u, minlength=n)
               + np.bincount(v, minlength=n)).astype(np.int64)
        present = deg > 0
        alive = deg >= k
        if alive.sum() == present.sum():
            break                                 # nobody peeled
        if not alive.any():
            return pd.DataFrame({"node": [], "degree": []})
        keep = alive[u] & alive[v]
        u, v = u[keep], v[keep]
    deg = (np.bincount(u, minlength=n)
           + np.bincount(v, minlength=n)).astype(np.int64)
    member = deg >= k
    return pd.DataFrame({"node": labels[member],
                         "degree": deg[member].astype("int64")})
