"""Iterative graph analytics over edge tables (KG follow-on stages).

Same execution shape as the hash-to-min closure in ``canonicalize``:
per-iteration bounded grouped exchanges over Datasets, node-table block
counts coalesced every round (a groupby's output block count follows its
input's — letting the union → groupby cycle double blocks per round is
the measured runaway the closure fixed), nothing graph-sized on the
driver.

``pagerank_int`` computes PageRank in FIXED-POINT INTEGER arithmetic:
every rank is an int64 in ``scale`` units, contributions use floor
division, and sums are exact regardless of reduction order — so the
result is bit-identical across block layouts, retries, AND a SQL oracle
replaying the same iterations (float PageRank cannot be value-hashed
across engines; summation order perturbs the last bits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# max_rounds value treated as "effectively full convergence" for the
# pointer-doubling closure (covers diameter 2^32): the default of
# connected_components AND the single-task fast-path eligibility bound —
# one constant so the two can't drift apart.
FULL_CONVERGENCE_ROUNDS = 32


def connected_components(edges_ds, src_col: str = "src",
                         dst_col: str = "dst",
                         num_buckets: int | None = None,
                         max_rounds: int = FULL_CONVERGENCE_ROUNDS,
                         small_graph_max_edges: int | None = None):
    """Min-label connected components over a generic edge Dataset —
    the public face of the hash-to-min machinery the KG pipeline uses
    for entity-identity closure (O(log diameter) rounds, two bounded
    exchanges per round, nothing graph-sized on the driver).

    Returns (node, component) for EVERY node appearing in the edge
    list, component = the lexicographically-smallest member (roots map
    to themselves).

    ``small_graph_max_edges`` (default ``graph_local.SMALL_GRAPH_MAX_
    EDGES``; 0 disables): edge lists at or under the bound solve in ONE
    Ray task with the identical min-label semantics (byte-equality
    pinned by tests) — the per-round exchange fixed costs dominate a
    hundredfold at that size.  The bound is checked on the materialized
    count; past it the hash-to-min exchanges below run unchanged.
    """
    from .canonicalize import transitive_closure_joined
    from .joins import hash_join

    def to_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"subj": batch[src_col].to_numpy(),
                             "entity": batch[dst_col].to_numpy()})

    pairs = edges_ds.map_batches(to_pairs, batch_format="pandas") \
        .materialize()

    from .graph_local import SMALL_GRAPH_MAX_EDGES, cc_kernel, solve_in_task
    if small_graph_max_edges is None:
        small_graph_max_edges = SMALL_GRAPH_MAX_EDGES
    # the kernel always runs to the fixpoint, so the fast path only
    # stands in when the caller asked for effectively-full convergence;
    # bounded-rounds callers keep the distributed partial semantics
    if small_graph_max_edges and max_rounds >= FULL_CONVERGENCE_ROUNDS \
            and pairs.count() <= small_graph_max_edges:
        return solve_in_task(pairs, cc_kernel,
                             src_col="subj", dst_col="entity")
    mapping = transitive_closure_joined(pairs, num_buckets=num_buckets,
                                        max_rounds=max_rounds)

    from .joins import bucketed_fold

    nodes = bucketed_fold(
        pairs.map_batches(
            lambda b: pd.DataFrame({
                "node": pd.concat([b["subj"], b["entity"]],
                                  ignore_index=True).drop_duplicates()}),
            batch_format="pandas"),
        "node", lambda g: g.drop_duplicates("node"))

    if mapping.count() == 0:
        return nodes.map_batches(
            lambda b: b.assign(component=b["node"]),
            batch_format="pandas")

    joined = hash_join(
        nodes,
        mapping.map_batches(
            lambda b: b.rename(columns={"term": "node",
                                        "canonical": "component"}),
            batch_format="pandas"),
        on="node", how="left", num_buckets=num_buckets)

    def coalesce(batch: pd.DataFrame) -> pd.DataFrame:
        hit = batch["component"].notna()
        batch.loc[~hit, "component"] = batch.loc[~hit, "node"]
        out = batch[["node", "component"]].copy()
        # the NA-padded left join demotes int components to float64;
        # post-coalesce every component is a node value, so restore the
        # node dtype (keeps the single-task twin byte-identical)
        try:
            out["component"] = out["component"].astype(batch["node"].dtype)
        except (TypeError, ValueError):
            pass
        return out

    return joined.map_batches(coalesce, batch_format="pandas")


def triangle_count(edges_ds, src_col: str = "src", dst_col: str = "dst",
                   num_buckets: int | None = None,
                   small_graph_max_edges: int | None = None):
    """Count triangles of the UNDIRECTED simple graph induced by an edge
    Dataset (direction and multiplicity ignored; self-loops dropped).

    Classic two-join formulation, each join a single bounded exchange:

    1. canonicalize every edge to (a, b) with a < b and deduplicate —
       one grouped exchange over the distinct edge set;
    2. wedges: E(a, b) ⋈ E(b, c) on the shared middle vertex — because
       both edges are low<high oriented, every wedge satisfies a < b < c,
       so each triangle {x < y < z} is generated exactly once (as the
       wedge through its middle vertex);
    3. close: wedge (a, c) ⋈ E on the composite endpoint key.

    Returns a one-row Dataset ``{n_triangles}``.  Skew note: wedge count
    at a vertex is deg⁺·deg⁻ of its orientation — the low<high
    orientation already caps the worst case far below deg² for hub
    vertices whose id sorts low; for power-law graphs at real scale,
    orient by (degree, id) instead (one extra degree exchange) before
    step 2.
    """
    from .joins import auto_buckets, hash_join

    if num_buckets is None:
        num_buckets = auto_buckets(edges_ds, rows_per_bucket=131_072,
                                   fallback=64)

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[src_col].to_numpy()
        d = batch[dst_col].to_numpy()
        if s.dtype.kind not in "iu" or d.dtype.kind not in "iu":
            s, d = s.astype(str), d.astype(str)
        keep = s != d
        s, d = s[keep], d[keep]
        swap = s > d
        lo = np.where(swap, d, s)
        hi = np.where(swap, s, d)
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    from .joins import bucketed_fold

    edges = bucketed_fold(
        edges_ds.map_batches(canon, batch_format="pandas"),
        ["a", "b"], lambda g: g.drop_duplicates(["a", "b"]),
        num_buckets=num_buckets).materialize()

    # distinct-edge sets under the bound close their wedges in ONE task
    # (identical middle-vertex count, pinned byte-equal by tests).  The
    # bound is tighter than the other ops' because the wedge set
    # materializes inside the task; 0 disables.
    from .graph_local import solve_in_task, triangles_kernel
    if small_graph_max_edges is None:
        small_graph_max_edges = 2_000_000
    if small_graph_max_edges and edges.count() <= small_graph_max_edges:
        return solve_in_task(edges, triangles_kernel,
                             src_col="a", dst_col="b")

    wedges = hash_join(
        edges.map_batches(lambda b: b.rename(columns={"a": "wa", "b": "mid"}),
                          batch_format="pandas"),
        edges.map_batches(lambda b: b.rename(columns={"a": "mid", "b": "wc"}),
                          batch_format="pandas"),
        on="mid", num_buckets=num_buckets)

    # composite (endpoint, endpoint) join key: exact int64 packing when
    # node ids are non-negative ints < 2^31 (the wedge table is the big
    # side — packing beats string concat ~10×); injective, so no
    # collision risk.  String ids fall back to a separator concat.
    def pair_key(x: pd.Series, y: pd.Series) -> pd.Series:
        xv, yv = x.to_numpy(), y.to_numpy()
        if xv.dtype.kind in "iu" and yv.dtype.kind in "iu":
            xv = xv.astype(np.int64)
            yv = yv.astype(np.int64)
            if xv.size and (xv.min() < 0 or xv.max() >= 2**31
                            or yv.min() < 0 or yv.max() >= 2**31):
                raise ValueError("int node ids must be in [0, 2^31)")
            return pd.Series((xv << np.int64(31)) | yv)
        return pd.Series(xv.astype(str)) + "\x1f" + pd.Series(yv.astype(str))

    def wedge_key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"_ac": pair_key(batch["wa"], batch["wc"])})

    def edge_key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"_ac": pair_key(batch["a"], batch["b"]),
                             "_e": np.int8(1)})

    closed = hash_join(wedges.map_batches(wedge_key, batch_format="pandas"),
                       edges.map_batches(edge_key, batch_format="pandas"),
                       on="_ac", num_buckets=num_buckets)
    n = closed.count()

    import ray.data as rd
    return rd.from_items([{"n_triangles": int(n)}])


def pagerank_int(edges_ds, iterations: int = 3, damping_pct: int = 85,
                 scale: int = 10**9, src_col: str = "src",
                 dst_col: str = "dst", num_buckets: int | None = None,
                 small_graph_max_edges: int | None = None):
    """Integer-exact PageRank over an edge Dataset (multi-edges count).

    rank⁰(v) = scale // n_nodes for every node; each iteration:

        contrib(u)   = rank(u) // out_deg(u)          (per node, floor)
        in_sum(v)    = Σ contrib(u) over edges u→v    (exact int sum)
        rank'(v)     = base + damping_pct·in_sum(v) // 100
        base         = (100 − damping_pct)·(scale // n_nodes) // 100

    Dangling-node mass leaks (the standard simplified formulation — the
    oracle replays the same choice).  Returns (node, rank) with rank in
    ``scale`` units.  Exchanges per iteration: one hash join (edges ⋈
    contribs on src) + one grouped Sum + one small left join back onto
    the node table — all bucket-bounded; the node table is coalesced to
    ``num_buckets`` blocks each round.
    """
    from .joins import auto_buckets, bucketed_fold, hash_join

    edges = edges_ds.materialize()

    # single-task fast path under the bound (identical fixed-point
    # semantics, pinned byte-equal by tests); 0 disables
    from .graph_local import (SMALL_GRAPH_MAX_EDGES, pagerank_kernel,
                              solve_in_task)
    if small_graph_max_edges is None:
        small_graph_max_edges = SMALL_GRAPH_MAX_EDGES
    if small_graph_max_edges and edges.count() <= small_graph_max_edges \
            and edges.count() > 0:
        return solve_in_task(edges, pagerank_kernel, iterations=iterations,
                             damping_pct=damping_pct, scale=scale,
                             src_col=src_col, dst_col=dst_col)

    if num_buckets is None:
        num_buckets = auto_buckets(edges, rows_per_bucket=131_072,
                                   fallback=64)

    def srcs(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch[src_col].drop_duplicates()})

    def dsts(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch[dst_col].drop_duplicates()})

    nodes = bucketed_fold(
        edges.map_batches(srcs, batch_format="pandas")
        .union(edges.map_batches(dsts, batch_format="pandas")),
        "node", lambda g: g.drop_duplicates("node"),
        num_buckets=num_buckets or 64).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray.data as rd
        return rd.from_items([])

    out_deg = bucketed_fold(
        edges.map_batches(
            lambda b: b.groupby(src_col, as_index=False)
                       .size().rename(columns={src_col: "node",
                                               "size": "_d"}),
            batch_format="pandas"),
        "node",
        lambda g: g.groupby("node", as_index=False, sort=False)["_d"]
                   .sum().rename(columns={"_d": "out_deg"}),
        num_buckets=num_buckets)

    init = scale // n_nodes
    base = (100 - damping_pct) * init // 100

    def seed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": batch["node"],
                             "rank": np.int64(init)})

    # out_deg rides along on the rank table (joined ONCE) so each
    # iteration's contribution step is map-only — two exchanges per
    # iteration instead of three
    rank = hash_join(nodes.map_batches(seed, batch_format="pandas"),
                     out_deg, on="node", how="left",
                     num_buckets=num_buckets) \
        .repartition(num_buckets).materialize()

    for _ in range(iterations):
        def contrib(batch: pd.DataFrame) -> pd.DataFrame:
            b = batch[batch["out_deg"].notna()]
            return pd.DataFrame({
                src_col: b["node"].to_numpy(),
                "_c": b["rank"].to_numpy(dtype=np.int64)
                      // b["out_deg"].to_numpy(dtype=np.int64)})

        per_edge = hash_join(
            edges, rank.map_batches(contrib, batch_format="pandas"),
            on=src_col, num_buckets=num_buckets)
        in_sums = bucketed_fold(
            per_edge.map_batches(
                lambda b: b.groupby(dst_col, as_index=False)["_c"].sum()
                           .rename(columns={dst_col: "node", "_c": "_s"}),
                batch_format="pandas"),
            "node",
            lambda g: g.groupby("node", as_index=False, sort=False)["_s"]
                       .sum().rename(columns={"_s": "in_sum"}),
            num_buckets=num_buckets)

        joined = hash_join(rank, in_sums, on="node", how="left",
                           num_buckets=num_buckets)

        def fold(batch: pd.DataFrame) -> pd.DataFrame:
            s = pd.to_numeric(batch["in_sum"], errors="coerce") \
                .fillna(0).astype(np.int64)
            return pd.DataFrame({
                "node": batch["node"].to_numpy(),
                "rank": np.int64(base)
                        + np.int64(damping_pct) * s.to_numpy() // 100,
                "out_deg": batch["out_deg"].to_numpy()})

        rank = joined.map_batches(fold, batch_format="pandas") \
            .repartition(num_buckets).materialize()

    return rank.map_batches(lambda b: b[["node", "rank"]],
                            batch_format="pandas")


def k_core(edges_ds, k: int, max_rounds: int = 8,
           src_col: str = "src", dst_col: str = "dst",
           num_buckets: int | None = None,
           broadcast_max_nodes: int = 5_000_000,
           small_graph_max_edges: int | None = None):
    """k-core decomposition by iterative degree peeling — the third
    iterative-graph pattern next to :func:`pagerank_int` (fixed-point
    push) and :func:`connected_components` (hash-to-min): repeatedly
    drop nodes whose degree in the surviving subgraph is below ``k``.
    Returns ``(node, degree)`` for the members of the k-core (degree =
    final surviving-subgraph degree, all ≥ k).

    Semantics are over the DISTINCT undirected edge set (self-loops
    dropped, (a,b) canonicalized with a<b) — exactly what a SQL oracle
    replays by unrolling ``max_rounds`` peel rounds; peeling past the
    fixpoint is a no-op, so an early-converged run equals the fully
    unrolled replay.  Convergence is detected exactly: survivors ⊆
    current nodes, so equal cardinality means no node was peeled.

    Exchanges: 1 distinct-edge groupby up front, then per round 1
    combiner-fed degree groupby plus the survivor filter — a broadcast
    numpy ``isin`` pass while the survivor set holds at most
    ``broadcast_max_nodes`` ids (node sets are edge-set-shrunk, so this
    is the common case), else two bucketed semi-joins (nothing
    corpus-sized on the driver).  Slim intermediates are coalesced so
    per-round fixed task costs stay bounded.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[src_col].astype(str)
        d = batch[dst_col].astype(str)
        a = s.where(s <= d, d)
        b = d.where(s <= d, s)
        out = pd.DataFrame({"a": a, "b": b})
        return out[out["a"] != out["b"]].drop_duplicates()

    def coalesce(ds, blocks=32):
        ds = ds.materialize()
        return ds.repartition(blocks).materialize() \
            if ds.num_blocks() > blocks else ds

    # global distinct via coarse hash buckets + per-bucket vectorized
    # drop_duplicates (the dedup-stage pattern) — Ray's multi-key string
    # groupby costs 10x more for the same result (measured 15.8 s vs
    # 1.5 s on a 60k-row edge list)
    from .joins import _bucket_of
    nb_dist = num_buckets or 64

    def add_pair_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_gb"] = _bucket_of(batch["a"] + "\x1f" + batch["b"], nb_dist)
        return batch

    edges = coalesce(
        edges_ds.map_batches(canon, batch_format="pandas")
        .map_batches(add_pair_bucket, batch_format="pandas")
        .groupby("_gb").map_groups(
            lambda g: g.drop_duplicates(["a", "b"])[["a", "b"]],
            batch_format="pandas"))

    # distinct-edge sets under the bound peel in ONE task (identical
    # rounds-bounded semantics, pinned byte-equal by tests); 0 disables
    from .graph_local import (SMALL_GRAPH_MAX_EDGES, kcore_kernel,
                              solve_in_task)
    if small_graph_max_edges is None:
        small_graph_max_edges = SMALL_GRAPH_MAX_EDGES
    if small_graph_max_edges and edges.count() <= small_graph_max_edges:
        return solve_in_task(edges, kcore_kernel, k=k,
                             max_rounds=max_rounds,
                             src_col="a", dst_col="b")

    def degrees(e):
        # combiner (per-batch value_counts) -> int-bucketed exchange ->
        # per-bucket pandas fold; same reasoning as the distinct above
        # (string-key Ray groupby costs ~10x the bucketed fold here)
        def partial(batch: pd.DataFrame) -> pd.DataFrame:
            nodes = pd.concat([batch["a"], batch["b"]], ignore_index=True)
            c = nodes.value_counts()
            out = pd.DataFrame({"node": c.index.to_numpy(),
                                "_d": c.to_numpy()})
            out["_gb"] = _bucket_of(out["node"], nb_dist)
            return out

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            f = g.groupby("node", as_index=False, sort=False)["_d"].sum()
            return f.rename(columns={"_d": "degree"})

        return e.map_batches(partial, batch_format="pandas") \
                .groupby("_gb").map_groups(fold, batch_format="pandas")

    from .joins import hash_join
    for _ in range(max_rounds):
        degs = degrees(edges).materialize()
        n_nodes = degs.count()
        alive = degs.map_batches(
            lambda b: b[b["degree"] >= k][["node"]],
            batch_format="pandas").materialize()
        n_alive = alive.count()
        if n_alive == n_nodes:
            break                      # nobody peeled: fixpoint
        if n_alive == 0:
            import ray.data as rd
            return rd.from_items([])
        if n_alive <= broadcast_max_nodes:
            import numpy as np
            nodes_arr = alive.to_pandas()["node"].to_numpy()

            def filt(batch: pd.DataFrame, _n=nodes_arr) -> pd.DataFrame:
                return batch[np.isin(batch["a"].to_numpy(), _n)
                             & np.isin(batch["b"].to_numpy(), _n)]

            edges = coalesce(edges.map_batches(filt, batch_format="pandas"))
        else:
            keep_a = alive.map_batches(
                lambda b: b.rename(columns={"node": "a"}),
                batch_format="pandas")
            keep_b = alive.map_batches(
                lambda b: b.rename(columns={"node": "b"}),
                batch_format="pandas")
            edges = coalesce(
                hash_join(hash_join(edges, keep_a, on="a",
                                    num_buckets=num_buckets),
                          keep_b, on="b", num_buckets=num_buckets))

    return degrees(edges).map_batches(
        lambda b: b[b["degree"] >= k].assign(
            degree=lambda x: x["degree"].astype("int64")),
        batch_format="pandas")


def predicate_stats(triples_ds, pred_col: str = "pred",
                    subj_col: str = "subj", obj_col: str = "obj_value",
                    num_buckets: int | None = None):
    """VoID-style dataset statistics per predicate: triple count,
    distinct subjects, distinct objects — the KG profile every
    link-discovery / vocabulary-audit step starts from.

    Scale shape: triple counts are a combiner + one small grouped Sum;
    the distinct counts explode each triple to two slim tagged rows
    ((pred, 's'|'o', value), batch-locally deduped), hash-bucket on the
    full key so the ONE wide exchange has bounded uniform groups, dedup
    + count inside each bucket, then a second constant-size Sum fold per
    (pred, kind).  Nothing corpus-sized crosses undeduped; no driver
    pulls.  Returns (pred, n_triples, n_subj, n_obj), int64-exact.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .joins import _bucket_of, auto_buckets, hash_join

    # two branches (triple counts, distinct counts) consume the input —
    # pin it once or a lazy upstream (e.g. the whole KG pipeline)
    # re-executes per branch (same convention as the other multi-consumer
    # stages in this module)
    triples_ds = triples_ds.materialize()

    if num_buckets is None:
        num_buckets = auto_buckets(triples_ds, rows_per_bucket=200_000,
                                   fallback=64)

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(pred_col, as_index=False) \
            .agg(n_triples=(pred_col, "size"))

    n_triples = triples_ds.map_batches(count_partial, batch_format="pandas") \
        .groupby(pred_col).aggregate(Sum("n_triples",
                                         alias_name="n_triples"))

    def tagged(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[[pred_col, subj_col]].drop_duplicates()
        s = pd.DataFrame({pred_col: s[pred_col], "kind": "s",
                          "val": s[subj_col]})
        o = batch[[pred_col, obj_col]].drop_duplicates()
        o = pd.DataFrame({pred_col: o[pred_col], "kind": "o",
                          "val": o[obj_col]})
        both = pd.concat([s, o], ignore_index=True)
        both["_bucket"] = _bucket_of(
            both[pred_col] + "\x1f" + both["kind"] + "\x1f"
            + both["val"].astype(str), num_buckets)
        return both

    def bucket_distinct_counts(group: pd.DataFrame) -> pd.DataFrame:
        d = group.drop_duplicates([pred_col, "kind", "val"])
        return d.groupby([pred_col, "kind"], as_index=False) \
            .agg(n=("val", "size"))

    counts = triples_ds.map_batches(tagged, batch_format="pandas") \
        .groupby("_bucket") \
        .map_groups(bucket_distinct_counts, batch_format="pandas") \
        .groupby([pred_col, "kind"]).aggregate(Sum("n", alias_name="n"))

    def widen(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch.pivot_table(index=pred_col, columns="kind", values="n",
                              aggfunc="sum", fill_value=0).reset_index()
        return pd.DataFrame({
            pred_col: w[pred_col],
            "n_subj": w["s"].astype("int64") if "s" in w else 0,
            "n_obj": w["o"].astype("int64") if "o" in w else 0,
        })

    # per-pred tables are vocabulary-sized (small); repartition(1) makes
    # the pivot see every (pred, kind) row, then a slim hash join
    wide = counts.repartition(1).map_batches(widen, batch_format="pandas")
    return hash_join(n_triples, wide, on=pred_col, num_buckets=8)
