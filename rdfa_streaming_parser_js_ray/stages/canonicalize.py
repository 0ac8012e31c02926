"""IRI/bnode canonicalization + exact triple dedup (north-star shuffles).

The only all-to-all exchanges in the KG pipeline (SURVEY.md §2.6):

- ``canonical_pairs`` / ``build_canonical_map``: distributed distinct over
  entity-link evidence (combiner + one grouped exchange), then union-find
  with min-root over the entity-level pairs → one canonical IRI per
  connected component, transitively closed (a→b→c chains collapse;
  smallest lexicographic member wins, deterministic and retry-stable).
- ``apply_canonical_map``: rewrites triples via the (small) canonical map
  broadcast into a stateless ``map_batches`` — a broadcast join, NOT a
  second shuffle.  ``apply_canonical_map_joined`` is the no-broadcast
  fallback (two partitioned left hash joins) for maps beyond node memory.
- ``dedup_triples``: exact duplicate elimination, pre-reduced per batch
  (combiner) before the hash-partitioned global pass, so the shuffle moves
  unique triples only.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRIPLE_KEY = ["subj", "pred", "obj_kind", "obj_value", "obj_lang",
              "obj_datatype", "graph"]


def part_key_of(values, num_partitions: int) -> pa.Array:
    """Vectorized deterministic partition key for a string column.

    ``pd.util.hash_array`` (fixed key, stable across processes/retries)
    instead of a Python crc32 loop per subject — the key only needs to be
    uniform and identical wherever part_key is (re)derived (extraction
    and post-canonicalization use this same helper)."""
    import numpy as np
    import pandas as pd

    arr = values if isinstance(values, np.ndarray) \
        else np.asarray(values.to_pylist() if hasattr(values, "to_pylist")
                        else values, dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    return pa.array((h % np.uint64(num_partitions)).astype("int32"),
                    pa.int32())


def with_part_key(triples_ds, num_partitions: int = 64):
    """(Re)compute ``part_key = hash(subj) % P`` — needed after any stage
    that rewrites subjects (canonicalization) or drops the column (dedup)."""

    def add(batch: pa.Table) -> pa.Table:
        part = part_key_of(batch["subj"], num_partitions)
        if "part_key" in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index("part_key"), "part_key", part)
        return batch.append_column("part_key", part)

    return triples_ds.map_batches(add, batch_format="pyarrow")


def canonical_pairs(links_ds, *, identity_preds=None, min_score: float = 1.0):
    """links (subj ↔ entity evidence) → globally-distinct identity pairs.

    Only *identity-bearing* evidence merges nodes: a mention in a
    dc:identifier / owl:sameAs literal that exact-matches an alias
    (score ≥ ``min_score``) says "this subject IS that entity"; a title
    merely *mentioning* an entity must not collapse the two nodes.
    Per-batch distinct (combiner) then ONE grouped exchange — the result
    Dataset has one (subj, entity) row per distinct evidence pair and is
    entity-level small (orders of magnitude below the triples).
    """
    from ray.data.aggregate import Count

    from .linking import IDENTITY_PREDS
    preds = IDENTITY_PREDS if identity_preds is None else frozenset(identity_preds)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_in(batch["pred"],
                                value_set=pa.array(sorted(preds))),
                       pc.greater_equal(batch["score"], min_score))
        tbl = batch.filter(mask).select(["subj", "entity"])
        return tbl.group_by(["subj", "entity"]).aggregate([])

    pairs = links_ds.map_batches(distinct_pairs, batch_format="pyarrow")
    return pairs.groupby(["subj", "entity"]) \
                .aggregate(Count(alias_name="_n")).drop_columns(["_n"])


def build_canonical_map(links_ds, *, identity_preds=None,
                        min_score: float = 1.0,
                        max_entities: int = 2_000_000) -> dict[str, str]:
    """links evidence → {term → canonical IRI}, transitively closed.

    The distinct-pair reduction runs distributed (:func:`canonical_pairs`
    — per-batch combiner + one grouped exchange); the driver receives only
    the entity-level distinct pairs and runs union-find with min-root over
    them, so owl:sameAs chains (a→b→c) and diamond/mirror shapes all
    collapse to the lexicographically-smallest member of each equivalence
    class — deterministic, order-independent, retry-stable.

    An evidence set larger than ``max_entities`` pairs must not be
    broadcast at all: raise and direct callers to
    :func:`apply_canonical_map_joined` (at that scale the closure itself
    runs as O(log chain) rounds of grouped min-propagation on the pair
    Dataset — hash-to-min — instead of driver union-find).
    """
    reduced = canonical_pairs(links_ds, identity_preds=identity_preds,
                              min_score=min_score).materialize()
    n = reduced.count()
    if n > max_entities:
        raise ValueError(
            f"identity-evidence set has {n} pairs (> max_entities="
            f"{max_entities}); use apply_canonical_map_joined with a "
            "distributed hash-to-min closure instead of a broadcast map")

    # union-find, min root: the canonical IRI of every node is the
    # smallest member of its connected component
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for batch in reduced.iter_batches(batch_format="pyarrow"):
        for subj, entity in zip(batch["subj"].to_pylist(),
                                batch["entity"].to_pylist()):
            ra, rb = find(subj), find(entity)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
    return {x: r for x in list(parent) if (r := find(x)) != x}


class ApplyCanonicalMap:
    """Rewrite subj / IRI-objects through the broadcast canonical map."""

    def __init__(self, mapping_ref):
        import ray
        self.mapping = ray.get(mapping_ref) if not isinstance(mapping_ref, dict) \
            else mapping_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        mapping = self.mapping
        if not mapping:
            return batch
        import pandas as pd
        # vectorized dict rewrite: Series.map is a C hashtable probe per
        # column, replacing the per-row Python dict.get loop
        s = batch["subj"].to_pandas()
        ms = s.map(mapping)
        v = batch["obj_value"].to_pandas()
        mv = v.map(mapping)
        iri = batch["obj_kind"].to_pandas() == "iri"
        return batch.set_column(
            batch.schema.get_field_index("subj"), "subj",
            pa.Array.from_pandas(ms.where(ms.notna(), s), type=pa.string())) \
            .set_column(
            batch.schema.get_field_index("obj_value"), "obj_value",
            pa.Array.from_pandas(mv.where(mv.notna() & iri, v),
                                 type=pa.string()))


def apply_canonical_map(triples_ds, mapping_ref, batch_size: int = 65536):
    return triples_ds.map_batches(
        ApplyCanonicalMap, fn_constructor_kwargs={"mapping_ref": mapping_ref},
        batch_format="pyarrow", batch_size=batch_size, concurrency=2)




def transitive_closure_joined(pairs_ds, num_buckets: int | None = None,
                              max_rounds: int = 32):
    """Distributed transitive closure of identity-evidence pairs — the
    no-driver path for evidence sets beyond node memory.

    Hash-to-min with pointer doubling, TWO exchanges per round:

    1. ONE bucketed co-group (union of three sides keyed on the same
       hashed value): the mapping as build side (term → canonical), the
       symmetrized edge list probing on ``nbr`` (yielding ``m(nbr)``
       candidates — min propagation), and the mapping probing on its own
       ``canonical`` (yielding ``m(m(t))`` candidates — pointer
       doubling).  Each bucket resolves its probes with one vectorized
       ``Series.map``.
    2. ONE grouped fold: bucket by ``hash(term)`` and run a vectorized
       pandas ``groupby(term).min`` per bucket — the new mapping AND the
       convergence check in the same exchange (``prev`` rides along on
       the pointer-probe rows; changed-count is a map-only filter over
       the fold's output, no extra join).  Bucketed folding (vs a
       per-term Ray aggregate) keeps the reduce vectorized — one pandas
       ``groupby.min`` per bucket — and the mapping is coalesced back to
       ``num_buckets`` blocks each round (a groupby's output block count
       follows its input's, so the union → groupby cycle would otherwise
       double blocks/tasks per round; measured runaway by round 6).

    Pointer doubling halves every chain per round, so rounds are
    O(log diameter) instead of the previous O(diameter) — and the old
    third exchange (a convergence-check join) is folded away.
    Correctness: every value always stays inside its component (min
    over component members is a component member), and the component
    MINIMUM itself is a fixed point that propagates outward monotonically
    — each round every node within doubling distance of a
    minimum-labelled node adopts the minimum, so all nodes hold it
    within O(log d) rounds.  (Individual non-minimum values can
    transiently RISE — e.g. the 2-cycle {1,2} maps 2: 1→2 in round one
    before settling at 1 — so per-node monotonicity must NOT be assumed
    for early-exit tricks; the changed-count fixpoint check below is the
    correct termination test, simulation-checked over random graphs,
    long paths and cycles.)  The fixpoint is exact, deterministic, and
    retry-stable.  Returns a Dataset (term, canonical), identity rows
    dropped — feed to :func:`apply_canonical_map_joined`.
    """
    import pandas as pd
    from ray.data.aggregate import Min

    from .joins import _bucket_of

    def symmetrize(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = batch.rename(columns={"subj": "node", "entity": "nbr"})
        rev = batch.rename(columns={"subj": "nbr", "entity": "node"})
        both = pd.concat([fwd[["node", "nbr"]], rev[["node", "nbr"]]],
                         ignore_index=True)
        # self-edge seeds min(N(u) ∪ {u})
        self_rows = pd.DataFrame({"node": both["node"],
                                  "nbr": both["node"]})
        return pd.concat([both, self_rows], ignore_index=True) \
                 .drop_duplicates()

    edges = pairs_ds.map_batches(symmetrize,
                                 batch_format="pandas").materialize()
    if edges.count() == 0:
        # no identity evidence: empty mapping (an empty Dataset has no
        # schema to join against — callers guard on count())
        import ray.data as rd
        return rd.from_items([])
    if num_buckets is None:
        from .joins import auto_buckets
        num_buckets = auto_buckets(edges, rows_per_bucket=131_072,
                                   fallback=64)
    mapping = edges.groupby("node") \
                   .aggregate(Min("nbr", alias_name="canonical")) \
                   .map_batches(lambda b: b.rename(columns={"node": "term"}),
                                batch_format="pandas").materialize()

    def align(side: str, key_col: str, val_col: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"key": batch[key_col].to_numpy(),
                                "val": batch[val_col].to_numpy()})
            out["_bucket"] = _bucket_of(out["key"], num_buckets)
            out["_side"] = side
            return out
        return f

    def co_group(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"]
        m = group[side == "m"]
        lookup = pd.Series(m["val"].to_numpy(), index=m["key"].to_numpy())
        outs = []
        e = group[side == "e"]
        if len(e):
            # prev=None: edge rows carry no convergence evidence; the
            # fold drops nulls before its prev-min, which keeps the
            # column dtype-agnostic (string KG terms AND integer node
            # ids both work — a string max-sentinel broke int graphs)
            outs.append(pd.DataFrame({
                "term": e["val"].to_numpy(),
                "cand": e["key"].map(lookup).to_numpy(),
                "prev": None}))
        p = group[side == "p"]
        if len(p):
            outs.append(pd.DataFrame({
                "term": p["val"].to_numpy(),
                "cand": p["key"].map(lookup).to_numpy(),
                # the probe key IS m(term): carries the convergence check
                "prev": p["key"].to_numpy()}))
        if not outs:
            return pd.DataFrame({"term": [], "cand": [], "prev": []},
                                dtype=object)
        res = pd.concat(outs, ignore_index=True)
        # every probe key is a mapping term bucketed alongside its build
        # row, so misses can only mean a corrupt bucket — drop defensively
        res = res[res["cand"].notna()]
        res["_tbucket"] = _bucket_of(res["term"], num_buckets)
        return res

    def fold_bucket(group: pd.DataFrame) -> pd.DataFrame:
        cmin = group.groupby("term", sort=False).agg(
            canonical=("cand", "min"))
        prow = group[group["prev"].notna()]
        pmin = prow.groupby("term", sort=False).agg(prev=("prev", "min"))
        # a term without a probe row gets prev=NaN -> counts as changed
        # (safe direction: one extra round, never false convergence)
        return cmin.join(pmin).reset_index()

    for _ in range(max_rounds):
        both = mapping.map_batches(align("m", "term", "canonical"),
                                   batch_format="pandas") \
            .union(edges.map_batches(align("e", "nbr", "node"),
                                     batch_format="pandas")) \
            .union(mapping.map_batches(align("p", "canonical", "term"),
                                       batch_format="pandas"))
        folded = both.groupby("_bucket").map_groups(
            co_group, batch_format="pandas") \
            .groupby("_tbucket").map_groups(
                fold_bucket, batch_format="pandas").materialize()
        changed = folded.map_batches(
            lambda b: b[b["canonical"] != b["prev"]][["term"]],
            batch_format="pandas").count()
        # bound the mapping's block count: a groupby's output block count
        # follows its INPUT blocks, so without this coalesce the
        # union → groupby cycle doubles blocks (and tasks) every round —
        # measured exponential wall time (12→28→60→124… blocks).  A
        # non-shuffling repartition pins it at num_buckets per round.
        mapping = folded.map_batches(
            lambda b: b[["term", "canonical"]], batch_format="pandas") \
            .repartition(num_buckets)
        if changed == 0:
            break

    def drop_identity(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["term"] != batch["canonical"]]

    return mapping.map_batches(drop_identity, batch_format="pandas")


def apply_canonical_map_joined(triples_ds, mapping_ds,
                               num_buckets: int | None = None):
    """Rewrite subj / IRI-objects via partitioned left hash joins — the
    no-broadcast path for canonical maps beyond node memory.

    ``mapping_ds``: Dataset with columns (term, canonical), already
    transitively closed.  Two left joins (one exchange each): triples ⟕
    map on subj, then on obj_value; unmatched rows keep their original
    term (coalesce), IRI-kind objects only.
    """
    import pandas as pd

    from .joins import hash_join

    def prep(side_col: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.rename(columns={"term": side_col,
                                         "canonical": f"_c_{side_col}"})
        return f

    sub_map = mapping_ds.map_batches(prep("subj"), batch_format="pandas")
    obj_map = mapping_ds.map_batches(prep("obj_value"), batch_format="pandas")

    j1 = hash_join(triples_ds, sub_map, on="subj", how="left",
                   num_buckets=num_buckets)

    def coalesce_subj(batch: pd.DataFrame) -> pd.DataFrame:
        hit = batch["_c_subj"].notna()
        batch.loc[hit, "subj"] = batch.loc[hit, "_c_subj"]
        return batch.drop(columns=["_c_subj"])

    j2 = hash_join(j1.map_batches(coalesce_subj, batch_format="pandas"),
                   obj_map, on="obj_value", how="left",
                   num_buckets=num_buckets)

    def coalesce_obj(batch: pd.DataFrame) -> pd.DataFrame:
        hit = batch["_c_obj_value"].notna() & (batch["obj_kind"] == "iri")
        batch.loc[hit, "obj_value"] = batch.loc[hit, "_c_obj_value"]
        return batch.drop(columns=["_c_obj_value"])

    return j2.map_batches(coalesce_obj, batch_format="pandas")


def mapping_to_dataset(mapping: dict[str, str]):
    """{term → canonical} dict → (term, canonical) Dataset (test shim for
    the joined apply path)."""
    import ray.data as rd
    items = [{"term": t, "canonical": c} for t, c in sorted(mapping.items())]
    return rd.from_items(items)


def combine_distinct(triples_ds, keep_doc_id: bool = False):
    """Stage-1 exact-dedup combiner: per-batch distinct on the triple key,
    shuffle-free (``keep_doc_id`` keeps the smallest witness doc_id).
    Shrinks what the downstream exchange must move to unique triples per
    batch; pair with ONE keyed groupby (``part_key`` works, since equal
    triples share subj and hence part_key) for the global pass."""

    def local_distinct(batch: pa.Table) -> pa.Table:
        agg = [("doc_id", "min")] if keep_doc_id else []
        cols = TRIPLE_KEY + (["doc_id"] if keep_doc_id else [])
        out = batch.select(cols).group_by(TRIPLE_KEY).aggregate(agg)
        if keep_doc_id:
            out = out.rename_columns(TRIPLE_KEY + ["doc_id"])
        return out

    return triples_ds.map_batches(local_distinct, batch_format="pyarrow")


def part_distinct(keep_doc_id: bool = False):
    """Per-group global distinct for a part_key-grouped ``map_groups``."""
    if keep_doc_id:
        def f(group):
            return group.sort_values("doc_id") \
                        .drop_duplicates(subset=TRIPLE_KEY, keep="first")
    else:
        def f(group):
            return group.drop_duplicates(subset=TRIPLE_KEY)
    return f


def dedup_triples(triples_ds, keep_doc_id: bool = False,
                  num_buckets: int | None = None):
    """Exact triple dedup.

    Stage 1 (combiner, shuffle-free): per-batch distinct on the triple key.
    Stage 2: hash-partition into ``num_buckets`` coarse buckets (uniform —
    the key is a hash) and run a VECTORIZED distinct per bucket.  Coarse
    buckets instead of groupby-per-triple: one pandas ``drop_duplicates``
    per bucket beats millions of per-group Python calls.
    ``keep_doc_id=False`` drops provenance (the graph-level view);
    otherwise the smallest doc_id is kept as the representative witness.
    ``num_buckets=None`` → size-derived via ``auto_buckets``
    (fallback 256).
    """
    if num_buckets is None:
        from .joins import auto_buckets
        num_buckets = auto_buckets(triples_ds, rows_per_bucket=131_072,
                                   fallback=256, minimum=256)

    def local_distinct(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd
        agg = [("doc_id", "min")] if keep_doc_id else []
        cols = TRIPLE_KEY + (["doc_id"] if keep_doc_id else [])
        out = batch.select(cols).group_by(TRIPLE_KEY).aggregate(agg)
        if keep_doc_id:
            out = out.rename_columns(TRIPLE_KEY + ["doc_id"])
        # vectorized row hash over the triple-key columns (deterministic
        # fixed-key pandas hash) instead of a join+crc32 Python loop
        h = pd.util.hash_pandas_object(
            out.select(TRIPLE_KEY).to_pandas(), index=False).to_numpy()
        bucket = (h % np.uint64(num_buckets)).astype("int32")
        return out.append_column("_bucket", pa.array(bucket, pa.int32()))

    local = triples_ds.map_batches(local_distinct, batch_format="pyarrow")

    if keep_doc_id:
        def bucket_distinct(group):
            return group.sort_values("doc_id") \
                        .drop_duplicates(subset=TRIPLE_KEY, keep="first") \
                        .drop(columns=["_bucket"])
    else:
        def bucket_distinct(group):
            return group.drop_duplicates(subset=TRIPLE_KEY) \
                        .drop(columns=["_bucket"])

    return local.groupby("_bucket").map_groups(bucket_distinct,
                                               batch_format="pandas")
