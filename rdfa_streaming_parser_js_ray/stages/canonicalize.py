"""IRI/bnode canonicalization + exact triple dedup (north-star shuffles).

The only all-to-all exchanges in the KG pipeline (SURVEY.md §2.6):

- ``build_canonical_map``: groupby over entity-link evidence → one canonical
  IRI per equivalence group (smallest lexicographic member wins, so the
  choice is deterministic and retry-stable).
- ``apply_canonical_map``: rewrites triples via the (small) canonical map
  broadcast into a stateless ``map_batches`` — a broadcast join, NOT a
  second shuffle.
- ``dedup_triples``: exact duplicate elimination, pre-reduced per batch
  (combiner) before the hash-partitioned global pass, so the shuffle moves
  unique triples only.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TRIPLE_KEY = ["subj", "pred", "obj_kind", "obj_value", "obj_lang",
              "obj_datatype", "graph"]


def with_part_key(triples_ds, num_partitions: int = 64):
    """(Re)compute ``part_key = hash(subj) % P`` — needed after any stage
    that rewrites subjects (canonicalization) or drops the column (dedup)."""
    import zlib

    def add(batch: pa.Table) -> pa.Table:
        part = pa.array([zlib.crc32(s.encode()) % num_partitions
                         for s in batch["subj"].to_pylist()], pa.int32())
        if "part_key" in batch.column_names:
            return batch.set_column(
                batch.schema.get_field_index("part_key"), "part_key", part)
        return batch.append_column("part_key", part)

    return triples_ds.map_batches(add, batch_format="pyarrow")


def build_canonical_map(links_ds, *, identity_preds=None,
                        min_score: float = 1.0) -> dict[str, str]:
    """links (subj ↔ entity evidence) → {term → canonical IRI}.

    Only *identity-bearing* evidence merges nodes: a mention in a
    dc:identifier / owl:sameAs literal that exact-matches an alias
    (score ≥ ``min_score``) says "this subject IS that entity"; a title
    merely *mentioning* an entity must not collapse the two nodes.
    Distributed pre-aggregation: per-batch distinct pairs, then a
    driver-side Min-merge (lexicographically-smallest entity wins —
    deterministic and retry-stable).
    """
    from .linking import IDENTITY_PREDS
    preds = IDENTITY_PREDS if identity_preds is None else frozenset(identity_preds)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_in(batch["pred"],
                                value_set=pa.array(sorted(preds))),
                       pc.greater_equal(batch["score"], min_score))
        tbl = batch.filter(mask).select(["subj", "entity"])
        return tbl.group_by(["subj", "entity"]).aggregate([])

    pairs = links_ds.map_batches(distinct_pairs, batch_format="pyarrow")

    # The canonical map is entity-level (orders of magnitude smaller than
    # the triples): per-batch distinct pairs stream to a driver-side
    # Min-merge — the same unique rows a groupby would move, minus the
    # sort exchange — then broadcast.  A corpus whose identity-evidence
    # set outgrew driver memory would switch to
    # ``pairs.groupby("subj").aggregate(Min("entity"))`` + bucket join.
    mapping: dict[str, str] = {}
    for batch in pairs.iter_batches(batch_format="pyarrow"):
        for subj, entity in zip(batch["subj"].to_pylist(),
                                batch["entity"].to_pylist()):
            prev = mapping.get(subj)
            if prev is None or entity < prev:
                mapping[subj] = entity
    return {s: e for s, e in mapping.items() if s != e}


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
        subj = [mapping.get(s, s) for s in batch["subj"].to_pylist()]
        kinds = batch["obj_kind"].to_pylist()
        vals = batch["obj_value"].to_pylist()
        obj = [mapping.get(v, v) if k == "iri" else v for k, v in zip(kinds, vals)]
        return batch.set_column(batch.schema.get_field_index("subj"), "subj",
                                pa.array(subj, pa.string())) \
                    .set_column(batch.schema.get_field_index("obj_value"), "obj_value",
                                pa.array(obj, pa.string()))


def apply_canonical_map(triples_ds, mapping_ref, batch_size: int = 65536):
    return triples_ds.map_batches(
        ApplyCanonicalMap, fn_constructor_kwargs={"mapping_ref": mapping_ref},
        batch_format="pyarrow", batch_size=batch_size, concurrency=2)


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


def dedup_triples(triples_ds, keep_doc_id: bool = False, num_buckets: int = 256):
    """Exact triple dedup.

    Stage 1 (combiner, shuffle-free): per-batch distinct on the triple key.
    Stage 2: hash-partition into ``num_buckets`` coarse buckets (uniform —
    the key is a hash) and run a VECTORIZED distinct per bucket.  Coarse
    buckets instead of groupby-per-triple: one pandas ``drop_duplicates``
    per bucket beats millions of per-group Python calls.
    ``keep_doc_id=False`` drops provenance (the graph-level view);
    otherwise the smallest doc_id is kept as the representative witness.
    """
    import zlib

    def local_distinct(batch: pa.Table) -> pa.Table:
        agg = [("doc_id", "min")] if keep_doc_id else []
        cols = TRIPLE_KEY + (["doc_id"] if keep_doc_id else [])
        out = batch.select(cols).group_by(TRIPLE_KEY).aggregate(agg)
        if keep_doc_id:
            out = out.rename_columns(TRIPLE_KEY + ["doc_id"])
        key = [zlib.crc32("\x1f".join(vals).encode()) % num_buckets
               for vals in zip(*(out[c].to_pylist() for c in TRIPLE_KEY))]
        return out.append_column("_bucket", pa.array(key, pa.int32()))

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
