"""Entity linking against a broadcast alias dictionary (north-star stage).

The alias dictionary is the textbook broadcast-small-side join: built once,
``ray.put()`` once on the driver, fetched once per actor in ``__init__``
(zero-copy from the local object store on every node), and probed per batch
with plain dict lookups — no shuffle (SURVEY.md §2.5).  At 100 TB the
dictionary (≈ millions of aliases, ~100 MB) still broadcasts; only if it
outgrew a node's memory would this become a partitioned hash join.
"""

from __future__ import annotations

import pyarrow as pa

LINKS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("surface", pa.string()),
    ("entity", pa.string()),
    ("score", pa.float32()),
])


IDENTITY_PREDS = frozenset((
    "http://purl.org/dc/terms/identifier",
    "http://purl.org/dc/elements/1.1/identifier",
    "http://www.w3.org/2002/07/owl#sameAs",
))


def build_alias_dict(triples_ds, max_entities: int = 1_000_000) -> dict[str, str]:
    """Derive a deterministic alias dictionary from the corpus.

    Two evidence sources, both computed distributed (per-batch candidate
    pairs → one grouped Min → only unique aliases reach the driver):

    - lowercased last path segment of every subject IRI → that IRI;
    - every identity-predicate literal (dc:identifier, owl:sameAs) →
      lexicographically-smallest subject bearing it (ties between mirrors
      of the same entity resolve to one canonical IRI deterministically).
    """
    import pyarrow.compute as pc

    def candidate_pairs(batch: pa.Table) -> pa.Table:
        aliases: list[str] = []
        entities: list[str] = []
        mask = pc.invert(pc.starts_with(batch["subj"], pattern="_:"))
        for iri in pc.unique(batch.filter(mask)["subj"]).to_pylist():
            tail = iri.rstrip("/#").rsplit("/", 1)[-1].split("#")[-1]
            if tail:
                aliases.append(tail.lower())
                entities.append(iri)
        id_mask = pc.and_(pc.is_in(batch["pred"],
                                   value_set=pa.array(sorted(IDENTITY_PREDS))),
                          pc.equal(batch["obj_kind"], "literal"))
        idt = batch.filter(id_mask)
        for subj, value in zip(idt["subj"].to_pylist(),
                               idt["obj_value"].to_pylist()):
            if value and not subj.startswith("_:"):
                aliases.append(value.lower())
                entities.append(subj)
        return pa.table({"alias": pa.array(aliases, pa.string()),
                         "entity": pa.array(entities, pa.string())})

    pairs = triples_ds.map_batches(candidate_pairs, batch_format="pyarrow")
    # The combiner already shrank each batch to unique (alias, entity)
    # pairs; the global Min-merge runs driver-side over that combined
    # stream — the same rows would cross the wire for a groupby, minus the
    # sort.  (A corpus whose unique-alias set outgrew the driver would
    # switch to ``pairs.groupby("alias").aggregate(Min("entity"))``.)
    alias: dict[str, str] = {}
    for batch in pairs.iter_batches(batch_format="pyarrow"):
        for a, e in zip(batch["alias"].to_pylist(), batch["entity"].to_pylist()):
            prev = alias.get(a)
            if prev is None or e < prev:
                alias[a] = e
        if len(alias) > max_entities:
            break
    return alias


class EntityLinker:
    """Score mention surface forms against the broadcast alias dict.

    ``alias_ref`` may be a ``ray.ObjectRef`` (production path: one object
    store copy per node) or a plain dict (tests).
    """

    def __init__(self, alias_ref, min_score: float = 0.5):
        import ray
        self.alias = ray.get(alias_ref) if not isinstance(alias_ref, dict) else alias_ref
        self.min_score = min_score

    def _score(self, norm: str) -> tuple[str, float] | None:
        entity = self.alias.get(norm)
        if entity is not None:
            return entity, 1.0
        # fall back to token containment: longest alias that is a token of
        # the mention (cheap deterministic stand-in for a scoring model)
        best = None
        for token in norm.split():
            entity = self.alias.get(token)
            if entity is not None:
                score = len(token) / max(1, len(norm))
                if best is None or score > best[1]:
                    best = (entity, score)
        if best is not None and best[1] >= self.min_score:
            return best
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k.name: [] for k in LINKS_SCHEMA}
        for doc_id, subj, pred, surface, norm in zip(
                batch["doc_id"].to_pylist(), batch["subj"].to_pylist(),
                batch["pred"].to_pylist(), batch["surface"].to_pylist(),
                batch["norm"].to_pylist()):
            hit = self._score(norm)
            if hit is None:
                continue
            rows["doc_id"].append(doc_id)
            rows["subj"].append(subj)
            rows["pred"].append(pred)
            rows["surface"].append(surface)
            rows["entity"].append(hit[0])
            rows["score"].append(hit[1])
        return pa.table(rows, schema=LINKS_SCHEMA)


def link_entities(mentions_ds, alias_ref, concurrency: int = 4,
                  batch_size: int = 8192, min_score: float = 0.5,
                  num_cpus: float = 0.5):
    """mentions Dataset → links Dataset via an actor pool holding the dict.

    Fractional ``num_cpus``: the pool must not reserve every core
    (ray_guide: actor-pool sizing), or the pipeline deadlocks on small
    clusters.
    """
    return mentions_ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"alias_ref": alias_ref, "min_score": min_score},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=num_cpus)
