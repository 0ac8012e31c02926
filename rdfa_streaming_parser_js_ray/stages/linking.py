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


def build_alias_dict(triples_ds, max_entities: int = 1_000_000) -> dict[str, str]:
    """Derive a deterministic alias dictionary from the corpus's subject IRIs.

    alias (lowercased last IRI path segment) → entity IRI.  The distinct-IRI
    set is computed distributed (per-batch set reduction, then a small
    driver-side merge) — only unique IRIs ever reach the driver.
    """
    def distinct_subjects(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.invert(pc.starts_with(batch["subj"], pattern="_:"))
        iris = pc.unique(batch.filter(mask)["subj"])
        return pa.table({"subj": iris})

    uniq = triples_ds.map_batches(distinct_subjects, batch_format="pyarrow") \
                     .unique("subj")
    alias: dict[str, str] = {}
    for iri in sorted(uniq)[:max_entities]:
        tail = iri.rstrip("/#").rsplit("/", 1)[-1].split("#")[-1]
        if tail:
            alias.setdefault(tail.lower(), iri)
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
        concurrency=concurrency, num_cpus=num_cpus)
