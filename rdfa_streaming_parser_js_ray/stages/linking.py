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


def alias_pairs(triples_ds):
    """Distributed (alias → lexicographically-min entity) reduction.

    Two evidence sources, combined per batch then reduced by ONE grouped
    ``Min`` exchange (the shuffle moves per-batch-distinct pairs; the
    output is one row per unique alias):

    - lowercased last path segment of every subject IRI → that IRI;
    - every identity-predicate literal (dc:identifier, owl:sameAs) →
      lexicographically-smallest subject bearing it (ties between mirrors
      of the same entity resolve to one canonical IRI deterministically).

    Returns a ``Dataset`` with columns (alias, entity) — feed it to
    :func:`build_alias_dict` (broadcast path) or keep it as the join side
    of :func:`link_entities_joined` (alias table beyond node memory).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def candidate_pairs(batch: pa.Table) -> pa.Table:
        # IRI-tail aliases, fully vectorized: unique non-bnode subjects →
        # one extract_regex for the last non-empty /#-segment (equivalent
        # to rstrip('/#') + rsplit) → lowercase
        mask = pc.invert(pc.starts_with(batch["subj"], pattern="_:"))
        subjects = pc.unique(batch.filter(mask)["subj"])
        ext = pc.extract_regex(subjects, pattern=r"(?P<tail>[^/#]+)[/#]*$")
        tails = pc.utf8_lower(pc.struct_field(ext, "tail"))
        valid = pc.is_valid(tails)
        aliases = tails.filter(valid)
        entities = subjects.filter(valid)

        # identity-predicate literals (tiny fraction of a batch)
        id_mask = pc.and_(
            pc.and_(pc.is_in(batch["pred"],
                             value_set=pa.array(sorted(IDENTITY_PREDS))),
                    pc.equal(batch["obj_kind"], "literal")),
            pc.and_(pc.invert(pc.starts_with(batch["subj"], pattern="_:")),
                    pc.not_equal(batch["obj_value"], "")))
        idt = batch.filter(id_mask)
        return pa.table({
            "alias": pa.concat_arrays([
                aliases.combine_chunks() if isinstance(aliases, pa.ChunkedArray) else aliases,
                pc.utf8_lower(idt["obj_value"]).combine_chunks()]),
            "entity": pa.concat_arrays([
                entities.combine_chunks() if isinstance(entities, pa.ChunkedArray) else entities,
                idt["subj"].combine_chunks()]),
        })

    pairs = triples_ds.map_batches(candidate_pairs, batch_format="pyarrow")
    return pairs.groupby("alias").aggregate(Min("entity", alias_name="entity"))


def build_alias_dict(triples_ds, max_entities: int = 1_000_000) -> dict[str, str]:
    """Alias dictionary for the broadcast linker, built distributed.

    The alias→entity merge runs as a grouped ``Min`` exchange on the
    cluster (:func:`alias_pairs`); the driver only collects the already
    globally-reduced result — one row per unique alias — to ``ray.put``
    it.  A corpus whose unique-alias set exceeds ``max_entities`` must
    use :func:`link_entities_joined` on the ``alias_pairs`` Dataset
    instead of broadcasting (this raises rather than truncating).
    """
    reduced = alias_pairs(triples_ds).materialize()
    n = reduced.count()
    if n > max_entities:
        raise ValueError(
            f"alias table has {n} entries (> max_entities={max_entities}); "
            "broadcast would not fit — use link_entities_joined(mentions, "
            "alias_pairs(triples)) instead")
    alias: dict[str, str] = {}
    for batch in reduced.iter_batches(batch_format="pyarrow"):
        alias.update(zip(batch["alias"].to_pylist(),
                         batch["entity"].to_pylist()))
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
        import numpy as np
        import pandas as pd

        # vectorized exact-match pass (Series.map = C hashtable probe);
        # the token-containment fallback only runs on the misses
        norm = batch["norm"].to_pandas()
        entity = norm.map(self.alias)
        score = np.where(entity.notna(), np.float32(1.0), np.float32(0.0))
        miss = entity.isna().to_numpy()
        if miss.any():
            ents = entity.to_numpy(dtype=object)
            for i in np.flatnonzero(miss):
                hit = self._score(norm.iat[i])
                if hit is not None:
                    ents[i] = hit[0]
                    score[i] = hit[1]
            entity = pd.Series(ents, index=norm.index)
        keep = entity.notna().to_numpy()
        idx = np.flatnonzero(keep)
        taken = batch.take(pa.array(idx, pa.int64()))
        return pa.table({
            "doc_id": taken["doc_id"],
            "subj": taken["subj"],
            "pred": taken["pred"],
            "surface": taken["surface"],
            "entity": pa.array(entity.to_numpy(dtype=object)[idx], pa.string()),
            "score": pa.array(score[idx], pa.float32()),
        }, schema=LINKS_SCHEMA)


def link_entities(mentions_ds, alias_ref, concurrency: int = 4,
                  batch_size: int = 32768, min_score: float = 0.5,
                  num_cpus: float = 0.5):
    """mentions Dataset → links Dataset via an actor pool holding the dict.

    Fractional ``num_cpus``: the pool must not reserve every core
    (ray_guide: actor-pool sizing), or the pipeline deadlocks on small
    clusters.  ``batch_size`` 32k: the probe kernel is ~2 µs/row, so at
    8k rows per task the per-task dispatch overhead dominated — measured
    10.5 s → 7.1 s on a 7.6M-mention stress run when raised to 32k
    (strings ~200 B/row → ~6 MB/batch, far under worker heap budget).
    """
    return mentions_ds.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"alias_ref": alias_ref, "min_score": min_score},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=num_cpus)


def link_entities_joined(mentions_ds, alias_pairs_ds,
                         num_buckets: int | None = None,
                         token_fallback: bool = False,
                         min_score: float = 0.5):
    """Entity linking when the alias table is too large to broadcast.

    Partitioned hash join of mention probes against the distributed
    (alias, entity) table — no driver dict, no per-node copy of the
    table.  Default is exact-norm matches only (score 1.0, one exchange).

    ``token_fallback=True`` restores the broadcast
    :class:`EntityLinker`'s partial-match recall in joined mode: each
    mention additionally probes with its whitespace tokens (scored
    ``len(token)/len(norm)``, pre-filtered at ``min_score`` so the probe
    explosion only carries viable tokens), and a second bucketed exchange
    picks the best match per mention occurrence — exact match first,
    then highest token score, ties to the earliest token, mirroring the
    broadcast scorer.  Cost: probe side grows by the number of viable
    tokens per mention, plus one extra exchange for best-of selection —
    the price of not silently losing recall when a corpus outgrows the
    broadcast threshold.
    """
    import numpy as np
    import pandas as pd

    from .joins import hash_join

    uid_cols = ["doc_id", "subj", "pred", "surface", "start"]

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        if "start" not in batch.columns:  # occurrence key, 0 when absent
            batch = batch.assign(start=0)
        base = batch[["doc_id", "subj", "pred", "surface", "norm", "start"]] \
            .reset_index(drop=True)
        exact = base.assign(_w=np.float32(1.0), _pos=np.int32(-1)) \
                    .rename(columns={"norm": "alias"})
        if not token_fallback:
            return exact
        toks = base["norm"].str.split()
        n_tok = toks.str.len().to_numpy()
        rep = base.loc[base.index.repeat(n_tok)].reset_index(drop=True)
        flat = toks.explode().dropna().reset_index(drop=True)
        pos = np.concatenate([np.arange(k, dtype=np.int32) for k in n_tok]) \
            if len(rep) else np.empty(0, dtype=np.int32)
        w = (flat.str.len().to_numpy(dtype=np.float32)
             / np.maximum(rep["norm"].str.len().to_numpy(), 1))
        tok_probe = rep.assign(alias=flat.to_numpy(), _w=w.astype(np.float32),
                               _pos=pos).drop(columns=["norm"])
        # only viable fallbacks cross the exchange (and self-token probes
        # duplicate the exact probe — selection keeps the exact row first)
        tok_probe = tok_probe[tok_probe["_w"] >= min_score]
        return pd.concat([exact, tok_probe], ignore_index=True)

    joined = hash_join(mentions_ds.map_batches(probe, batch_format="pandas"),
                       alias_pairs_ds, on="alias", num_buckets=num_buckets)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id", "subj", "pred", "surface", "entity"]].copy()
        out["score"] = batch["_w"].astype("float32")
        return out

    if not token_fallback:
        return joined.map_batches(finish, batch_format="pandas")

    nb = num_buckets or 64

    def add_ubucket(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch[uid_cols],
                                       index=False).to_numpy()
        batch["_ub"] = (h % np.uint64(nb)).astype("int32")
        return batch

    def best_per_mention(group: pd.DataFrame) -> pd.DataFrame:
        # 'entity' is the final tiebreak: a pairs table mapping one
        # alias to several entities would otherwise pick whichever row
        # arrived first in the bucket — nondeterministic across block
        # layouts and retries
        g = group.sort_values(uid_cols + ["_w", "_pos", "entity"],
                              ascending=[True] * len(uid_cols)
                              + [False, True, True])
        g = g.drop_duplicates(uid_cols, keep="first")
        return finish(g)

    return joined.map_batches(add_ubucket, batch_format="pandas") \
        .groupby("_ub").map_groups(best_per_mention, batch_format="pandas")
