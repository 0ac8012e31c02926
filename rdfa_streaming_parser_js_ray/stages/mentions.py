"""Mention detection — batched actor-pool stage (north-star addition).

The reference has no cross-document stages; mention detection is the first
of the KG-construction layers the north star adds on top of extraction
(BASELINE.json north_star).  It is a *stateful* stage in the Ray sense:
the pattern set is compiled once per actor in ``__init__`` and applied per
batch in ``__call__`` — the canonical actor-pool shape
(``map_batches(MentionDetector, concurrency=N)``).
"""

from __future__ import annotations

import re
from functools import lru_cache

import pyarrow as pa

MENTIONS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("surface", pa.string()),
    ("norm", pa.string()),       # normalized surface form (lookup key)
    ("start", pa.int32()),
])


class MentionDetector:
    """Detect entity-mention surface forms in literal objects.

    Heuristic (deterministic, model-free): runs of capitalized tokens, plus
    all tokens of >= min_token_len when ``lowercase_terms`` — a stand-in for
    a batched NER model; the Ray plumbing (actor pool, batch shape) is the
    real contract.
    """

    def __init__(self, min_token_len: int = 3, lowercase_terms: bool = True):
        self.cap_run = re.compile(r"(?:[A-Z][\w-]*)(?:\s+[A-Z][\w-]*)*")
        self.word = re.compile(rf"[A-Za-z][\w-]{{{min_token_len - 1},}}")
        self.lowercase_terms = lowercase_terms

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k.name: [] for k in MENTIONS_SCHEMA}
        mask = batch["obj_kind"].to_pylist()
        doc_ids = batch["doc_id"].to_pylist()
        subjs = batch["subj"].to_pylist()
        preds = batch["pred"].to_pylist()
        values = batch["obj_value"].to_pylist()
        for doc_id, subj, pred, kind, value in zip(doc_ids, subjs, preds, mask, values):
            if kind != "literal" or not value:
                continue
            seen_spans = set()
            for m in self.cap_run.finditer(value):
                seen_spans.add((m.start(), m.end()))
                rows["doc_id"].append(doc_id)
                rows["subj"].append(subj)
                rows["pred"].append(pred)
                rows["surface"].append(m.group(0))
                rows["norm"].append(m.group(0).lower())
                rows["start"].append(m.start())
            if self.lowercase_terms:
                for m in self.word.finditer(value):
                    if any(s <= m.start() < e for s, e in seen_spans):
                        continue
                    rows["doc_id"].append(doc_id)
                    rows["subj"].append(subj)
                    rows["pred"].append(pred)
                    rows["surface"].append(m.group(0))
                    rows["norm"].append(m.group(0).lower())
                    rows["start"].append(m.start())
        return pa.table(rows, schema=MENTIONS_SCHEMA)


@lru_cache(maxsize=8)
def _cached_detector(min_token_len: int, lowercase_terms: bool) -> MentionDetector:
    return MentionDetector(min_token_len=min_token_len,
                           lowercase_terms=lowercase_terms)


def detect_mentions(triples_ds, concurrency: int | None = None,
                    batch_size: int = 32768, num_cpus: float = 0.5,
                    use_actors: bool = False, **detector_kwargs):
    """triples Dataset → mentions Dataset.

    Default is a *task*-pool ``map_batches`` — the detector holds no
    broadcast state, so tasks (zero pool spin-up, patterns compiled once
    per worker process via an ``lru_cache``) beat an actor pool.  Set
    ``use_actors=True`` for the actor-pool shape (e.g. when swapping in a
    real NER model whose load cost must be amortized in ``__init__``).
    Fractional ``num_cpus`` so the stage never reserves every core and
    starves the extract/reduce stages sharing the node (ray_guide:
    actor-pool sizing).
    """
    if use_actors:
        return triples_ds.map_batches(
            MentionDetector, fn_constructor_kwargs=detector_kwargs,
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=(1, concurrency) if concurrency else None,
            num_cpus=num_cpus)

    min_token_len = detector_kwargs.get("min_token_len", 3)
    lowercase_terms = detector_kwargs.get("lowercase_terms", True)

    def detect(batch: pa.Table) -> pa.Table:
        return _cached_detector(min_token_len, lowercase_terms)(batch)

    return triples_ds.map_batches(detect, batch_format="pyarrow",
                                  batch_size=batch_size, num_cpus=num_cpus)
