"""Snapshot diff and column validation — the incremental-ingest and
data-quality gates of a production corpus pipeline.

- :func:`snapshot_diff` — compare two corpus versions by content hash
  and emit only the delta rows (added / removed / changed).  This is
  what makes re-ingest incremental at 100 TB: the downstream pipeline
  (extract → link → canonicalize) re-runs on the delta, not the corpus,
  and the partitioned-output resume machinery (pipelines/kg.py) skips
  everything else.
- :func:`validate_columns` — declarative per-column rules (not-null,
  numeric range, allowed set, regex) folded to one violations-summary
  row per rule.  A data-quality gate that reads the corpus once and
  ships only per-batch partial counts.

The reference has no counterpart (single-document parser); these are
additive training-data-layer operators per the build brief.

Scale notes: ``snapshot_diff`` projects both sides to slim
``(id, content-hash)`` rows before any exchange — the texts never
shuffle.  The outer hash-join buckets by id (polars-hashed, one
exchange over slim rows from each side); unchanged rows are dropped
inside the per-bucket merge so only the delta leaves the join stage.
``validate_columns`` is map-only plus a constant-key fold of one
partial-counts row per rule per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .dedup import _md5_hex
from .joins import auto_buckets, hash_join


def hashed_diff(old_slim, new_slim, *, id_col: str = "doc_id",
                num_buckets: int | None = None):
    """Delta classification over two slim ``(id, hash)`` datasets whose
    hash columns are named ``h_old`` / ``h_new`` → ``(id, status)`` with
    status in ``added`` / ``removed`` / ``changed``; unchanged rows are
    dropped inside the join stage.  One outer hash-join exchange."""
    # Slim (id, hash) rows inherit ONE block per upstream corpus block —
    # at any scale that is thousands of near-empty blocks whose per-task
    # fixed costs dwarf the join (measured 6.9 s → 2.1 s on 16k rows in
    # 200 blocks).  Materialize (they are ~50 B/row) and coalesce to
    # ~1M-row blocks before the exchange.
    def coalesce(ds):
        ds = ds.materialize()
        blocks = max(1, min(512, ds.count() // 1_000_000 + 1))
        return ds.repartition(blocks) if ds.num_blocks() > blocks else ds

    old_slim = coalesce(old_slim)
    new_slim = coalesce(new_slim)
    if num_buckets is None:
        num_buckets = auto_buckets(old_slim, new_slim,
                                   rows_per_bucket=500_000, fallback=64)
    joined = hash_join(old_slim, new_slim, on=id_col, how="outer",
                       num_buckets=num_buckets)

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        old_h = batch["h_old"]
        new_h = batch["h_new"]
        status = np.where(
            old_h.isna(), "added",
            np.where(new_h.isna(), "removed",
                     np.where(old_h != new_h, "changed", "unchanged")))
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(),
                            "status": status})
        return out[out["status"] != "unchanged"]

    return joined.map_batches(classify, batch_format="pandas")


def snapshot_diff(old_ds, new_ds, *, id_col: str = "doc_id",
                  text_col: str = "text", num_buckets: int | None = None):
    """Delta between two corpus snapshots → ``(doc_id, status)`` with
    status in ``added`` (id only in new), ``removed`` (id only in old),
    ``changed`` (id in both, md5(text) differs).  Unchanged rows never
    leave the join stage.

    The md5-hex content hash matches DuckDB's ``md5(text)`` so an
    oracle replays the diff exactly.
    """
    def slim(col):
        def project(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                id_col: batch[id_col].to_numpy(),
                col: [_md5_hex(t or "") for t in batch[text_col]],
            })
        return project

    old_slim = old_ds.map_batches(slim("h_old"), batch_format="pandas")
    new_slim = new_ds.map_batches(slim("h_new"), batch_format="pandas")
    return hashed_diff(old_slim, new_slim, id_col=id_col,
                       num_buckets=num_buckets)


def validate_columns(ds, rules: dict):
    """Declarative column validation: ``rules`` maps a column name to a
    dict of checks — ``not_null`` (bool), ``min`` / ``max`` (numeric,
    inclusive), ``allowed`` (iterable of values), ``regex`` (full-match
    pattern; nulls don't count twice — they are the not_null rule's
    job).  Returns one row per (column, rule): ``(col, rule,
    violations, n_rows)``.

    Map-only corpus pass; per batch ONE partial-counts row per rule
    crosses the wire, folded by a small constant-key groupby.
    """
    compiled = []
    for col, checks in rules.items():
        for rule, arg in checks.items():
            if rule == "regex":
                arg = re.compile(arg)
            elif rule == "allowed":
                arg = frozenset(arg)
            elif rule not in ("not_null", "min", "max"):
                raise ValueError(f"unknown rule {rule!r} for column {col!r}")
            compiled.append((col, rule, arg))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for col, rule, arg in compiled:
            s = batch[col]
            if rule == "not_null":
                bad = int(s.isna().sum())
            elif rule == "min":
                bad = int((s.dropna() < arg).sum())
            elif rule == "max":
                bad = int((s.dropna() > arg).sum())
            elif rule == "allowed":
                sd = s.dropna()
                bad = int((~sd.isin(arg)).sum())
            else:  # regex
                sd = s.dropna().astype(str)
                bad = int((~sd.str.fullmatch(arg)).sum())
            rows.append((col, rule, bad, len(batch)))
        return pd.DataFrame(rows,
                            columns=["col", "rule", "violations", "n_rows"])

    from ray.data.aggregate import Sum
    return ds.map_batches(partial, batch_format="pandas") \
             .groupby(["col", "rule"]) \
             .aggregate(Sum("violations", alias_name="violations"),
                        Sum("n_rows", alias_name="n_rows"))
