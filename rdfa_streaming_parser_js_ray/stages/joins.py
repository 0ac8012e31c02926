"""Join operators (SURVEY.md §2.5).

The reference has no joins; its only lookup (prefix maps) is in-row.  The
north-star KG stages and any real pipeline need two shapes:

- ``broadcast_join``: small side ``ray.put`` once, probed per batch with a
  vectorized pandas merge inside ``map_batches`` — zero shuffle.  This is
  the same pattern the EntityLinker uses with its alias dict.
- ``hash_join``: both sides large — add ``bucket = hash(key) % B`` to both,
  co-group per bucket, merge per bucket (explicit partitioned hash join).
  Salt hot keys by widening B; buckets are uniform when the key is hashed.

Measured vs Ray 2.49's native ``Dataset.join`` (hash-shuffle aggregator
actors): 500k ⋈ 100k rows inner join on 16 CPUs — this implementation
0.61 s vs native 4.44 s (the aggregator-actor spin-up and per-partition
finalization dominate at these sizes, and the native path logs schema-
hash warnings on pandas blocks).  Revisit the native join when block
counts grow past the point where one pandas merge per bucket stops
amortizing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _rows_from_input_bytes(ds, est_row_bytes: int) -> int | None:
    """Estimated row count from the byte size of a LAZY dataset's read
    sources: walk the logical plan to its ``Read`` ops and sum each
    datasource's ``estimate_inmemory_data_size()`` (parquet file metadata
    × encoding ratio — plan-time, no execution).  None when the pipeline
    has no sized read source (e.g. ``from_pandas`` roots)."""
    try:
        from ray.data._internal.logical.operators.read_operator import Read
        total, found = 0, False
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            if isinstance(op, Read):
                sz = op._datasource.estimate_inmemory_data_size()
                if sz:
                    total += sz
                    found = True
            stack.extend(op.input_dependencies)
    except Exception:
        return None
    return int(total) // est_row_bytes + 1 if found else None


def estimate_rows(ds, est_row_bytes: int = 64) -> int | None:
    """Metadata-cheap row estimate: exact ``_meta_count()`` when the
    dataset is materialized (or its read metadata carries counts), else
    the read-source byte estimate at ``est_row_bytes`` bytes/row, else
    None.  Never executes the pipeline.  Shared by ``auto_buckets`` and
    the small-input fast-path guards (``graph_local``/``dedup_local``)."""
    try:
        n = ds._meta_count()
    except Exception:
        n = None
    if n is None:
        n = _rows_from_input_bytes(ds, est_row_bytes)
    return n


def auto_buckets(*datasets, rows_per_bucket: int, fallback: int,
                 multiplier: int = 1, minimum: int = 64,
                 maximum: int = 1 << 16, est_row_bytes: int = 64) -> int:
    """Bucket count derived from metadata-cheap input sizes, so the
    100-TB knob turns itself (a static default that is right at sf0.1
    is 1000× too coarse at corpus scale).

    Only sizes that are FREE are consulted, in preference order per
    dataset: (1) ``Dataset._meta_count()`` row counts (materialized
    datasets and reads whose metadata carries counts — None for lazy
    pipelines rather than executing them); (2) the in-memory size
    estimate of the pipeline's read sources (parquet metadata × encoding
    ratio — plan-time even under a stack of lazy transforms), converted
    to an estimated row count at ``est_row_bytes`` bytes/row — and the
    bucket count rounds to a power of two anyway, so order-of-magnitude
    is enough.
    Only when NEITHER is available is ``fallback`` returned, and callers
    at real scale should pass an explicit value.  ``multiplier`` scales
    per-row fan-out (e.g. LSH band rows per document).  Rounded up to a
    power of two for stable, uniform modulo behavior.
    """
    total, known = 0, False
    for ds in datasets:
        n = estimate_rows(ds, est_row_bytes)
        if n is not None:
            total += n
            known = True
    if not known:
        return fallback
    need = (total * multiplier) // rows_per_bucket + 1
    need = max(minimum, min(maximum, need))
    return min(maximum, 1 << (need - 1).bit_length())


def _bucket_of(key: pd.Series, num_buckets: int) -> np.ndarray:
    """Value-based bucket assignment, stable across container dtypes:
    an int64 column and an object column holding the same Python ints
    bucket identically (a merge output may carry object dtype).

    String keys hash through polars (multithreaded xxhash, seed-pinned —
    stable across processes for one pinned polars build, which is all a
    cluster runs); measured 5× the old per-row crc32 loop on 500k IRIs.
    This is the hot path of every string-keyed ``hash_join``/``anti_join``
    — including the flagship's joined-mode canonical rewrite, which
    buckets every subj/obj_value of the full triples table."""
    if key.dtype.kind in "iu":
        return (key.to_numpy() % num_buckets).astype("int32")
    vals = key.to_numpy()
    n = len(vals)
    if n and all(isinstance(v, (bool, np.bool_)) for v in vals):
        # bool keys: Python bool is an int subclass, so without this
        # branch an OBJECT column of bools took the int path while a
        # native bool-dtype column stringified through polars — equal
        # keys landed in different buckets and joins silently dropped
        # matches.  Stringify both shapes identically.
        vals = vals.astype(str)
    elif n and all(isinstance(v, (int, np.integer)) for v in vals):
        # object column holding plain ints: match the int-dtype path
        try:
            return (vals.astype(np.int64) % num_buckets).astype("int32")
        except OverflowError:
            # arbitrary-precision Python ints beyond int64: per-row
            # ``int % num_buckets`` keeps the SAME bucket function as
            # the int64 path (value mod num_buckets), so in-range ints
            # in this column still co-bucket with an int64-typed other
            # side — a stringify fallback would silently split them
            return np.fromiter((int(v) % num_buckets for v in vals),
                               dtype=np.int32, count=n)
    import polars as pl
    if vals.dtype != object:
        # non-int native dtype (float/bool/…): bucket by str value so it
        # matches an object column holding the same values
        vals = vals.astype(str)
    try:
        s = pl.Series(vals)
        if s.dtype == pl.Object:
            raise TypeError("object-typed polars series")
    except TypeError:
        # mixed-type object column: stringify so the same value buckets
        # identically whether its column is pure-string or mixed
        s = pl.Series(vals.astype(str))
    h = s.hash(seed=0).to_numpy()
    return (h % np.uint64(num_buckets)).astype("int32")


def _schema_dtypes(ds) -> dict[str, object]:
    """Column → repair-target pandas dtype from a dataset's schema
    (Arrow or pandas block schema), resolved at PLAN time so every
    bucket repairs to the same deterministic dtype instead of each one
    guessing with ``infer_objects()``."""
    import pyarrow as pa
    sch = ds.schema()
    out: dict[str, object] = {}
    for name, t in zip(sch.names, sch.types):
        if isinstance(t, pa.DataType):
            try:
                pdt = t.to_pandas_dtype()
            except (TypeError, NotImplementedError):
                out[name] = np.dtype(object)
                continue
            try:
                dt = np.dtype(pdt)
            except TypeError:
                dt = pdt       # extension dtype (e.g. tz-aware datetime)
        else:
            try:
                dt = np.dtype(t)
            except TypeError:
                # pandas extension dtype (Int64/boolean/tz-aware/...):
                # repair to ITSELF, not object — an object target would
                # actively demote a well-typed source column
                dt = t
        out[name] = dt
    return out


def _exchange_cast(batch: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
    """Cast an owning side's columns to their exchange representation:
    ints → nullable Int64/UInt64 and bools → nullable boolean (so the
    OTHER side's typed NA pad unions under the same dtype instead of
    demoting the column to object); floats/datetimes pad natively and
    everything else rides as object."""
    for c, dt in dtypes.items():
        if c not in batch.columns:
            continue
        k = getattr(batch[c].dtype, "kind", None)
        if k == "i":
            batch[c] = batch[c].astype("Int64")
        elif k == "u":
            batch[c] = batch[c].astype("UInt64")
        elif k == "b":
            batch[c] = batch[c].astype("boolean")
    return batch


def _typed_pad(index, dt) -> pd.Series:
    """An all-null Series over ``index`` in the EXCHANGE dtype of ``dt``."""
    k = getattr(dt, "kind", None)
    if k == "i":
        return pd.Series(pd.NA, index=index, dtype="Int64")
    if k == "u":
        return pd.Series(pd.NA, index=index, dtype="UInt64")
    if k == "f":
        return pd.Series(np.nan, index=index, dtype=dt)
    if k in "mM":
        return pd.Series(pd.NaT, index=index, dtype=dt)
    if k == "b":
        return pd.Series(pd.NA, index=index, dtype="boolean")
    return pd.Series([None] * len(index), index=index, dtype=object)


def _repair(df: pd.DataFrame, dtypes: dict) -> pd.DataFrame:
    """Deterministically restore a side's native dtypes after the
    exchange (Int64 → int64 etc.); a column that genuinely holds nulls
    (source data, not pad) keeps its nullable exchange dtype."""
    for c, dt in dtypes.items():
        if c in df.columns and df[c].dtype != dt:
            try:
                df[c] = df[c].astype(dt)
            except (TypeError, ValueError):
                # an int-target column that picked up nulls (outer-join
                # pads, or Ray's arrow->pandas float64 conversion of a
                # nullable int block) can't go back to int64 — keep the
                # integer semantics in the NULLABLE int dtype instead
                # of silently staying float64/object
                if getattr(dt, "kind", None) in "iu":
                    try:
                        df[c] = df[c].astype(
                            "Int64" if dt.kind == "i" else "UInt64")
                    except (TypeError, ValueError):
                        pass
    return df


_SIDE_L = np.int8(0)
_SIDE_R = np.int8(1)


class BroadcastJoiner:
    """Actor-pool stage holding the broadcast small side as a DataFrame."""

    def __init__(self, small_ref, on: str, how: str = "inner",
                 suffix: str = "_r"):
        import ray
        small = ray.get(small_ref) if not isinstance(small_ref, pd.DataFrame) \
            else small_ref
        self.small = small
        self.on = on
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how,
                           suffixes=("", self.suffix))


def broadcast_join(big_ds, small_ref, on: str, how: str = "inner",
                   concurrency: int = 4):
    """big Dataset ⋈ broadcast small DataFrame on one key column."""
    return big_ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(small_ref=small_ref, on=on, how=how),
        batch_format="pandas", concurrency=concurrency, num_cpus=0.5)


def _bucketed(ds, on: str, num_buckets: int, side: np.int8):
    def add(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = _bucket_of(batch[on], num_buckets)
        batch["_side"] = side
        return batch
    return ds.map_batches(add, batch_format="pandas")


def _aligned_union(left_ds, right_ds, on: str, num_buckets: int,
                   rename: dict, all_cols: list,
                   pad_dtypes: dict):
    """The shared exchange shape of every bucketed join: both sides cast
    to one typed superset schema (int8 ``_side``, nullable-typed NA pads
    from ``pad_dtypes`` instead of object-demoting ``pd.NA``), bucketed
    on hash(``on``), unioned.  A consistent schema across the union's
    branches keeps every column out of object dtype, shrinks the
    exchange, and silences the per-block PandasBlockSchema warnings the
    old untyped pad produced."""
    def align(side: np.int8):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            if side == _SIDE_R:
                batch = batch.rename(columns=rename)
            bucket = _bucket_of(batch[on], num_buckets)
            batch = _exchange_cast(batch, pad_dtypes)
            for c in all_cols:
                if c not in batch.columns:
                    batch[c] = _typed_pad(batch.index, pad_dtypes[c])
            batch["_bucket"] = bucket
            batch["_side"] = side
            return batch[all_cols + ["_bucket", "_side"]]
        return f

    return left_ds.map_batches(align(_SIDE_L), batch_format="pandas") \
        .union(right_ds.map_batches(align(_SIDE_R), batch_format="pandas"))


def hash_join(left_ds, right_ds, on: str, how: str = "inner",
              num_buckets: int | None = None):
    """Partitioned hash join: both sides bucketed on hash(key), unioned
    under an aligned superset schema, co-grouped per bucket, merged per
    bucket with vectorized pandas.

    One all-to-all exchange total (the bucket groupby over the union);
    each bucket's merge is in-memory — size buckets so
    |left_bucket| + |right_bucket| fits a worker (num_buckets is the
    salt knob for hot keys).  ``num_buckets=None`` derives the count
    from metadata-cheap input sizes (:func:`auto_buckets`), falling back
    to 64 when neither side's size is free to know.
    """
    if num_buckets is None:
        num_buckets = auto_buckets(left_ds, right_ds,
                                   rows_per_bucket=131_072, fallback=64)
    left_dt = _schema_dtypes(left_ds)
    right_dt = _schema_dtypes(right_ds)
    left_cols = list(left_dt)
    right_cols = list(right_dt)
    # right-side non-key columns that clash with left names get suffixed
    rename = {c: c + "_r" for c in right_cols if c != on and c in left_cols}
    right_out = [rename.get(c, c) for c in right_cols]
    all_cols = left_cols + [c for c in right_out if c not in left_cols]
    pad_dtypes = {**{rename.get(c, c): dt for c, dt in right_dt.items()},
                  **left_dt}
    right_repair = {rename.get(c, c): dt for c, dt in right_dt.items()}

    both = _aligned_union(left_ds, right_ds, on, num_buckets, rename,
                          all_cols, pad_dtypes)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        left = _repair(group.loc[side == _SIDE_L, left_cols].copy(), left_dt)
        right = _repair(group.loc[side == _SIDE_R, right_out].copy(),
                        right_repair)
        return left.merge(right, on=on, how=how)

    return both.groupby("_bucket").map_groups(merge_bucket, batch_format="pandas")


def asof_join(left_ds, right_ds, on: str, left_ts: str, right_ts: str,
              direction: str = "backward", tiebreak: str | None = None,
              num_buckets: int | None = None):
    """Partitioned as-of join: for each left row, attach the single right
    row with the same key whose ``right_ts`` is the latest at-or-before
    ``left_ts`` (``direction="backward"``; "forward" = earliest
    at-or-after).  Ray Data has no native temporal join; this is the
    composition the guide prescribes — hash-bucket both sides on the key
    (one all-to-all exchange), then a vectorized per-bucket
    ``pandas.merge_asof``.

    Left rows with no qualifying right row keep NA right columns (i.e.
    a LEFT as-of join, matching DuckDB's ``ASOF LEFT JOIN``).  When
    several right rows share the qualifying timestamp, ``tiebreak`` (a
    right column) makes the pick deterministic without pre-reducing the
    right side: ``merge_asof`` takes the LAST duplicate for
    ``backward`` (greatest tiebreak wins) and the FIRST for ``forward``
    (smallest tiebreak wins).  Left unset, the pick is whichever
    duplicate sorts last/first in the bucket — nondeterministic.
    Partitioning assumption: all rows of one key land in one bucket
    (hash of the key guarantees it); per-bucket memory is
    |left_bucket| + |right_bucket| — ``num_buckets`` is the salt knob.
    ``left_ts`` and ``right_ts`` must be distinct names of comparable
    dtype (both timestamps or both numerics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    if num_buckets is None:
        num_buckets = auto_buckets(left_ds, right_ds,
                                   rows_per_bucket=131_072, fallback=64)
    left_dt = _schema_dtypes(left_ds)
    right_dt = _schema_dtypes(right_ds)
    left_cols = list(left_dt)
    right_cols = list(right_dt)
    rename = {c: c + "_r" for c in right_cols
              if c not in (on, right_ts) and c in left_cols}
    right_out = [rename.get(c, c) for c in right_cols]
    all_cols = left_cols + [c for c in right_out if c not in left_cols]
    pad_dtypes = {**{rename.get(c, c): dt for c, dt in right_dt.items()},
                  **left_dt}
    right_repair = {rename.get(c, c): dt for c, dt in right_dt.items()}

    both = _aligned_union(left_ds, right_ds, on, num_buckets, rename,
                          all_cols, pad_dtypes)
    out_cols = left_cols + [c for c in right_out if c != on]

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        left = _repair(group.loc[side == _SIDE_L, left_cols].copy(),
                       left_dt).sort_values(left_ts, kind="mergesort")
        rsort = [right_ts] if tiebreak is None \
            else [right_ts, rename.get(tiebreak, tiebreak)]
        right = _repair(
            group.loc[side == _SIDE_R,
                      [c for c in right_out if c != on] + [on]].copy(),
            right_repair).sort_values(rsort, kind="mergesort")
        if not len(left):
            return pd.DataFrame(columns=out_cols)
        # a one-sided bucket can leave a repaired column nullable-typed;
        # merge_asof requires exact dtype agreement between the sides
        for col, ref in ((right_ts, left_ts), (on, on)):
            if right[col].dtype != left[ref].dtype:
                right[col] = right[col].astype(left[ref].dtype)
        merged = pd.merge_asof(left, right, left_on=left_ts,
                               right_on=right_ts, by=on,
                               direction=direction)
        return merged[out_cols]

    return both.groupby("_bucket").map_groups(merge_bucket,
                                              batch_format="pandas")


def range_join(left_ds, right_ds, on: str, ts_col: str, lo_col: str,
               hi_col: str, num_buckets: int | None = None):
    """Key-equality + interval-containment join: every (left, right) pair
    with the same key and ``right.lo <= left.ts <= right.hi``.

    Same single-exchange bucketed shape as :func:`hash_join`; per bucket
    the key-equality merge runs vectorized and the interval predicate is
    one boolean mask.  Output size is bounded by the per-key match
    product, NOT the bucket product — the merge only pairs rows sharing a
    key.  For band predicates without a key, derive a coarse bucket from
    the interval (e.g. ``floor(lo / band)``) and pass it as ``on``.
    """
    if num_buckets is None:
        num_buckets = auto_buckets(left_ds, right_ds,
                                   rows_per_bucket=131_072, fallback=64)
    left_dt = _schema_dtypes(left_ds)
    right_dt = _schema_dtypes(right_ds)
    left_cols = list(left_dt)
    right_cols = list(right_dt)
    rename = {c: c + "_r" for c in right_cols if c != on and c in left_cols}
    right_out = [rename.get(c, c) for c in right_cols]
    lo = rename.get(lo_col, lo_col)
    hi = rename.get(hi_col, hi_col)
    all_cols = left_cols + [c for c in right_out if c not in left_cols]
    pad_dtypes = {**{rename.get(c, c): dt for c, dt in right_dt.items()},
                  **left_dt}
    right_repair = {rename.get(c, c): dt for c, dt in right_dt.items()}

    both = _aligned_union(left_ds, right_ds, on, num_buckets, rename,
                          all_cols, pad_dtypes)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        left = _repair(group.loc[side == _SIDE_L, left_cols].copy(), left_dt)
        right = _repair(group.loc[side == _SIDE_R, right_out].copy(),
                        right_repair)
        merged = left.merge(right, on=on, how="inner")
        mask = (merged[ts_col] >= merged[lo]) & (merged[ts_col] <= merged[hi])
        return merged[mask]

    return both.groupby("_bucket").map_groups(merge_bucket,
                                              batch_format="pandas")


def anti_join(left_ds, right_ds, on: str, right_on: str | None = None,
              num_buckets: int | None = None):
    """left rows with NO key match in right — partitioned hash anti-join.

    Same single-exchange shape as :func:`hash_join` (bucket both sides on
    hash(key), co-group, filter per bucket); the right side is projected
    to its distinct keys before the exchange, so the shuffle moves
    left + unique-right-keys only.  This is the scale path for "drop this
    id set" when the set is not guaranteed to fit a broadcast.
    ``num_buckets=None`` → :func:`auto_buckets` over both sides.
    """
    return _key_filter_join(left_ds, right_ds, on, right_on, num_buckets,
                            keep_matches=False)


def semi_join(left_ds, right_ds, on: str, right_on: str | None = None,
              num_buckets: int | None = None):
    """left rows WITH at least one key match in right (each emitted once,
    never multiplied by right-side multiplicity) — partitioned hash
    semi-join, the complement of :func:`anti_join` with the identical
    slim-exchange shape: left + unique-right-keys only move."""
    return _key_filter_join(left_ds, right_ds, on, right_on, num_buckets,
                            keep_matches=True)


def _key_filter_join(left_ds, right_ds, on, right_on, num_buckets,
                     keep_matches: bool):
    if num_buckets is None:
        num_buckets = auto_buckets(left_ds, right_ds,
                                   rows_per_bucket=131_072, fallback=64)
    right_on = right_on or on
    left_dt = _schema_dtypes(left_ds)
    left_cols = list(left_dt)

    def align_l(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        bucket = _bucket_of(batch[on], num_buckets)
        batch = _exchange_cast(batch, left_dt)
        batch["_bucket"] = bucket
        batch["_side"] = _SIDE_L
        return batch[left_cols + ["_bucket", "_side"]]

    def align_r(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({on: batch[right_on].drop_duplicates()
                            .reset_index(drop=True)})
        bucket = _bucket_of(out[on], num_buckets)
        out = _exchange_cast(out, {on: left_dt[on]})
        for c in left_cols:
            if c not in out.columns:
                out[c] = _typed_pad(out.index, left_dt[c])
        out["_bucket"] = bucket
        out["_side"] = _SIDE_R
        return out[left_cols + ["_bucket", "_side"]]

    both = left_ds.map_batches(align_l, batch_format="pandas").union(
        right_ds.map_batches(align_r, batch_format="pandas"))

    def filter_bucket(group: pd.DataFrame) -> pd.DataFrame:
        side = group["_side"].to_numpy()
        keys = group.loc[side == _SIDE_R, on]
        left = group.loc[side == _SIDE_L, left_cols]
        hit = left[on].isin(set(keys.dropna()))
        return _repair(left[hit if keep_matches else ~hit].copy(),
                       left_dt)

    return both.groupby("_bucket").map_groups(filter_bucket,
                                              batch_format="pandas")


def bucketed_fold(ds, key_cols, fold, num_buckets: int = 64):
    """Grouped reduction routed through an INT hash bucket of the key:
    per-batch rows get ``_gb = hash(key) % num_buckets`` and ONE
    ``groupby("_gb").map_groups`` runs the caller's vectorized pandas
    ``fold`` per bucket (the fold sees all rows of every key that
    hashes into its bucket, ``_gb`` already dropped).

    Why: Ray's sort-based groupby on STRING keys costs ~10× a bucketed
    fold at node-table sizes (measured 15.8 s → 1.5 s for a 60k-row
    distinct on one string pair key) — sorting long keys across blocks
    dominates.  Callers must make ``fold`` a per-key-correct reduction
    (e.g. a pandas ``groupby(key).agg`` or ``drop_duplicates``), since
    a bucket holds MANY keys.  ``key_cols`` may be multiple columns;
    they join with an unambiguous separator before hashing.
    """
    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def add(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        k = batch[cols[0]].astype(str)
        for c in cols[1:]:
            k = k + "\x1f" + batch[c].astype(str)
        batch["_gb"] = _bucket_of(k, num_buckets)
        return batch

    def run(group: pd.DataFrame) -> pd.DataFrame:
        return fold(group.drop(columns="_gb"))

    return ds.map_batches(add, batch_format="pandas") \
             .groupby("_gb").map_groups(run, batch_format="pandas")


def interval_join(left_ds, right_ds, *, l_lo: str, l_hi: str,
                  r_lo: str, r_hi: str, bucket_width: float,
                  max_span_buckets: int = 1024):
    """KEYLESS interval-overlap join: every (left, right) pair whose
    numeric intervals overlap (``l_lo < r_hi AND r_lo < l_hi``,
    half-open), with no equality key to bucket on.

    Partitioning assumption (the one to document at 100 TB): the value
    axis is cut into ranges of ``bucket_width`` and each interval
    replicates into every range it touches — pick ``bucket_width`` near
    the median interval span so the replication factor stays ~2; an
    interval spanning more than ``max_span_buckets`` ranges raises
    instead of silently fanning out.  A pair overlapping in several
    ranges is emitted ONLY in the canonical range containing
    ``max(l_lo, r_lo)`` (the classic spatial-join dedup trick), so no
    dedup exchange is needed: one fan-out map per side, ONE grouped
    exchange, a vectorized per-bucket merge + masks.

    Both bound columns must be numeric (convert timestamps to epoch
    seconds first).  Returns all left columns + right columns (right
    names suffixed ``_r`` on collision).
    """
    import numpy as np
    import pandas as pd

    w = float(bucket_width)
    left_dt = _schema_dtypes(left_ds)
    right_dt = _schema_dtypes(right_ds)
    left_cols = list(left_dt)
    right_cols = list(right_dt)
    rename = {c: c + "_r" for c in right_cols if c in left_cols}
    out_r_lo = rename.get(r_lo, r_lo)
    out_r_hi = rename.get(r_hi, r_hi)
    out_right_cols = [rename.get(c, c) for c in right_cols]
    all_cols = left_cols + [c for c in out_right_cols
                            if c not in left_cols]
    pad_dtypes = {**{rename.get(c, c): dt for c, dt in right_dt.items()},
                  **left_dt}
    right_repair = {rename.get(c, c): dt for c, dt in right_dt.items()}

    def fan_out(lo_col: str, hi_col: str, side: np.int8):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            if side == _SIDE_R:
                batch = batch.rename(columns=rename)
            lo = batch[lo_col].to_numpy(dtype="float64")
            hi = batch[hi_col].to_numpy(dtype="float64")
            b0 = np.floor(lo / w).astype(np.int64)
            b1 = np.floor(hi / w).astype(np.int64)  # half-open: hi==edge
            b1 = np.maximum(b0, np.where(hi / w == b1, b1 - 1, b1))
            counts = (b1 - b0 + 1)
            if counts.max(initial=1) > max_span_buckets:
                raise ValueError(
                    f"interval spans {counts.max()} buckets "
                    f"(> max_span_buckets={max_span_buckets}); raise "
                    f"bucket_width")
            rep = batch.loc[batch.index.repeat(counts)].reset_index(drop=True)
            offs = np.concatenate([np.arange(c) for c in counts]) \
                if len(counts) else np.empty(0, dtype=np.int64)
            rep = _exchange_cast(rep, pad_dtypes)
            for c in all_cols:
                if c not in rep.columns:
                    rep[c] = _typed_pad(rep.index, pad_dtypes[c])
            rep["_bucket"] = np.repeat(b0, counts) + offs
            rep["_side"] = side
            return rep[all_cols + ["_bucket", "_side"]]
        return f

    lds = left_ds.map_batches(fan_out(l_lo, l_hi, _SIDE_L),
                              batch_format="pandas")
    rds = right_ds.map_batches(fan_out(out_r_lo, out_r_hi, _SIDE_R),
                               batch_format="pandas")

    def bucket_merge(group: pd.DataFrame) -> pd.DataFrame:
        bucket = int(group["_bucket"].iloc[0])
        side = group["_side"].to_numpy()
        lg = _repair(group.loc[side == _SIDE_L, left_cols].copy(), left_dt)
        rg = _repair(group.loc[side == _SIDE_R, out_right_cols].copy(),
                     right_repair)
        if not len(lg) or not len(rg):
            # zero-row but correctly TYPED frame (a dtype-less empty
            # frame makes the cross-block concat promote ints to float)
            return lg.iloc[:0].merge(rg.iloc[:0], how="cross")
        m = lg.merge(rg, how="cross")
        lo_max = np.maximum(m[l_lo].to_numpy(dtype="float64"),
                            m[out_r_lo].to_numpy(dtype="float64"))
        overlap = (m[l_lo].to_numpy(dtype="float64")
                   < m[out_r_hi].to_numpy(dtype="float64")) \
            & (m[out_r_lo].to_numpy(dtype="float64")
               < m[l_hi].to_numpy(dtype="float64"))
        canonical = np.floor(lo_max / w).astype(np.int64) == bucket
        return m[overlap & canonical]

    return lds.union(rds).groupby("_bucket") \
        .map_groups(bucket_merge, batch_format="pandas")
