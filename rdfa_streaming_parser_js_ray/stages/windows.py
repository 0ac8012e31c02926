"""Windowed aggregation over the events stream table.

Ray Data has no event-time watermarks (ray_guide: streaming-shaped
workloads); tumbling windows are expressed as ``window = floor(ts)`` +
pre-aggregated groupby.  Ordering assumption: none needed for tumbling
counts/sums (commutative); session windows sort within groups.
"""

from __future__ import annotations

import pandas as pd


def tumbling_window_agg(events_ds, window: str = "1h",
                        key_col: str = "event_type", ts_col: str = "ts",
                        value_col: str = "value"):
    """(key, window_start) → n_events, sum_value, avg_value.

    Per-batch partial aggregation first (combiner), then a global groupby
    over partials — the shuffle carries one row per (key, window) per
    batch.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[key_col, ts_col, value_col]].copy()
        batch["window_start"] = batch[ts_col].dt.floor(window)
        grouped = batch.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum"))
        return grouped

    partials = events_ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["avg_value"] = (batch["sum_value"] / batch["n_events"]).round(6)
        batch["sum_value"] = batch["sum_value"].round(6)
        return batch
    return out.map_batches(finish, batch_format="pandas")


def sliding_window_agg(events_ds, size: str = "2h", hop: str = "1h",
                       key_col: str = "event_type", ts_col: str = "ts",
                       value_col: str = "value"):
    """Sliding (hopping) windows: aggregates over windows of ``size``
    whose starts advance by ``hop`` (``size`` must be an integer multiple
    of ``hop``).  Each event belongs to exactly k = size/hop windows —
    expressed as a vectorized k-way explode inside the combiner (numpy
    tile/repeat, no per-row loop), partial-aggregated per
    (key, window_start) per batch, then ONE grouped exchange over the
    partials.  The shuffle carries k rows per (key, window) per batch —
    the same bounded shape as the tumbling combiner, scaled by k.

    Returns (key, window_start, n_events, sum_value) with window_start =
    the window's inclusive start.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    size_td, hop_td = pd.Timedelta(size), pd.Timedelta(hop)
    k, rem = divmod(size_td.value, hop_td.value)
    if rem or k < 1:
        raise ValueError(f"size {size!r} must be a positive integer "
                         f"multiple of hop {hop!r}")
    k = int(k)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        base = batch[ts_col].dt.floor(hop)
        n = len(batch)
        offsets = (np.arange(k, dtype=np.int64)
                   * hop_td.value).astype("timedelta64[ns]")
        starts = np.tile(base.to_numpy(), k) - np.repeat(offsets, n)
        exploded = pd.DataFrame({
            key_col: np.tile(batch[key_col].to_numpy(), k),
            "window_start": starts,
            value_col: np.tile(batch[value_col].to_numpy(), k)})
        return exploded.groupby([key_col, "window_start"], as_index=False).agg(
            n_events=(value_col, "size"), sum_value=(value_col, "sum"))

    partials = events_ds.map_batches(partial, batch_format="pandas")
    return partials.groupby([key_col, "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"))


def props_field_stats(events_ds, field: str = "k",
                      key_col: str = "event_type",
                      props_col: str = "props"):
    """Extract an integer field from a JSON-string properties column
    (vectorized C-regex ``str.extract`` — no per-row json.loads) and roll
    it up per key, combiner-first: per-batch partial (n, sum, min, max)
    per key, then ONE grouped exchange over the partials.  Returns
    (key, n_events, sum_<field>, min_<field>, max_<field>) — the
    semi-structured-sidecar shape (event props, request metadata) every
    log pipeline needs without a full JSON parse.
    """
    import re

    from ray.data.aggregate import Max, Min, Sum

    pat = re.compile(rf'"{re.escape(field)}"\s*:\s*(-?\d+)')

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[props_col].str.extract(pat, expand=False)
        b = pd.DataFrame({key_col: batch[key_col].to_numpy(),
                          "v": v.to_numpy()})
        b = b[b["v"].notna()]
        b["v"] = b["v"].astype("int64")
        return b.groupby(key_col, as_index=False).agg(
            _n=("v", "size"), _s=("v", "sum"),
            _mn=("v", "min"), _mx=("v", "max"))

    partials = events_ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(key_col).aggregate(
        Sum("_n", alias_name="n_events"),
        Sum("_s", alias_name=f"sum_{field}"),
        Min("_mn", alias_name=f"min_{field}"),
        Max("_mx", alias_name=f"max_{field}"))


def sessionize(events_ds, gap_minutes: float = 30.0,
               key_col: str = "user_id", ts_col: str = "ts",
               num_buckets: int | None = None):
    """Session windows per key: sort within partition + vectorized
    gap-split across ALL keys of the partition at once.

    Keys are hash-bucketed into ``num_buckets`` uniform groups (so the
    exchange has a bounded number of groups and one vectorized pandas
    pass handles thousands of users — no Python call per key, the
    round-1 shape).  Partitioning assumption: all events of one key land
    in one bucket (hash of the key guarantees it).
    ``num_buckets=None`` derives the count from the (metadata-cheap)
    event count at ~50k events per bucket, so a 10× stream gets ~10×
    buckets and each bucket's in-memory sort stays bounded; fallback 256.
    Returns (user_id, session_id, session_start, session_end, n_events).
    """
    from .joins import _bucket_of, auto_buckets

    if num_buckets is None:
        num_buckets = auto_buckets(events_ds, rows_per_bucket=50_000,
                                   fallback=256)

    gap = pd.Timedelta(minutes=gap_minutes)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[key_col, ts_col]].copy()
        batch["_bucket"] = _bucket_of(batch[key_col], num_buckets)
        return batch

    def bucket_sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col])
        # a session break is a key change OR a gap beyond the threshold
        brk = (g[key_col] != g[key_col].shift()) | (g[ts_col].diff() > gap)
        sess = brk.cumsum()
        agg = g.groupby(sess).agg(
            **{key_col: (key_col, "first")},
            session_start=(ts_col, "min"), session_end=(ts_col, "max"),
            n_events=(ts_col, "size")).reset_index(drop=True)
        agg["session_id"] = agg.groupby(key_col).cumcount()
        return agg[[key_col, "session_id", "session_start", "session_end",
                    "n_events"]]

    return events_ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_bucket").map_groups(bucket_sessions, batch_format="pandas")


def rolling_per_key(events_ds, k: int = 3,
                    key_col: str = "user_id", ts_col: str = "ts",
                    order_col: str = "event_id", value_col: str = "value",
                    num_buckets: int | None = None):
    """Per-key ordered rolling features: previous value (lag 1) and the
    rolling sum/count of the last ``k`` events including the current one
    — the classic event-featurization shape (SQL: LAG / SUM OVER ROWS
    BETWEEN k-1 PRECEDING AND CURRENT ROW).

    Same partitioning shape as :func:`sessionize`: keys hash-bucket into
    a bounded number of uniform groups (all rows of one key land in one
    bucket), ONE grouped exchange, then one vectorized pandas pass per
    bucket — sort by (key, order), per-key lag via a key-change-masked
    shift, rolling sum via pandas' C-implemented grouped rolling.  The
    rolling sum is computed on integer cents (round(value*100)) so the
    result is exact-integer and engine-independent (same discipline as
    tfidf/quantize).  Ordering ties break on ``order_col`` for
    determinism.  Returns (key, order, prev_value, roll_sum_cents,
    roll_n).
    """
    import numpy as np

    from .joins import _bucket_of, auto_buckets

    if num_buckets is None:
        num_buckets = auto_buckets(events_ds, rows_per_bucket=50_000,
                                   fallback=256)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[key_col, ts_col, order_col, value_col]].copy()
        batch["_bucket"] = _bucket_of(batch[key_col], num_buckets)
        return batch

    def bucket_roll(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, order_col]) \
            .reset_index(drop=True)
        key_change = g[key_col] != g[key_col].shift()
        prev = g[value_col].shift()
        prev[key_change] = np.nan
        cents = np.rint(g[value_col].to_numpy() * 100).astype("int64")
        g["_cents"] = cents
        rolled = g.groupby(key_col, sort=False)["_cents"] \
            .rolling(k, min_periods=1)
        out = pd.DataFrame({
            key_col: g[key_col],
            order_col: g[order_col],
            "prev_value": prev,
            "roll_sum_cents": rolled.sum().to_numpy().astype("int64"),
            "roll_n": rolled.count().to_numpy().astype("int32"),
        })
        return out

    return events_ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_bucket").map_groups(bucket_roll, batch_format="pandas")


def time_range_sum_per_key(ds, key_col: str = "user_id",
                           ts_col: str = "ts", value_col: str = "value",
                           window: str = "1h",
                           num_buckets: int | None = None):
    """Per-key TIME-range trailing window (SQL ``SUM(...) OVER (PARTITION
    BY key ORDER BY ts RANGE BETWEEN INTERVAL window PRECEDING AND
    CURRENT ROW)``): for each distinct (key, ts), the sum/count of
    values with ts' ∈ [ts − window, ts] for the same key.

    The RANGE frame differs from :func:`rolling_per_key`'s ROWS frame in
    both directions: it reaches back by TIME (sparse streams see few
    rows, bursts see many) and it includes ALL peers of the current
    timestamp.  Peer inclusion is what makes a naive per-row pandas
    ``rolling`` wrong under duplicate timestamps (it only sees rows up
    to the current POSITION), so rows first collapse to one row per
    (key, ts) — which also makes the output well-defined — and the
    time-based grouped rolling (``closed='both'``, matching SQL's
    inclusive ``>= ts − window``) runs on the collapsed series.

    Same distribution shape as the other per-key windows: ONE bucketed
    exchange, vectorized pandas per bucket.  Values sum as integer
    cents, but pandas' time-based Rolling.sum computes in float64, so
    exactness holds while every trailing-window sum stays under 2⁵³
    cents (~$90T per key-window) — the realistic bound; a corpus past
    it needs the int64 cumsum construction running_per_key uses.
    Returns (key, ts, range_sum_cents, range_n).
    """
    import numpy as np

    from .joins import _bucket_of, auto_buckets

    if num_buckets is None:
        num_buckets = auto_buckets(ds, rows_per_bucket=50_000,
                                   fallback=256)
    gap = pd.Timedelta(window)

    def collapse(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame({
            key_col: batch[key_col],
            ts_col: batch[ts_col],
            "_cents": np.rint(batch[value_col].to_numpy() * 100)
                        .astype("int64"),
            "_n": np.int64(1),
        })
        g = b.groupby([key_col, ts_col], as_index=False).agg(
            _cents=("_cents", "sum"), _n=("_n", "sum"))
        g["_bucket"] = _bucket_of(g[key_col], num_buckets)
        return g

    def bucket_range(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby([key_col, ts_col], as_index=False).agg(
            _cents=("_cents", "sum"), _n=("_n", "sum"))
        g = g.sort_values([key_col, ts_col]).reset_index(drop=True)
        rolled = g.groupby(key_col, sort=False) \
            .rolling(gap, on=ts_col, closed="both")
        return pd.DataFrame({
            key_col: g[key_col],
            ts_col: g[ts_col],
            "range_sum_cents": rolled["_cents"].sum()
                                 .to_numpy().astype("int64"),
            "range_n": rolled["_n"].sum().to_numpy().astype("int64"),
        })

    return ds.map_batches(collapse, batch_format="pandas") \
        .groupby("_bucket").map_groups(bucket_range, batch_format="pandas")


def running_per_key(ds, key_col: str, order_cols: list[str],
                    value_col: str, num_buckets: int | None = None):
    """Per-key UNBOUNDED running total + ordinal: for each row, its
    1-based sequence number within the key (SQL ``ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY ...)``) and the cumulative sum of
    ``value_col`` in integer cents up to and including it (``SUM(...)
    OVER (... ROWS UNBOUNDED PRECEDING)``).

    Unlike :func:`rolling_per_key` (bounded trailing-k window), the
    running frame grows without bound — but the DISTRIBUTION shape is
    identical: keys hash into a bounded number of uniform buckets (every
    row of a key lands in one bucket), ONE grouped exchange, then one
    vectorized pandas pass per bucket (sort by (key, *order_cols), a
    grouped ``cumsum``/``cumcount`` — both C kernels).  Values sum as
    integer cents so the result is exact and engine-independent.  The
    last ``order_cols`` entry must be a per-key tie-breaker (e.g. a
    unique id) for a deterministic result.

    Returns (key, last-order-col, seq, cum_cents).
    """
    import numpy as np

    from .joins import _bucket_of, auto_buckets

    if num_buckets is None:
        num_buckets = auto_buckets(ds, rows_per_bucket=50_000,
                                   fallback=256)
    cols = [key_col, *order_cols, value_col]

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[cols].copy()
        batch["_bucket"] = _bucket_of(batch[key_col], num_buckets)
        return batch

    def bucket_run(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, *order_cols]) \
            .reset_index(drop=True)
        cents = np.rint(g[value_col].to_numpy() * 100).astype("int64")
        g["_cents"] = cents
        by_key = g.groupby(key_col, sort=False)
        return pd.DataFrame({
            key_col: g[key_col],
            order_cols[-1]: g[order_cols[-1]],
            "seq": (by_key.cumcount() + 1).astype("int64"),
            "cum_cents": by_key["_cents"].cumsum().astype("int64"),
        })

    return ds.map_batches(add_bucket, batch_format="pandas") \
        .groupby("_bucket").map_groups(bucket_run, batch_format="pandas")
