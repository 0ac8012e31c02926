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


def sessionize(events_ds, gap_minutes: float = 30.0,
               key_col: str = "user_id", ts_col: str = "ts"):
    """Session windows per key: sort within group, split on gaps > gap.

    Partitioning assumption: all events of one key land in one group
    (hash-partitioned groupby guarantees it).
    Returns (user_id, session_id, session_start, session_end, n_events).
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(ts_col)
        new_session = (group[ts_col].diff() > gap).cumsum()
        agg = group.groupby(new_session).agg(
            session_start=(ts_col, "min"), session_end=(ts_col, "max"),
            n_events=(ts_col, "size"))
        agg = agg.reset_index(drop=True)
        agg.insert(0, key_col, group[key_col].iloc[0])
        agg.insert(1, "session_id", range(len(agg)))
        return agg

    return events_ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
