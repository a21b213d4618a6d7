"""Event-time windowed aggregation operators (SURVEY.md §2.9: the Ray
Data expression of streaming windows over a bounded event table).

- ``tumbling_agg``: fixed-width event-time windows as
  groupby(key, window_id) with a per-batch pyarrow combiner in front of
  the exchange (partials move, not rows).
- ``sessionize``: per-key session windows split on inactivity gaps —
  one output row PER SESSION (key, session_id, n_events, start/end ts) —
  expressed as groupby(key).map_groups over ts-sorted groups (the
  ray_guide 'streaming-shaped workloads' pattern).  Partitioning
  assumption: one key's events fit in one group (true for bounded user
  histories; a hot key would need a time-bucketed pre-split).
- ``session_summary``: per-key rollup of ``sessionize`` output
  (n_sessions, max_session_events) — the shape of the driver's
  ``events_sessions`` query.
- ``rolling_agg``: per-key row-based rolling mean + inter-event gap
  (the SQL ``ROWS BETWEEN n-1 PRECEDING`` window shape), same
  per-key-group execution and partitioning assumption as ``sessionize``.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd


def tumbling_agg(
    ds: rd.Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width_us: int = 3_600_000_000,
) -> rd.Dataset:
    """(key, window_id, n, sum_value) per fixed event-time window.

    window_id = epoch_us(ts) // width_us.  The per-batch pyarrow combiner
    shrinks the exchange to one partial row per (key, window) per batch.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # normalize the timestamp unit (parquet gives us, from_items gives s)
        ts_us = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        wins = ts_us.to_numpy(zero_copy_only=False) // width_us
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "window_id": pa.array(wins, pa.int64()),
                value_col: batch.column(value_col),
            }
        )
        return t.group_by([key_col, "window_id"]).aggregate(
            [(value_col, "count"), (value_col, "sum")]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby([key_col, "window_id"])
        .aggregate(Sum(f"{value_col}_count", alias_name="n"),
                   Sum(f"{value_col}_sum", alias_name="sum_value"))
    )


def hopping_agg(
    ds: rd.Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
) -> rd.Dataset:
    """Hopping (sliding) event-time windows: width ``width_us``, advancing
    by ``hop_us`` — each event lands in exactly ``width_us // hop_us``
    overlapping windows, identified by their start ``window_start`` (epoch
    us).  Emits (key, window_start, n, sum_value).

    Same shape as ``tumbling_agg``: the replication happens INSIDE the
    per-batch combiner (np.repeat/np.tile, vectorized), which then
    pre-aggregates, so the exchange still moves one partial row per
    (key, window) per batch — never ``fan x n_rows`` raw rows.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    if width_us % hop_us:
        raise ValueError("width_us must be a multiple of hop_us")
    fan = width_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        base = ts_us.to_numpy(zero_copy_only=False) // hop_us
        # windows containing ts: starts (base - i) * hop for i in 0..fan-1
        starts = (np.repeat(base, fan) - np.tile(np.arange(fan), len(base))) * hop_us
        keys = batch.column(key_col).take(
            pa.array(np.repeat(np.arange(len(base)), fan), pa.int64()))
        vals = batch.column(value_col).take(
            pa.array(np.repeat(np.arange(len(base)), fan), pa.int64()))
        t = pa.table({key_col: keys,
                      "window_start": pa.array(starts, pa.int64()),
                      value_col: vals})
        return t.group_by([key_col, "window_start"]).aggregate(
            [(value_col, "count"), (value_col, "sum")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby([key_col, "window_start"])
        .aggregate(Sum(f"{value_col}_count", alias_name="n"),
                   Sum(f"{value_col}_sum", alias_name="sum_value"))
    )


def sessionize(
    ds: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap: pd.Timedelta = pd.Timedelta(minutes=30),
) -> rd.Dataset:
    """One row per session: (key, session_id, n_events, start_ts, end_ts).

    Sessions split where the gap between consecutive events (ordered by
    ``(ts, order_col)`` for determinism under ties) exceeds ``gap``;
    session_id numbers sessions 1..n per key in time order.
    """

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([ts_col, order_col])
        gaps = g[ts_col].diff()
        brk = gaps.isna() | (gaps > gap)
        sid = brk.cumsum()
        out = g.groupby(sid).agg(
            n_events=(order_col, "size"),
            start_ts=(ts_col, "min"),
            end_ts=(ts_col, "max"),
        ).reset_index(drop=True)
        out.insert(0, key_col, g[key_col].iloc[0])
        out.insert(1, "session_id", range(1, len(out) + 1))
        return out

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def session_summary(sessions: rd.Dataset, key_col: str = "user_id") -> rd.Dataset:
    """Per-key rollup of ``sessionize`` output:
    (key, n_sessions, max_session_events)."""
    from ray.data.aggregate import Count, Max

    return (
        sessions.groupby(key_col)
        .aggregate(Count(alias_name="n_sessions"),
                   Max("n_events", alias_name="max_session_events"))
    )


def rolling_agg(
    ds: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    window_rows: int = 3,
) -> rd.Dataset:
    """Per-key row-based rolling window (the SQL ``ROWS BETWEEN n-1
    PRECEDING AND CURRENT ROW`` shape): for each event, the mean of the
    last ``window_rows`` values (fewer at the head) and the microseconds
    since the key's previous event (-1 for the key's first event), ordered
    by ``(ts, order_col)``.

    Emits (key, order_col, rolling_avg, gap_us).  Same partitioning
    assumption as ``sessionize``: one key's events fit in one group.
    """

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([ts_col, order_col])
        # unit-safe epoch µs: parquet may load as datetime64[ns] or [us]
        ts_us = pd.Series(
            g[ts_col].values.astype("datetime64[us]").astype("int64"),
            index=g.index)
        gap = ts_us.diff()
        return pd.DataFrame({
            key_col: g[key_col],
            order_col: g[order_col],
            "rolling_avg": g[value_col]
                .rolling(window_rows, min_periods=1).mean(),
            "gap_us": gap.fillna(-1).astype("int64"),
        })

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
