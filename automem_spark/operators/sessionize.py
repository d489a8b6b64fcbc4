"""Event sessionization: split each user's event stream into sessions at
inactivity gaps, batch and streaming.

The reference's event surface is an SSE feed plus per-day rollups
(automem/api/events.py; the S11/A2 rows); it has no sessionization —
but session grouping is the first aggregation every event pipeline built
on this data model needs (it is also how the LongMemEval corpus defines
its retrieval scope). Two implementations with identical semantics:

- Batch: the classic lag/cumsum construction — flag an event as a session
  start when its gap to the user's previous event exceeds `gap`, then
  cumulative-sum the flags per user to number sessions. ONE shuffle
  (partition by user); both windows share the same (user) partitioning and
  (ts, event_id) ordering so Catalyst plans a single Exchange+Sort. The
  same construction is plain SQL (lag + cumsum CTEs), which is exactly the
  DuckDB oracle.
- Streaming: Spark's native `session_window` grouping with a watermark —
  the state-store implementation of the same gap semantics, for the
  readStream path. Equivalence with batch is pinned by test (with no late
  data the two produce identical session boundaries).

Ordering ties break on event_id, so session assignment is deterministic
and engine-reproducible at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _epoch(c: Column) -> Column:
    """Epoch seconds as long. TIMESTAMP_NTZ refuses a direct bigint cast
    (Spark 4); routing through a timestamp cast interprets NTZ in the
    session timezone — pinned to UTC (session.py), matching how the DuckDB
    oracle reads the same naive timestamps."""
    return c.cast("timestamp").cast("long")


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign a session index to every event: a session breaks where the
    gap to the user's previous event exceeds `gap_minutes`. Adds
    `session_idx` (0-based per user, in time order). One shuffle on
    `user_col`; the lag and the running sum share partitioning AND
    ordering, so they run in one window stage."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_start = (
        prev_ts.isNull()
        | (_epoch(F.col(ts_col)) - _epoch(prev_ts) > gap_minutes * 60)
    ).cast("long")
    return events.withColumn(
        "session_idx",
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup: start/end epochs, duration, event count,
    distinct event types. Epoch-second longs throughout — no float
    aggregation, so results are bit-identical across engines and partial
    orders."""
    s = sessionize(events, gap_minutes, user_col, ts_col, id_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.min(_epoch(F.col(ts_col))).alias("start_epoch"),
        F.max(_epoch(F.col(ts_col))).alias("end_epoch"),
        (
            F.max(_epoch(F.col(ts_col))) - F.min(_epoch(F.col(ts_col)))
        ).alias("duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )


def streaming_session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """The same rollup for a streaming frame, via the engine's native
    session_window state store: sessions close `gap_minutes` after their
    last event once the watermark passes. Columns mirror
    :func:`session_stats` minus the per-user index (streaming sessions are
    identified by their window instead — no global per-user ordering
    exists on an unbounded stream)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes"),
            F.col(user_col),
        )
        .agg(
            F.min(_epoch(F.col(ts_col))).alias("start_epoch"),
            F.max(_epoch(F.col(ts_col))).alias("end_epoch"),
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("event_type").alias("n_types_approx"),
        )
    )
