"""Append-only event log: the batch analog of the reference's SSE
observability stream (automem/api/stream.py:22-105).

The reference pushes {type, timestamp, data} events to in-memory subscriber
queues as operations run (emit_event call sites: memory.store,
memory.recall, enrichment.start/complete/failed, consolidation.run). A
Spark pipeline's equivalent observability surface is an append-only events
TABLE written by each job — the CDF/audit-log shape — plus windowed
rollups over it:

- `emit_events` shapes any operator output into (event_type, ts, key, data)
  rows; jobs append them to the log sink (parquet/Delta append).
- `event_rollup` is the per-(window, type) aggregation that backs the
  observability dashboards. It is the same plan on batch and streaming
  inputs; on a streaming log add the watermark so state is bounded
  (the SSE keepalive/slow-client mechanics have no batch counterpart —
  back-pressure is the sink's concern in Spark).

Scale: the log is append-only and naturally time-partitioned; rollups are
one shuffle on (window, event_type) with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def emit_events(
    source: DataFrame,
    event_type: str,
    *,
    ts: Column,
    key: Column,
    data: Column | None = None,
) -> DataFrame:
    """Shape an operator's output rows into event-log rows.

    Mirrors emit_event's envelope (stream.py:22-44): a type tag, an event
    timestamp, and a payload; `key` identifies the subject (memory id,
    consolidation task) so rollups can count distinct subjects.
    """
    return source.select(
        F.lit(event_type).alias("event_type"),
        ts.alias("ts"),
        key.cast("string").alias("key"),
        (data if data is not None else F.lit(None).cast("string")).alias("data"),
    )


def event_rollup(
    events: DataFrame,
    *,
    window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(time-window, event_type) counts + distinct subjects.

    Output: (win struct<start,end>, event_type, n, n_keys). On a streaming
    events frame the watermark bounds aggregation state and drops
    late-beyond-watermark events; exact distinct aggregation is not
    supported over streams, so n_keys degrades to the HLL
    approx_count_distinct there (batch stays exact — the oracle row runs
    the batch form).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
        n_keys = F.approx_count_distinct("key").alias("n_keys")
    else:
        n_keys = F.countDistinct("key").alias("n_keys")
    return df.groupBy(F.window("ts", window).alias("win"), "event_type").agg(
        F.count("*").alias("n"),
        n_keys,
    )
