"""Structured Streaming analogs of the reference's background pipelines.

The reference runs daemon threads draining queues (enrichment worker ST1,
embedding micro-batcher ST4, app.py:324-440). In Spark these are streaming
DataFrames: the SAME column expressions used by the batch ingest run
unchanged over `readStream` sources, and `foreachBatch` gives the
batch-of-20-or-2s micro-batching the reference hand-rolls
(automem/embedding/runtime_pipeline.py:38-190) for free via triggers.

- `enrich_stream_transform`: the stateless ingest/enrichment DAG
  (tag_prefixes X12, tier-1 classification U3, extractive summary X18,
  content fingerprint X9) applied to a (streaming or batch) DataFrame.
- `windowed_event_counts`: ST8 analog — sliding-window per-type event counts
  with a watermark for late data (the reference's SSE stream has no window
  semantics; this is the idiomatic Spark extension point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from automem_spark.functions.detmath import us_mean
from automem_spark.functions.tags import tag_prefixes_expr
from automem_spark.functions.text import fingerprint_expr, first_sentence_summary_expr
from automem_spark.operators.enrichment import classify_memory_expr


def enrich_stream_transform(df: DataFrame) -> DataFrame:
    """Stateless enrichment: works identically on batch and streaming
    DataFrames (no shuffle, no state store)."""
    cls = classify_memory_expr(F.col("content"))
    return df.select(
        "*",
        tag_prefixes_expr(F.coalesce(F.col("tags"), F.array())).alias("tag_prefixes"),
        cls["type"].alias("mem_type"),
        cls["confidence"].alias("cls_confidence"),
        first_sentence_summary_expr(F.col("content")).alias("summary"),
        fingerprint_expr(F.col("content")).alias("fingerprint"),
        F.lit(True).alias("processed"),
    )


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding-window counts per event_type. On a streaming
    source this maintains state and drops data later than the watermark; on
    a batch source it degenerates to a plain window aggregation."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return df.groupBy(w.alias("win"), "event_type").agg(
        # us_mean (functions/detmath.py) rather than round(avg(...)): the
        # micro-unit sum is also map-side-combinable in streaming state,
        # and the mean stays order-independent across micro-batch merges
        F.count("*").alias("n"),
        us_mean(F.col("value"), 6).alias("avg_value"),
    )


def chunk_dedup_stream(
    docs: DataFrame,
    *,
    chunk_words: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental twin of the batch chunk-level dedup keeper rule
    (operators/trainprep.py:chunk_dedup): chunk each arriving document
    (stateless generate-and-explode — runs unchanged on a streaming frame)
    and emit one verdict row per chunk, where a chunk is a duplicate iff
    another chunk with the same ``chunk_md5`` was already seen — in an
    earlier micro-batch (persisted per-key state), or earlier within this
    batch by the batch rule's (doc_id, chunk_idx) keeper order.

    Equivalence contract (pinned by tests/test_trainprep.py): when
    documents arrive in ``doc_id`` order (each doc delivered whole — its
    chunks never straddle batches, since chunking happens inside the
    batch that carries the doc row), the per-doc rollup of this verdict
    stream is IDENTICAL to the batch ``chunk_dedup`` output regardless of
    where the micro-batch boundaries fall — the same boundary-equivalence
    property test_sessionize.py pins for sessionization.

    Scale shape: state is ONE boolean per distinct chunk_md5, sharded by
    the groupBy hash across executors — the streaming analog of the batch
    rule's single chunk_md5 shuffle. Arrow batches flow per key-group; no
    driver participation. Production deployments bound state with a
    fingerprint-TTL policy (dropDuplicatesWithinWatermark upstream) when
    the corpus is unbounded; the keeper semantics are unchanged inside
    the retention horizon.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from automem_spark.operators.trainprep import chunk_documents

    chunks = chunk_documents(
        docs, chunk_words=chunk_words, stride=stride,
        text_col=text_col, id_col=id_col,
    ).select(F.col(id_col).alias("doc_id"), "chunk_idx", "chunk_md5")

    def keeper(key, pdfs, state: "GroupState"):
        import pandas as pd

        (md5,) = key
        seen_before = state.exists
        rows: list[tuple] = []
        for pdf in pdfs:
            rows.extend(zip(pdf["doc_id"], pdf["chunk_idx"]))
        rows.sort()  # the batch keeper order: min (doc_id, chunk_idx) wins
        out = [
            (str(md5), int(d), int(ci), bool(seen_before or i > 0))
            for i, (d, ci) in enumerate(rows)
        ]
        state.update((True,))
        yield pd.DataFrame(
            out, columns=["chunk_md5", "doc_id", "chunk_idx", "is_dup"]
        )

    return chunks.groupBy("chunk_md5").applyInPandasWithState(
        keeper,
        outputStructType="chunk_md5 string, doc_id bigint, chunk_idx bigint, is_dup boolean",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("fingerprint",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """ST1 queue drain-once semantics: the reference's enrichment queue
    processes each memory exactly once (app.py:324-440 worker + seen-set);
    the streaming analog is `dropDuplicatesWithinWatermark` — state holds
    one entry per key until the watermark expires it, so duplicate
    deliveries (redelivery, at-least-once sources) collapse to one
    enrichment. Plain `dropDuplicates(keys)` would NOT bound state here:
    Spark only evicts streaming-dedup state when the event-time column is
    among the dedup keys, so a fingerprint-only key set with a watermark
    set would grow state forever. `dropDuplicatesWithinWatermark` exists
    precisely for dedup-on-business-key with time-bounded state.

    On a batch DataFrame this degenerates to a plain dropDuplicates."""
    out = df
    if out.isStreaming and ts_col in out.columns:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(list(key_cols))
    return out.dropDuplicates(list(key_cols))
