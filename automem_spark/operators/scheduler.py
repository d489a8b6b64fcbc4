"""ST5: the consolidation scheduler as a batch job.

Reference: ``consolidation.py:1118-1234`` (``ConsolidationScheduler``) — five
pass types on different cadences (decay daily, creative weekly, cluster
monthly, forget quarterly, identity weekly), a ``should_run`` gate per task,
and a history of per-run stats.

Spark-first shape: the schedule state is a tiny job-state table (task,
last_run) — in production a Delta table the run rewrites; the due-decision
is pure driver logic (it reads five rows); each due pass is the existing
batch operator (C1-C5), and the run's report is a uniform long-format stats
frame ``(task, metric, value)`` so one schema carries every pass's numbers.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from automem_spark.operators.consolidation import (
    cluster_summaries,
    creative_pairs,
    decay_stats,
    forget_classify,
)
from automem_spark.operators.entities import entity_merge_candidates
from automem_spark.operators.similarity import cosine_threshold_self_join

# Pass cadences (consolidation.py:1130-1137). An interval <= 0 disables.
SCHEDULE_INTERVALS_DAYS: dict[str, float] = {
    "decay": 1,
    "creative": 7,
    "cluster": 30,
    "forget": 90,
    "identity": 7,
}


def _parse(ts: str) -> datetime:
    return datetime.fromisoformat(ts)


def due_tasks(
    last_runs: dict[str, str | None],
    now: str,
    *,
    force: str | None = None,
    intervals: dict[str, float] = SCHEDULE_INTERVALS_DAYS,
) -> list[str]:
    """should_run (consolidation.py:1140-1152): never-run -> due; disabled
    (interval <= 0) -> never; else due when now - last_run >= interval.
    `force` runs exactly that task regardless of schedule."""
    if force is not None:
        return [force] if force in intervals else []
    out = []
    now_dt = _parse(now)
    for task, days in intervals.items():
        if days <= 0:
            continue
        last = last_runs.get(task)
        if last is None:
            out.append(task)
        elif now_dt - _parse(last) >= timedelta(days=days):
            out.append(task)
    return out


def consolidation_run(
    spark: SparkSession,
    *,
    now: str,
    last_runs: dict[str, str | None],
    force: str | None = None,
    memories: DataFrame | None = None,
    edges: DataFrame | None = None,
    embeddings: DataFrame | None = None,
    entities: DataFrame | None = None,
    entity_refs: DataFrame | None = None,
    decay_rel_count: Column | None = None,
    creative_max_id: int = 100,
    cluster_threshold: float = 0.25,
    forget_delete_threshold: float = 0.25,
    forget_archive_threshold: float = 0.35,
) -> DataFrame:
    """ST5 run_scheduled_tasks (consolidation.py:1155-1208) as one batch job.

    Emits long-format stats: one ('<task>', 'due', 0|1) row per schedulable
    task, then per executed pass its headline numbers:

    - decay:    processed, avg_relevance_after      (A8 rollup)
    - creative: n_pairs, n_discovered               (C2)
    - cluster:  n_clusters, n_meta_members          (C3)
    - forget:   n_delete, n_archive, n_preserved, n_update  (C4)
    - identity: n_candidates, n_auto                (C5/J16)

    Each pass is the already-tested batch operator; nothing here collects to
    the driver except the five-row schedule itself.
    """
    tasks = set(due_tasks(last_runs, now, force=force))
    parts: list[DataFrame] = [
        spark.createDataFrame(
            [(t, "due", float(t in tasks)) for t in SCHEDULE_INTERVALS_DAYS],
            "task string, metric string, value double",
        )
    ]

    def long_rows(df: DataFrame, task: str, metrics: dict[str, Column]) -> DataFrame:
        agg = df.agg(*[m.cast("double").alias(k) for k, m in metrics.items()])
        stacked = agg.select(
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(k) for k in metrics]),
                    F.array(*[F.col(k) for k in metrics]),
                )
            ).alias("metric", "value")
        )
        return stacked.select(F.lit(task).alias("task"), "metric", "value")

    if "decay" in tasks and memories is not None:
        st = decay_stats(memories, now=now, rel_count=decay_rel_count)
        parts.append(
            st.select(
                F.lit("decay").alias("task"),
                F.explode(
                    F.map_from_arrays(
                        F.array(F.lit("processed"), F.lit("avg_relevance_after")),
                        F.array(
                            F.col("processed").cast("double"),
                            F.col("avg_relevance_after").cast("double"),
                        ),
                    )
                ).alias("metric", "value"),
            )
        )
    if "creative" in tasks and memories is not None and embeddings is not None:
        pairs = creative_pairs(memories, embeddings, edges, max_id=creative_max_id)
        parts.append(
            long_rows(
                pairs,
                "creative",
                {
                    "n_pairs": F.count("*"),
                    "n_discovered": F.coalesce(F.sum((F.col("rel_type") == "DISCOVERED").cast("long")), F.lit(0)),
                },
            )
        )
    if "cluster" in tasks and memories is not None and embeddings is not None:
        cpairs = cosine_threshold_self_join(embeddings, cluster_threshold, item_id="vec_id")
        clusters = cluster_summaries(
            cpairs, embeddings.select(F.col("vec_id").alias("id")), memories
        )
        parts.append(
            long_rows(
                clusters,
                "cluster",
                {"n_clusters": F.count("*"), "n_meta_members": F.coalesce(F.sum("n_members"), F.lit(0))},
            )
        )
    if "forget" in tasks and memories is not None:
        rel_counts = None
        if edges is not None:
            rel_counts = edges.groupBy(F.col("src").alias("id")).agg(
                F.count("*").alias("rel_count")
            )
        actions = forget_classify(
            memories,
            rel_counts,
            now=now,
            delete_threshold=forget_delete_threshold,
            archive_threshold=forget_archive_threshold,
        )
        parts.append(
            long_rows(
                actions,
                "forget",
                {
                    "n_delete": F.coalesce(F.sum((F.col("action") == "delete").cast("long")), F.lit(0)),
                    "n_archive": F.coalesce(F.sum((F.col("action") == "archive").cast("long")), F.lit(0)),
                    "n_preserved": F.coalesce(F.sum((F.col("action") == "preserved").cast("long")), F.lit(0)),
                    "n_update": F.coalesce(F.sum((F.col("action") == "update").cast("long")), F.lit(0)),
                },
            )
        )
    if "identity" in tasks and entities is not None and entity_refs is not None:
        cands = entity_merge_candidates(entities, entity_refs)
        parts.append(
            long_rows(
                cands,
                "identity",
                {
                    "n_candidates": F.count("*"),
                    "n_auto": F.coalesce(F.sum((F.col("bucket") == "auto").cast("long")), F.lit(0)),
                },
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def advance_schedule(
    last_runs: dict[str, str | None], executed: list[str], now: str
) -> dict[str, str | None]:
    """The schedule write-back: executed tasks stamp `now` (the reference
    skips advancing identity on skip/error — callers drop it from
    `executed` in that case)."""
    return {
        t: (now if t in executed else last_runs.get(t))
        for t in SCHEDULE_INTERVALS_DAYS
    }
