"""IR quality metrics — twin of the reference's recall-quality lab
(scripts/lab/lab_metrics.py:11-58): recall@K, MRR, NDCG@K, distractor rate.

Two forms: pure-Python per-query functions (golden-ranking regression tests)
and a DataFrame aggregate for scoring a whole (query_id, retrieved ranking)
result set against an expectations table in one job.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(retrieved_ids: list, expected_ids: list, k: int) -> float:
    if not expected_ids:
        return 0.0
    top_k = set(retrieved_ids[:k])
    return sum(1 for e in expected_ids if e in top_k) / len(expected_ids)


def mrr(retrieved_ids: list, expected_ids: list) -> float:
    expected = set(expected_ids)
    for i, rid in enumerate(retrieved_ids):
        if rid in expected:
            return 1.0 / (i + 1)
    return 0.0


def ndcg_at_k(retrieved_ids: list, expected_ids: list, k: int) -> float:
    expected = set(expected_ids)
    dcg = sum(
        1.0 / math.log2(i + 2) for i, rid in enumerate(retrieved_ids[:k]) if rid in expected
    )
    ideal = sum(1.0 / math.log2(i + 2) for i in range(min(len(expected_ids), k)))
    return dcg / ideal if ideal > 0 else 0.0


def distractor_rate_at_k(retrieved_ids: list, distractor_ids: Iterable, k: int) -> float:
    if k <= 0:
        return 0.0
    top_k = retrieved_ids[:k]
    if not top_k:
        return 0.0
    dset = set(distractor_ids)
    return sum(1 for rid in top_k if rid in dset) / len(top_k)


def ir_metrics_df(
    results: DataFrame,
    expectations: DataFrame,
    k: int = 10,
    *,
    query_col: str = "query_id",
    id_col: str = "id",
    rank_col: str = "rank",
    expected_col: str = "expected_ids",
) -> DataFrame:
    """Batch metrics: results (query_id, id, rank) × expectations
    (query_id, expected_ids array) -> per-query recall@k / mrr / ndcg@k.
    One join + one groupBy — evaluates thousands of queries in one pass."""
    exp = expectations.select(query_col, expected_col)
    joined = results.join(F.broadcast(exp), query_col)
    hit = F.array_contains(F.col(expected_col), F.col(id_col))
    per_row = joined.select(
        query_col,
        F.col(rank_col).alias("rank"),
        hit.alias("hit"),
        F.size(F.col(expected_col)).alias("n_expected"),
    )
    agg = per_row.groupBy(query_col).agg(
        F.max("n_expected").alias("n_expected"),
        F.sum(F.when((F.col("rank") <= k) & F.col("hit"), 1).otherwise(0)).alias("hits_at_k"),
        F.min(F.when(F.col("hit"), F.col("rank"))).alias("first_hit_rank"),
        F.sum(
            F.when(
                (F.col("rank") <= k) & F.col("hit"),
                1.0 / F.log2(F.col("rank").cast("double") + 1.0),
            ).otherwise(0.0)
        ).alias("dcg"),
    )
    ideal = F.expr(
        f"aggregate(sequence(1, least(n_expected, {k})), cast(0.0 as double),"
        " (acc, i) -> acc + 1.0 / log2(cast(i as double) + 1.0))"
    )
    return agg.select(
        query_col,
        (F.col("hits_at_k") / F.col("n_expected")).alias("recall_at_k"),
        F.coalesce(1.0 / F.col("first_hit_rank"), F.lit(0.0)).alias("mrr"),
        F.when(ideal > 0, F.col("dcg") / ideal).otherwise(0.0).alias("ndcg_at_k"),
    )
