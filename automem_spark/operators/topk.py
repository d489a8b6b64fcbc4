"""Top-k-per-group — the reference's most common access pattern (per-seed
relation limit J1, per-entity expansion caps J3, per-query limits W4).

Spark shape: row_number() over a partitioned window. At 100 TB scale this is
a single shuffle on the group key; AQE handles skewed groups. For small k the
window sort is partial (TakeOrderedAndProject-like within partitions after
the hash shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def partial_top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Two-stage top-k for groups whose membership is corpus-sized (e.g. a
    handful of query_ids over the whole corpus): rank within
    (group, input-partition) first and keep k survivors per slice, then rank
    the ≤ parts×k survivors globally per group.

    A single `Window.partitionBy(group)` funnels every row of a group through
    one reducer task — with Q queries over N corpus rows that is an N-row
    sort per task, the classic straggler at 100×. Here the first window's
    key space is (group × input partition) so reducers are bounded by
    input-partition size, and the second window sees ≤ parts×k rows per
    group. Global top-k ⊆ union of per-slice top-k, so results are identical
    for any total order (callers append a unique tiebreak, e.g. id ASC).
    """
    pre = df.withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy(*group_cols, "_pid").orderBy(*order_cols)
    pruned = (
        pre.withColumn("_prerank", F.row_number().over(w1))
        .filter(F.col("_prerank") <= k)
        .drop("_pid", "_prerank")
    )
    return top_k_per_group(pruned, group_cols, order_cols, k, rank_col, keep_rank)
