"""Range / as-of joins — the temporal-linking shape of the reference.

J13 (automem/enrichment/runtime_helpers.py:15-71): for each new memory, find
prior memories within a 7-day cutoff, keep the newest N, MERGE PRECEDED_BY.

Spark shape: a range join (ts_prev < ts AND ts_prev >= ts - window) followed
by a top-k-per-group window. At scale the range join wants both sides
bucketed on the partition key (user/conversation) so the range condition
evaluates within co-located partitions; without a key it's a theta-join,
which Spark executes as broadcast-nested-loop — fine when one side is small,
otherwise pre-bucket by coarse time bucket and join on the bucket key first
(the `bucketed` variant below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from automem_spark.operators.topk import top_k_per_group
from automem_spark.plans.parallelism import ensure_parallelism


def preceding_within_window(
    df: DataFrame,
    *,
    id_col: str = "id",
    ts_col: str = "timestamp",
    partition_cols: list[str] | None = None,
    window_days: float = 7.0,
    n_recent: int = 3,
) -> DataFrame:
    """For each row, the newest `n_recent` earlier rows within `window_days`
    (same partition_cols when given). Output:
    (id, preceded_by, ts, prev_ts, rank).

    With partition_cols this is an equi-join + range predicate → shuffle
    hash join on the key; Catalyst evaluates the range residual in the join.
    """
    # widen only the PROBE side: a round-robin repartition on the other
    # branch is pure waste when the planner broadcasts it (the broadcast
    # collapses partitioning anyway), and at SMJ scale the join's own
    # exchange distributes it
    left = ensure_parallelism(df).select(
        *(partition_cols or []),
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
    )
    right = df.select(
        *[F.col(c).alias(f"prev_{c}") for c in (partition_cols or [])],
        F.col(id_col).alias("preceded_by"),
        F.col(ts_col).alias("prev_ts"),
    )
    cond: Column = (F.col("prev_ts") < F.col("ts")) & (
        F.col("prev_ts") >= F.col("ts") - F.expr(f"INTERVAL {int(window_days * 24)} HOURS")
    )
    for c in partition_cols or []:
        cond = (F.col(c) == F.col(f"prev_{c}")) & cond
    joined = left.join(right, cond).filter(F.col("id") != F.col("preceded_by"))
    # Group on (partition_cols, id), not id alone: id is functionally
    # dependent on its partition key, so the grouping is identical — but the
    # join output is already hash-partitioned on partition_cols, and
    # HashPartitioning(partition_cols) satisfies the clustered distribution
    # of any superset key, so Catalyst reuses the join exchange instead of
    # re-shuffling the (corpus-sized) pair frame on id. One shuffle saved.
    group_cols = [*(partition_cols or []), "id"]
    return top_k_per_group(
        joined.select(*(partition_cols or []), "id", "ts", "preceded_by", "prev_ts"),
        group_cols,
        [F.desc("prev_ts"), F.asc("preceded_by")],
        n_recent,
        rank_col="rank",
        keep_rank=True,
    )
