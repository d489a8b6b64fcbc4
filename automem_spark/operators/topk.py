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
